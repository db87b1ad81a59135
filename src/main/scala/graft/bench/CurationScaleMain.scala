package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ClusterEval, IvfFlat, KnnJoin, Mrl, Pca, PplFilter, Prune, Recall}
import graft.sources.VectorSources

/** Scale points for the round-8 curation operators (1M default):
  *
  *  1. PCA vs MRL-prefix retrieval ladder on an ANISOTROPIC ROTATED
  *     corpus (decaying latent spectrum under a seeded rotation — the
  *     generic-embedding shape): at equal projected dimension p and
  *     equal rerank, the trained projection recovers recall the raw
  *     prefix cannot, because each raw coordinate mixes every
  *     principal axis. (On an isotropic clustered corpus the two tie —
  *     measured 0.610 vs 0.596 at p=16/100k — there is no privileged
  *     subspace to learn.)
  *  2. CCNet perplexity filter over the Zipf corpus with planted topical
  *     twins (the DsirScaleMain construction): fit on target slots,
  *     score 1M docs, tertile cut — content twins must land in
  *     head/middle at a far higher rate than background.
  *  3. Prototype pruning at 1M/C=1024: one corpus pass + one
  *     cell-partitioned window — wall should sit near the IVF assign
  *     cost, nowhere near SemDeDup's pairwise within-cell join.
  *
  * `sbt "runMain graft.bench.CurationScaleMain [n] [dim] [p...]"`
  * `SPARK_GRAFT_SECTIONS=ladder` (comma-set of ladder,prune,ppl) runs a
  * subset — the high-dimension validation reruns only the ladder.
  */
object CurationScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val ps = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
             else Seq(8, 16, 32)
    val sections = sys.env.getOrElse("SPARK_GRAFT_SECTIONS",
      "ladder,prune,ppl").split(",").map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- 1. PCA vs MRL ladder (anisotropic ROTATED spectrum — the
    // generic-embedding shape: principal directions exist but at an
    // arbitrary orientation, so a raw prefix sees only a 1/d slice of
    // each axis while PCA recovers them) -----------------------------
    if (sections("ladder")) {
    // default decay 0.92 gives ~80 effective dims — right for d=64; at
    // embedding widths (768/1536) pass a slower decay so the spectrum
    // keeps an effective dimension proportional to d
    val decay = sys.env.getOrElse("SPARK_GRAFT_DECAY", "0.92").toDouble
    val base = VectorSources.syntheticAnisotropic(spark, n, dim,
        decay = decay)
      .select("vec_id", "embedding").persist()
    println(s"[curation-scale] corpus n=${base.count()} dim=$dim decay=$decay")
    val probes = base.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = KnnJoin.exactKnnJoin(base, probes, k = 10,
      metric = "cosine", scoreDigits = 6).persist()
    println(s"[curation-scale] exact truth rows=${exact.count()}")

    println(f"${"p"}%4s ${"pca_fit_s"}%10s ${"pca_knn_s"}%10s ${"pca_recall"}%11s ${"mrl_knn_s"}%10s ${"mrl_recall"}%11s")
    ps.foreach { p =>
      val t0 = System.nanoTime()
      val model = Pca.fit(base, p = p)
      val t1 = System.nanoTime()
      val pcaR = Recall.microAvgRecall(
        Pca.knnJoin(model, base, probes, k = 10, rerank = 100,
          scoreDigits = 6), exact)
        .select("recall").first().getDouble(0)
      val t2 = System.nanoTime()
      val mrlR = Recall.microAvgRecall(
        Mrl.knnJoinTruncated(base, probes, k = 10, prefixDims = p,
          rerank = 100, scoreDigits = 6), exact)
        .select("recall").first().getDouble(0)
      val t3 = System.nanoTime()
      model.projected.unpersist()
      println(f"$p%4d ${(t1 - t0) / 1e9}%10.1f ${(t2 - t1) / 1e9}%10.1f " +
        f"$pcaR%11.3f ${(t3 - t2) / 1e9}%10.1f $mrlR%11.3f")
    }
    exact.unpersist()

    base.unpersist()
    }

    // ---- 3. prototype pruning (clustered corpus — the data shape the
    // prototype score presumes) ---------------------------------------
    if (sections("prune")) {
    val clusteredAll = VectorSources.syntheticClustered(spark, n, dim,
        numClusters = 128, spread = 0.15).persist()
    val clustered = clusteredAll.select("vec_id", "embedding")
    clusteredAll.count()
    val tp0 = System.nanoTime()
    val ivf = IvfFlat.fit(clustered, numCells = 1024)
    val tp1 = System.nanoTime()
    val pruned = Prune.prototypes(ivf, keepFrac = 0.5).persist()
    val keptN = pruned.filter(col("kept")).count()
    val totalN = pruned.count()
    val tp2 = System.nanoTime()
    pruned.unpersist()
    println(f"PRUNE-SCALE n=$n C=1024 fit=${(tp1 - tp0) / 1e9}%.1fs " +
      f"prune=${(tp2 - tp1) / 1e9}%.1fs kept=$keptN/$totalN " +
      f"(${keptN.toDouble / totalN}%.4f)")
    // a SECOND consumer of the same fitted quantizer: the O(n·C·d)
    // assignment persisted at fit, so cluster eval pays only its own
    // contingency pass (the shared-model contract the 10M run motivated)
    val tp3 = System.nanoTime()
    val ce = ClusterEval.eval(ivf,
      clusteredAll.select(col("vec_id"), col("cluster_id").as("label")))
      .collect().head
    println(f"PRUNE-SCALE cluster_eval (shared quantizer, cached " +
      f"assignment) wall=${(System.nanoTime() - tp3) / 1e9}%.1fs " +
      f"purity=${ce.getAs[Double]("purity")}%.3f " +
      f"nmi=${ce.getAs[Double]("nmi")}%.3f")
    ivf.release()
    clusteredAll.unpersist()
    }

    // ---- 2. perplexity filter at 1M docs ----------------------------
    if (sections("ppl")) {
    val len = 80; val vocab = 50000
    val topical = (0 until 12).map(i => s"topic$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("pplscale").toString
    TextIndexScaleMain.corpus(spark, n, len, vocab)
      .withColumn("slot", pmod(col("doc_id"), lit(20)))
      .withColumn("text",
        when(col("slot") < 4, concat(col("text"), lit(" " + topical)))
          .otherwise(col("text")))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    val isTarget = col("slot") >= 2 && col("slot") < 4

    val tf0 = System.nanoTime()
    val model = PplFilter.fit(docs.filter(isTarget), buckets = 1024)
    val tf1 = System.nanoTime()
    val scored = PplFilter.score(docs, model)
    val (th1, th2) = PplFilter.sampleThresholds(scored, sampleN = 1000)
    val cutDf = PplFilter.cut(scored, th1, th2).persist()
    val byBucket = cutDf.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tf2 = System.nanoTime()
    // the tertile cut keeps ~2/3 globally by construction, so the
    // separation signal is bucket COMPOSITION: content twins (slot 0..1 —
    // planted topical block, NOT in the fit set) must land in the
    // lowest-perplexity head at a far higher rate than background
    val twinHead = cutDf.filter(pmod(col("doc_id"), lit(20)) < 2 &&
      col("bucket") === "head").count()
    val bgTotal = n - 4 * (n / 20)
    val bgHead = cutDf.filter(pmod(col("doc_id"), lit(20)) >= 4 &&
      col("bucket") === "head").count()
    val tf3 = System.nanoTime()
    cutDf.unpersist()
    val twinRate = twinHead.toDouble / (2 * (n / 20))
    val bgRate = bgHead.toDouble / bgTotal
    println(f"PPL-SCALE n=$n fit=${(tf1 - tf0) / 1e9}%.1fs " +
      f"score+cut=${(tf2 - tf1) / 1e9}%.1fs " +
      f"(${n / ((tf2 - tf1) / 1e9)}%.0f docs/s) " +
      f"buckets=${byBucket.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }.mkString(",")}")
    println(f"PPL-SCALE head-rate: content-twins=$twinRate%.3f " +
      f"background=$bgRate%.4f skew=${twinRate / math.max(bgRate, 1e-12)}%.1fx " +
      f"(split check ${(tf3 - tf2) / 1e9}%.1fs)")
    }
    spark.stop()
  }
}
