package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Mixing, SequenceExport}

/** The corpus-to-trainer artifact, end to end at scale: a domain-tagged
  * raw corpus is (1) mixed to exact per-domain TOKEN quotas
  * ([[Mixing.tokenBudget]] — seeded greedy prefix, two-phase kernel),
  * (2) BPE-trained and straddle-packed into fixed-length token-ID
  * sequences ([[Bpe.packSequences]]), (3) shuffled into a seeded
  * training order ([[SequenceExport.shuffled]]) and (4) shipped as
  * split+shard-partitioned parquet with a per-shard conservation audit
  * ([[SequenceExport.write]]/verify). Every stage's correctness is
  * asserted in-run: per-domain selected tokens land in
  * [budget, budget + max_doc), packed tokens equal encoded tokens
  * exactly, and the shipped shards re-derive their audit digests.
  *
  * The mix sorts IDS ONLY (doc_id, source, n_tokens, hash key — never
  * text); selected ids then semi-join the corpus for the pack, so the
  * wide text column crosses the wire once. Budgets are computed from
  * one word-count agg: domain `srcI` gets frac × total × (10-I)/55 —
  * a skewed 10-way mixture at an exact overall token fraction.
  *
  * `sbt "runMain graft.bench.MixPackExportMain 10000000 80 50000 500 2048"`
  */
object MixPackExportMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val len = if (args.length > 1) args(1).toInt else 80
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val merges = if (args.length > 3) args(3).toInt else 500
    val seqLen = if (args.length > 4) args(4).toInt else 2048
    val frac = if (args.length > 5) args(5).toDouble else 0.25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("mixpack").toString
    TextIndexScaleMain.corpus(spark, n, len, vocab)
      .withColumn("source",
        concat(lit("src"), pmod(hash(col("doc_id") * 31L + 7L), lit(10))))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    val totalWords = docs
      .agg(sum(size(split(trim(col("text")), "\\s+")))).first().getLong(0)
    println(s"[mixpack] corpus n=$n words=$totalWords domains=10")

    // skewed exact-quota mixture: src_i gets frac*total*(10-i)/55
    val budgets = (0 until 10).map { i =>
      s"src$i" -> (frac * totalWords * (10 - i) / 55.0).toLong
    }.toMap
    val t0 = System.nanoTime()
    val selected = Mixing.tokenBudget(docs, "source",
      size(split(trim(col("text")), "\\s+")).cast("long"), budgets)
    selected.write.mode("overwrite").parquet(s"$tmp/mix")
    val mix = spark.read.parquet(s"$tmp/mix")
    val mixS = (System.nanoTime() - t0) / 1e9
    val byDom = mix.groupBy("source")
      .agg(sum("n_tokens").as("toks"), max("n_tokens").as("mx"),
        count(lit(1)).as("docs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // corpus supply per domain: the selection's true lower bound is
    // min(budget, supply) — a budget above supply keeps the domain
    // whole, which is correct, not an overshoot failure
    val supply = docs.groupBy("source")
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val selWords = byDom.map(_._2).sum
    println(f"[mixpack] mix wall=$mixS%.1fs selected=${mix.count()} docs " +
      f"$selWords words (${selWords.toDouble / totalWords}%.3f of corpus)")
    byDom.foreach { case (d, toks, mx, nd) =>
      val b = budgets(d)
      require(toks >= math.min(b, supply(d)) && toks < b + mx,
        s"$d selected $toks tokens outside [min(budget,supply)=" +
          s"${math.min(b, supply(d))}, budget+maxdoc=${b + mx})")
      println(s"[mixpack]   $d: $nd docs, $toks tokens (budget $b)")
    }

    // the pack consumes the mixed subset: ids semi-join the corpus text
    val mixedDocs = docs.join(mix.select("doc_id"), Seq("doc_id"),
      "left_semi")
    val t1 = System.nanoTime()
    val model = Bpe.train(mixedDocs, numMerges = merges)
    val trainS = (System.nanoTime() - t1) / 1e9
    println(f"[mixpack] bpe_train wall=$trainS%.1fs merges=${model.merges.length}")

    val t2 = System.nanoTime()
    val splitCol = when(pmod(col("doc_id"), lit(10)) < 8, "train")
      .otherwise("heldout")
    val packed = Bpe.packSequences(mixedDocs, model, seqLen, splitCol)
    SequenceExport.write(SequenceExport.shuffled(packed, "epoch0:"),
      s"$tmp/export", rowsPerShard = 10000, ordCol = "order_id")
    val packS = (System.nanoTime() - t2) / 1e9

    val shipped = spark.read.parquet(s"$tmp/export/sequences")
    val stats = shipped.groupBy("split")
      .agg(count(lit(1)).as("seqs"), sum("n_tokens").as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val shippedToks = stats.map(_._3).sum
    println(f"[mixpack] pack+shuffle+export wall=$packS%.1fs " +
      f"(${shippedToks / packS}%.0f tokens/s) " +
      stats.map { case (s, c, t) => s"$s:${c}seq/${t}t" }.mkString(" "))

    // trainer-side integrity: shipped shards re-derive the audit exactly
    val t3 = System.nanoTime()
    val bad = SequenceExport.verify(spark, s"$tmp/export").count()
    val verS = (System.nanoTime() - t3) / 1e9
    require(bad == 0L, s"$bad shards failed the conservation audit")
    println(f"[mixpack] audit wall=$verS%.1fs shards_ok " +
      f"end_to_end=${mixS + trainS + packS + verS}%.1fs")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
