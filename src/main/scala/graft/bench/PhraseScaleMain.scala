package graft.bench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextIndex

/** Phrase-search SCALE point: the positional index vs the index-free
  * (tokenize-per-query) pipeline on the Zipf corpus generator shared
  * with the BM25 scale bench. Measures
  *
  *  - build: the positional posting write (one tokenize pass; rows =
  *    total tokens — the positional-index storage trade),
  *  - serve: phrase probes from the persisted table, wall + BYTES READ
  *    (task inputMetrics — what bucket/row-group pruning on the sorted
  *    term column actually saves),
  *  - transient: `phraseTopDocsTransient` at the same scale — the
  *    O(corpus-tokenize) per call that the index amortizes away,
  *  - correctness: indexed ≡ transient results (exact integer pipeline,
  *    so equality is bitwise).
  *
  * `sbt "runMain graft.bench.PhraseScaleMain 200000 80 50000 64 20 3"`
  */
object PhraseScaleMain {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val len = if (args.length > 1) args(1).toInt else 80
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val buckets = if (args.length > 3) args(3).toInt else 64
    val nq = if (args.length > 4) args(4).toInt else 20
    val repeats = if (args.length > 5) args(5).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytesRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })

    val tmp = java.nio.file.Files.createTempDirectory("phrscale").toString
    TextIndexScaleMain.corpus(spark, n, len, vocab)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    val prefix = "graft_phrase_scale"

    val t0 = System.nanoTime()
    TextIndex.buildPositional(docs, prefix, numBuckets = buckets)
    val buildS = (System.nanoTime() - t0) / 1e9
    val rows = spark.table(s"${prefix}_positions").count()
    println(f"PHRASE-SCALE build docs=$n positions=$rows " +
      f"wall=${buildS}%.1fs rate=${rows / buildS}%.0f tok/s buckets=$buckets")

    // probe contract mirrors the battery: the 3-token window at token
    // offset 4 of the first nq docs (Zipf draws ⇒ a realistic mix of
    // head- and tail-term phrases)
    val phr = docs.filter(col("doc_id") < nq)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(trim(col("text")), "\\s+"), 4, 3), " ")
          .as("phrase")).cache()
    phr.count()

    def measure(probe: org.apache.spark.sql.DataFrame)
        : (Set[(Long, Int, Long, Long)], Double, Double) = {
      bytesRead.set(0L)
      val t = System.nanoTime()
      val res = TextIndex.phraseTopDocs(spark, prefix, probe, topk = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSet
      val s = (System.nanoTime() - t) / 1e9
      Thread.sleep(500) // listener events drain async
      (res, s, bytesRead.get() / 1e6)
    }
    var indexed = Set.empty[(Long, Int, Long, Long)]
    val serveRuns = (1 to repeats).map { _ =>
      val (res, s, mb) = measure(phr); indexed = res; (s, mb)
    }
    println(f"PHRASE-SCALE serve nq=$nq rows=${indexed.size} " +
      serveRuns.zipWithIndex.map { case ((s, mb), i) =>
        f"serve${i + 1}=${s}%.1fs/${mb}%.0fMB" }.mkString(" "))

    // serve cost is bounded by the QUERY terms' posting mass, not the
    // corpus: split the probe set at its median Σdf(phrase terms) and
    // measure each half — the light half should read far fewer bytes
    val pt = phr.select(col("qid"),
      explode(split(trim(col("phrase")), "\\s+")).as("term"))
    val dfs = spark.table(s"${prefix}_positions")
      .join(broadcast(pt.select("term").distinct()), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val mass = pt.join(broadcast(dfs), Seq("term"))
      .groupBy("qid").agg(sum("df").as("mass"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val lightIds = mass.take(mass.length / 2).map(_._1)
    val heavyIds = mass.drop(mass.length / 2).map(_._1)
    for ((name, ids) <- Seq(("light", lightIds), ("heavy", heavyIds))) {
      val (res, s, mb) = measure(phr.filter(col("qid").isin(ids.toSeq: _*)))
      val m = ids.map(mass.toMap).sum
      println(f"PHRASE-SCALE serve-$name nq=${ids.length} mass=$m " +
        f"rows=${res.size} wall=${s}%.1fs bytes=${mb}%.0fMB")
    }

    bytesRead.set(0L)
    val t1 = System.nanoTime()
    val transient = TextIndex.phraseTopDocsTransient(docs, phr, topk = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val transientS = (System.nanoTime() - t1) / 1e9
    // no bytes figure for the transient path: task inputMetrics see the
    // bucketed-table reads the serve path does, but under-report plain
    // single-file parquet scans on the local FS — a wall-only comparison
    // is the honest one here
    val agree = indexed == transient
    println(f"PHRASE-SCALE transient wall=${transientS}%.1fs " +
      f"agree=$agree (indexed ≡ index-free at n=$n)")
    require(agree, "indexed and transient phrase search must be identical")

    TextIndex.drop(spark, prefix)
    spark.stop()
  }
}
