package graft.bench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.NgramDup

/** Scale point for duplicated-substring detection: wall + SHUFFLE BYTES
  * for the window group-by under exact-string keys vs the xxhash64 key
  * (the 100 TB configuration — 8 bytes/window through the exchange
  * instead of the window text). The corpus is synthetic but shaped like
  * the real problem: seeded token streams over a Zipf-ish vocabulary
  * with a planted shared span in a fraction of docs, so the duplicated
  * set is known to be non-trivial and BOTH key modes must agree on every
  * per-doc row (checked in-run — the collision-freeness claim at this
  * scale, not just the toy spec).
  *
  * `sbt "runMain graft.bench.NgramDupScaleMain 200000 200 8"`
  */
object NgramDupScaleMain {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val avgTok = if (args.length > 1) args(1).toInt else 200
    val w = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleW = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleW.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // seeded synthetic corpus: ~avgTok tokens/doc over a 50k vocabulary
    // with a Zipf-ish skew (xxhash64-driven, partition-independent);
    // every 10th doc embeds the same 3·w-token planted span at a
    // doc-dependent offset
    val planted = (0 until 3 * w).map(i => s"planted$i").mkString(" ")
    val docs = spark.range(nDocs).toDF("doc_id")
      .withColumn("toks", expr(
        s"""transform(sequence(1, $avgTok), i ->
           |  concat('t', CAST(pmod(xxhash64(doc_id * 1000003 + i), 200) *
           |                   pmod(xxhash64(doc_id + i * 7919), 250) AS STRING)))"""
          .stripMargin))
      .withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat_ws(" ", expr(s"slice(toks, 1, ${avgTok / 2})"),
            lit(planted), expr(s"slice(toks, ${avgTok / 2 + 1}, $avgTok)")))
          .otherwise(concat_ws(" ", col("toks"))))
      .select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    docs.count()

    def run(hashKey: Boolean): (Double, Double, Long, Long) = {
      shuffleW.set(0L)
      val t0 = System.nanoTime()
      val res = NgramDup.dupNgramStats(docs, w = w, hashKey = hashKey)
      val agg = res.agg(sum("dup_windows"), count(lit(1))).first()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, shuffleW.get() / 1e6, agg.getLong(0), agg.getLong(1))
    }
    val (wallS, mbS, dupS, rowsS) = run(hashKey = false)
    println(f"NGDUP exact-string n=$nDocs tok=$avgTok w=$w wall=$wallS%.1fs " +
      f"shuffleMB=$mbS%.0f dup_windows=$dupS rows=$rowsS")
    val (wallH, mbH, dupH, rowsH) = run(hashKey = true)
    println(f"NGDUP xxhash64 n=$nDocs tok=$avgTok w=$w wall=$wallH%.1fs " +
      f"shuffleMB=$mbH%.0f dup_windows=$dupH rows=$rowsH")
    println(f"NGDUP ratio shuffle=${mbS / mbH}%.2fx wall=${wallS / wallH}%.2fx " +
      f"agree=${dupS == dupH && rowsS == rowsH}")
    // per-doc agreement between the two key modes at scale
    val a = NgramDup.dupNgramStats(docs, w = w, hashKey = false)
    val b = NgramDup.dupNgramStats(docs, w = w, hashKey = true)
    val diff = a.join(b, Seq("doc_id"))
      .filter(a("dup_windows") =!= b("dup_windows") ||
        a("dup_tokens") =!= b("dup_tokens")).count()
    println(s"NGDUP per-doc disagreements=$diff")

    // the trim (rewrite) step at the same scale: wall + how much of the
    // corpus the keep-first rule removes; the planted span makes the
    // expected shape known — ~1/10 of docs carry it, exactly one keeps it
    shuffleW.set(0L)
    val t1 = System.nanoTime()
    val tr = NgramDup.trimDuplicates(docs, w = w)
      .agg(sum("n_tokens"), sum("n_kept"),
        sum(when(col("n_kept") < col("n_tokens"), 1L).otherwise(0L)))
      .first()
    val wallT = (System.nanoTime() - t1) / 1e9
    val (nTok, nKept, nTrimmed) = (tr.getLong(0), tr.getLong(1), tr.getLong(2))
    println(f"NGDUP trim wall=$wallT%.1fs shuffleMB=${shuffleW.get() / 1e6}%.0f " +
      f"tokens=$nTok kept=$nKept removed_frac=${1.0 - nKept.toDouble / nTok}%.4f " +
      f"docs_trimmed=$nTrimmed")
    spark.stop()
  }
}
