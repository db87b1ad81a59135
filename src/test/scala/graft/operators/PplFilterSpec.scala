package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PplFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

  /** Driver-side recompute of the whole recipe for a tiny frame. */
  private def recompute(rows: Seq[(Long, String)], target: Set[Long],
      buckets: Int): Map[Long, (Long, Long)] = {
    def grams(text: String): Seq[String] = {
      val t = text.trim.split("\\s+").toSeq
      t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    def bucket(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    val perDoc = rows.map { case (id, t) => id -> grams(t).map(bucket) }
    val tgtCnt = perDoc.filter(p => target(p._1)).flatMap(_._2)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val tt = tgtCnt.values.sum
    def lp(ct: Long): Long =
      math.floor(math.log((ct + 1.0) / (tt + buckets.toDouble)) * 1e6 + 0.5)
        .toLong
    perDoc.map { case (id, bs) =>
      val tot = bs.map(b => lp(tgtCnt.getOrElse(b, 0L))).sum
      id -> (bs.size.toLong, (-tot) / bs.size)
    }.toMap
  }

  test("score matches a driver-side recompute of the fixed-point recipe") {
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox"),
      (2L, "lorem ipsum dolor sit amet"),
      (3L, "the the the quick quick fox"),
      (4L, "entirely novel words appear here"))
    val df = rows.toDF("doc_id", "text")
    val model = PplFilter.fit(df.filter(col("doc_id") < 2), buckets = 64)
    val got = PplFilter.score(df, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = recompute(rows, Set(0L, 1L), buckets = 64)
    assert(got == want)
  }

  test("target-like docs score lower cross-entropy than alien docs") {
    val rows = Seq(
      (0L, "alpha beta gamma delta alpha beta gamma delta"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma"),
      (3L, "zzz qqq www eee rrr ttt yyy uuu"))
    val df = rows.toDF("doc_id", "text")
    val model = PplFilter.fit(df.filter(col("doc_id") < 2), buckets = 256)
    val got = PplFilter.score(df, model).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(2L) < got(3L),
      s"target-like doc should beat alien doc: ${got(2L)} vs ${got(3L)}")
  }

  test("score is invariant to input partitioning") {
    val model = PplFilter.fit(
      docs.filter(col("source").isin("src0", "src1")), buckets = 1024)
    val a = PplFilter.score(docs, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = PplFilter.score(docs.repartition(7), model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("tertile cut: bucket boundaries honor the sample thresholds and " +
      "kept = not tail") {
    val full = PplFilter.filter(docs,
      col("source").isin("src0", "src1"), buckets = 1024, sampleN = 200)
    val rows = full.collect()
    assert(rows.length == docs.filter(col("text").isNotNull).count())
    val model = PplFilter.fit(
      docs.filter(col("source").isin("src0", "src1")), buckets = 1024)
    val scored = PplFilter.score(docs, model)
    val (t1, t2) = PplFilter.sampleThresholds(scored, sampleN = 200)
    assert(t1 <= t2)
    rows.foreach { r =>
      val ce = r.getLong(2); val bucket = r.getString(3)
      val kept = r.getBoolean(4)
      val want =
        if (ce <= t1) "head" else if (ce <= t2) "middle" else "tail"
      assert(bucket == want, s"doc ${r.getLong(0)}: ce=$ce bucket=$bucket")
      assert(kept == (bucket != "tail"))
    }
    // every bucket is populated on the battery corpus
    val byBucket = rows.groupBy(_.getString(3)).view.mapValues(_.length)
    assert(byBucket.keySet == Set("head", "middle", "tail"), s"$byBucket")
  }

  test("thresholds are deterministic across partitionings") {
    val model = PplFilter.fit(
      docs.filter(col("source").isin("src0", "src1")), buckets = 1024)
    val t = PplFilter.sampleThresholds(PplFilter.score(docs, model))
    val t2 = PplFilter.sampleThresholds(
      PplFilter.score(docs.repartition(5), model))
    assert(t == t2)
  }

  test("streaming score: MemoryStream micro-batches equal the batch run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = PplFilter.fit(
      docs.filter(col("source").isin("src0", "src1")), buckets = 1024)
    val batch = PplFilter.score(docs, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stream = MemoryStream[(Long, String)]
    val q = PplFilter.score(
        stream.toDF.toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("ppl_stream")
      .outputMode("append").start()
    val all = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (h1, h2) = all.splitAt(all.length / 2)
    stream.addData(h1.toSeq); q.processAllAvailable()
    stream.addData(h2.toSeq); q.processAllAvailable()
    val got = spark.table("ppl_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(got == batch)
  }

  test("gram-bucket handoff: fitGrams/scoreGrams on a stored bs column " +
      "reproduce the text path bit-for-bit (zero md5 at the consumer)") {
    val toked = docs.filter(col("text").isNotNull)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
    val withBs = Dsir.withGramBuckets(toked, col("toks"), "bs", 256)
    // all original columns survive the append
    assert(withBs.columns.toSet == toked.columns.toSet + "bs")
    val mText = PplFilter.fit(
      docs.filter(col("source").isin("src0", "src1")), buckets = 256)
    val mGrams = PplFilter.fitGrams(
      withBs.filter(col("source").isin("src0", "src1")), buckets = 256)
    assert(mGrams == mText)
    val sText = PplFilter.score(docs, mText).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sGrams = PplFilter.scoreGrams(withBs, mText).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sGrams == sText)

    // the modulus stamp travels with the column (projections AND a
    // parquet round-trip) and a mismatched model is rejected instead of
    // silently defaulting out-of-range buckets
    val p = java.nio.file.Files.createTempDirectory("gbmeta").toString
    withBs.select("doc_id", "bs").write
      .mode("overwrite").parquet(p)
    val rt = spark.read.parquet(p)
    val sRt = PplFilter.scoreGrams(rt, mText).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sRt == sText)
    val m512 = PplFilter.fit(
      docs.filter(col("source").isin("src0", "src1")), buckets = 512)
    val e = intercept[IllegalArgumentException] {
      PplFilter.scoreGrams(rt, m512)
    }
    assert(e.getMessage.contains("modulus mismatch"))
    intercept[IllegalArgumentException] {
      PplFilter.fitGrams(rt, buckets = 512)
    }
    intercept[IllegalArgumentException] {
      Dsir.scoreGrams(rt, Dsir.fit(
        docs, col("source").isin("src0", "src1"), buckets = 512))
    }
  }

  test("tokenize-once handoff: fitToks/scoreToks on a carried token " +
      "array reproduce the text path bit-for-bit") {
    val toked = docs.withColumn("toks", split(trim(col("text")), "\\s+"))
    val mText = PplFilter.fit(
      docs.filter(col("source").isin("src0", "src1")), buckets = 256)
    val mToks = PplFilter.fitToks(
      toked.filter(col("source").isin("src0", "src1")), col("toks"),
      buckets = 256)
    assert(mToks == mText)
    val sText = PplFilter.score(docs, mText).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sToks = PplFilter.scoreToks(toked, col("toks"), mText).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sToks == sText)
  }
}
