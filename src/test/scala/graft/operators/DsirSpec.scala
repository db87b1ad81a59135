package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // two disjoint vocabularies: "science" target docs vs "spam" raw bulk
  private def corpus = {
    import spark.implicits._
    val sci = (0L until 10L).map(i =>
      (i, s"quantum physics theory experiment lab result $i", "target"))
    val spam = (10L until 40L).map(i =>
      (i, s"buy cheap deal offer click now win $i", "raw"))
    // raw docs that LOOK like the target (the ones DSIR should surface)
    val sciLike = (40L until 45L).map(i =>
      (i, s"physics experiment quantum lab theory measure $i", "raw"))
    (sci ++ spam ++ sciLike).toDF("doc_id", "text", "kind")
  }

  test("target-like raw docs outrank off-target docs") {
    val sel = Dsir.select(corpus, col("kind") === "target", n = 45,
      buckets = 256)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    val rankOf = sel.map(s => s._2 -> s._1).toMap
    // every science-like doc (target members + the 5 raw look-alikes)
    // ranks above every spam doc
    val sciIds = (0L until 10L) ++ (40L until 45L)
    val spamIds = 10L until 40L
    val worstSci = sciIds.map(rankOf).max
    val bestSpam = spamIds.map(rankOf).min
    assert(worstSci < bestSpam,
      s"worst science rank $worstSci !< best spam rank $bestSpam\n" +
        sel.sortBy(_._1).take(20).mkString("\n"))
    // weights order accordingly: science-like strictly positive-er
    val wOf = sel.map(s => s._2 -> s._3).toMap
    assert(sciIds.map(wOf).min > spamIds.map(wOf).max)
  }

  test("weights equal a driver-side recompute of the published recipe " +
      "(hashed unigram+bigram add-one log-ratio, fixed-point)") {
    val buckets = 64
    val rows = corpus.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    def md5Long60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def gramsOf(text: String): Seq[String] = {
      val t = text.trim.split("\\s+").toSeq
      t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    val docB = rows.map { case (id, text, _) =>
      id -> gramsOf(text).map(g => (md5Long60(g) % buckets).toInt)
        .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    }.toMap
    val q = docB.values.flatten
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val t = rows.filter(_._3 == "target")
      .flatMap(r => docB(r._1)).groupBy(_._1)
      .map { case (b, xs) => b -> xs.map(_._2).sum }
    val tq = q.values.sum.toDouble
    val tt = t.values.sum.toDouble
    val lam = q.map { case (b, cq) =>
      b -> math.floor(
        (math.log((t.getOrElse(b, 0L) + 1.0) / (tt + buckets)) -
         math.log((cq + 1.0) / (tq + buckets))) * 1e6 + 0.5).toLong
    }
    val want = docB.map { case (id, cnts) =>
      id -> cnts.map { case (b, c) => c * lam(b) }.sum
    }
    val got = Dsir.importanceWeights(corpus, col("kind") === "target",
        buckets = buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet).take(3)} / " +
        s"${(want.toSet diff got.toSet).take(3)}")
  }

  test("exact-integer weights are partitioning-invariant") {
    val a = Dsir.importanceWeights(corpus, col("kind") === "target",
        buckets = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dsir.importanceWeights(corpus.repartition(13),
        col("kind") === "target", buckets = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("n_grams counts unigrams + bigrams; select ranks densely from 1") {
    import spark.implicits._
    val tiny = Seq((0L, "w x y", true), (1L, "w w", false))
      .toDF("doc_id", "text", "tgt")
    val w = Dsir.importanceWeights(tiny, col("tgt"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == Map(0L -> 5L, 1L -> 3L)) // 3 uni + 2 bi; 2 uni + 1 bi
    val sel = Dsir.select(tiny, col("tgt"), n = 10, buckets = 16)
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(sel == Seq(1, 2))
  }

  test("fit on a sample scores a disjoint corpus (unseen buckets take " +
      "the smoothed default); scoring runs unchanged on a stream") {
    import spark.implicits._
    val model = Dsir.fit(corpus, col("kind") === "target", buckets = 128)
    // driver-side expected weight for an arbitrary doc under the model
    def md5Long60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def wOf(text: String): Long = {
      val t = text.trim.split("\\s+").toSeq
      val grams = t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      grams.map(g => model.lam.getOrElse(md5Long60(g) % 128,
        model.lamDefault)).sum
    }
    val novel = Seq((999L, "zzz qqq ppp"), (1000L, "quantum physics lab"))
      .toDF("doc_id", "text")
    val got = Dsir.score(novel, model).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(999L -> wOf("zzz qqq ppp"),
      1000L -> wOf("quantum physics lab")), s"got $got")

    // streaming: the same score projection over a MemoryStream emits
    // identical rows to the batch path
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Dsir.score(mem.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("dsir_stream_scores")
      .outputMode("append").start()
    try {
      mem.addData((1L, "quantum physics theory"), (2L, "buy cheap zz"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dsir_stream_scores").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Dsir.score(Seq((1L, "quantum physics theory"),
        (2L, "buy cheap zz")).toDF("doc_id", "text"), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("scoreGrams on a withGramBuckets column reproduces the text " +
      "path bit-for-bit (tokenize-once handoff)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    val model = Dsir.fit(docs, col("source") === "src0", buckets = 128)
    val viaText = Dsir.score(docs, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val withBs = Dsir.withGramBuckets(
      docs.filter(col("text").isNotNull)
        .withColumn("toks", split(trim(col("text")), "\\s+")),
      col("toks"), "bs", 128)
    val viaGrams = Dsir.scoreGrams(withBs, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaGrams == viaText)
  }
}
