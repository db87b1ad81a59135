package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def md5Long60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("equals a driver-side recompute of the A-Res key on real docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Sampling.weightedTopN(docs, col("n_chars").cast("long"), n = 20)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val rows = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def key(id: Long, w: Long): Double = {
      val u = (md5Long60(s"wsample:$id").toDouble + 0.5) /
        1.152921504606846976e18
      math.floor(math.log(u) / w * 1e12 + 0.5) / 1e12
    }
    val want = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, w, key(id, w)) }
      .sortBy(t => (-t._3, t._1)).take(20)
      .zipWithIndex.map { case ((id, w, k), i) => (i + 1, id, w, k) }
    assert(got.toSeq == want.toSeq,
      s"diff: ${got.toSet diff want.toSet} / ${want.toSet diff got.toSet}")
  }

  test("selection is invariant to weight rescaling and to partitioning; " +
      "zero/negative weights never sampled") {
    val df = (1L to 500L).map(i => (i, (i % 97) + 1)).toDF("doc_id", "w")
      .union(Seq((9001L, 0L), (9002L, -5L)).toDF("doc_id", "w"))
    def ids(d: org.apache.spark.sql.DataFrame, wc: org.apache.spark.sql.Column) =
      Sampling.weightedTopN(d, wc, n = 50)
        .collect().map(_.getLong(1)).toSet
    val base = ids(df, col("w"))
    assert(ids(df, col("w") * 1000) == base, "rescaling changed the sample")
    assert(ids(df.repartition(13), col("w")) == base,
      "partitioning changed the sample")
    assert(!base.contains(9001L) && !base.contains(9002L))
    assert(base.size == 50)
  }

  test("heavier items are sampled proportionally more often (A-Res " +
      "inclusion property, aggregated over disjoint salts)") {
    // weight 9 vs weight 1, 200 items each, sample 40 of 400 per salt:
    // expected inclusion ≈ 9:1 for small sampling fractions
    val df = ((1L to 200L).map(i => (i, 9L)) ++
      (201L to 400L).map(i => (i, 1L))).toDF("doc_id", "w")
    var heavy = 0; var light = 0
    for (s <- 0 until 20) {
      val sel = Sampling.weightedTopN(df, col("w"), n = 40,
          salt = s"salt$s:")
        .collect().map(_.getLong(1))
      heavy += sel.count(_ <= 200); light += sel.count(_ > 200)
    }
    val ratio = heavy.toDouble / math.max(light, 1)
    assert(ratio > 4.0 && ratio < 20.0,
      s"inclusion ratio $ratio (heavy=$heavy light=$light) not ≈ 9")
  }
}
