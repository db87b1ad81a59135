package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MiningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("hand-checked geometry: hardest negatives, semi-hard flag, " +
      "singleton-label null pos_score") {
    import spark.implicits._
    // unit circle in 2-d: cosine similarity = cos(angle difference)
    def v(deg: Double) = Array(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val base = Seq(
      (0L, v(0), 0),    // anchor, label 0
      (1L, v(10), 0),   // positive at 10°  (pos_score ≈ .985)
      (2L, v(5), 1),    // negative at 5°   — HARDER than the positive
      (3L, v(20), 1),   // negative at 20°  — semi-hard (inside positive)
      (4L, v(90), 2),   // negative at 90°  — easy
      (5L, v(180), 3)   // singleton-label anchor below
    ).toDF("vec_id", "embedding", "label")
    val anchors = base.filter(col("vec_id").isin(0L, 5L))
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
    val got = Mining.hardNegatives(base, anchors, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(6)) None else Some(r.getBoolean(6)))).toSet
    // anchor 0: negatives ranked 2 (5°) > 3 (20°) > 4 (90°); the 5° one
    // is harder than the positive (not semi-hard), the others semi-hard
    // anchor 5: label 3 has no other member → pos_score null → flag null
    assert(got == Set(
      (0L, 1, 2L, Some(false)), (0L, 2, 3L, Some(true)),
      (0L, 3, 4L, Some(true)),
      (5L, 1, 4L, None), (5L, 2, 3L, None), (5L, 3, 1L, None)),
      s"got $got")
  }

  test("training triplets: hardest positive pairs with top-k negatives, " +
      "margins consistent; anchors without a positive yield no triplet") {
    import spark.implicits._
    def v(deg: Double) = Array(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val base = Seq(
      (0L, v(0), 0), (1L, v(10), 0),            // anchor + its positive
      (2L, v(5), 1), (3L, v(20), 1), (4L, v(90), 2),
      (5L, v(180), 3)                            // singleton label
    ).toDF("vec_id", "embedding", "label")
    val anchors = base.filter(col("vec_id").isin(0L, 5L))
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
    val got = Mining.trainingTriplets(base, anchors, negK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // anchor 5 has no same-label partner → no triplets at all
    assert(got.forall(_._1 == 0L))
    assert(got.map(t => (t._2, t._3, t._4)).toSet ==
      Set((1, 1L, 2L), (2, 1L, 3L), (3, 1L, 4L)))
    // margin is exactly the rounded difference of the returned scores
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    got.foreach { case (_, rnk, _, _, ps, ns, m) =>
      assert(m == r6(ps - ns))
      // the 5-degree negative is harder than the positive → margin < 0
      if (rnk == 1) assert(m < 0) else assert(m > 0)
    }
  }

  test("IVF-gated mining at all-cells is bit-identical to the exact " +
      "operator; pruned probes return full rows and never a same-label") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = IvfFlat.fit(e, numCells = 8)
    val anchors = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
    def coll(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toSet
    val exact = coll(Mining.hardNegatives(e, anchors, k = 5))
    val allCells = coll(Mining.hardNegativesIvf(e, model, anchors, k = 5,
      nprobe = 8))
    assert(allCells == exact,
      s"diff: ${(allCells diff exact).take(3)} / ${(exact diff allCells).take(3)}")
    val pruned = Mining.hardNegativesIvf(e, model, anchors, k = 5,
        nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    val labelOf = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pruned.groupBy(_._1).forall(_._2.length == 5),
      "every anchor must fill k (escalating if its probes under-fill)")
    assert(pruned.forall { case (q, n, l) => n != q && l != labelOf(q) })
    model.release()
  }

  test("escalation: an anchor whose nearest cell is all same-label " +
      "still fills k negatives") {
    import spark.implicits._
    // three tight, well-separated clusters; label == cluster — any
    // anchor's nprobe=1 probe set holds ONLY its own label
    val base = (0 until 30).map { i =>
      val cl = i % 3
      val ang = math.toRadians(cl * 120.0 + (i / 3) * 0.5)
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat), cl)
    }.toDF("vec_id", "embedding", "label")
    val model = IvfFlat.fit(base, numCells = 3)
    val anchors = base.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
    val got = Mining.hardNegativesIvf(base, model, anchors, k = 4,
        nprobe = 1)
      .collect().map(r => (r.getLong(2), r.getInt(3)))
    assert(got.length == 4, s"expected 4 negatives, got ${got.toSeq}")
    assert(got.forall(_._2 != 0))
    model.release()
  }

  test("equals a driver-side brute force on real embeddings; never " +
      "returns self or a same-label vector") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val anchors = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
    val got = Mining.hardNegatives(e, anchors, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    val rows = e.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = rows.filter(_._1 < 20).flatMap { case (qid, qv, ql) =>
      val scored = rows.filter(_._1 != qid)
        .map { case (id, v, l) => (id, l, r6(cos(v, qv))) }
      val posScore = scored.filter(_._2 == ql).map(_._3).max
      scored.filter(_._2 != ql).sortBy(t => (-t._3, t._1)).take(5)
        .zipWithIndex.map { case ((id, l, s), i) =>
          (qid, i + 1, id, l, s, posScore, s < posScore) }
    }.toSet
    assert(got.toSet == want,
      s"diff: ${(got.toSet diff want).take(3)} / ${(want diff got.toSet).take(3)}")
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    assert(got.forall { case (qid, _, nid, l, _, _, _) =>
      nid != qid && l != labelOf(qid) })
  }
}
