package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  def emb: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  lazy val model: IvfFlat.Model = IvfFlat.fit(emb, numCells = 4)

  private def result(threshold: Double): Map[Long, (Int, Boolean)] =
    SemDedup.dedup(model, threshold).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap

  test("verdict covers every corpus row exactly once") {
    val got = SemDedup.dedup(model, threshold = 0.8)
    assert(got.count() == emb.count())
    assert(got.select("vec_id").distinct().count() == emb.count())
  }

  test("keep-first exactness: dropped iff a smaller-id same-cell neighbor " +
      "within threshold exists") {
    val t = 0.8
    val got = result(t)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = dot / (math.sqrt(na) * math.sqrt(nb))
      if (d.isNaN) -1.0 else d
    }
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val byCell = got.groupBy(_._2._1)
    byCell.foreach { case (_, members) =>
      val ids = members.keys.toSeq.sorted
      ids.foreach { id =>
        val expectDrop = ids.exists(o =>
          o < id && rnd6(cos(vecs(o), vecs(id))) >= t)
        assert(got(id)._2 == !expectDrop,
          s"vec $id kept=${got(id)._2} but near-dup-exists=$expectDrop")
      }
    }
    // the smallest id in every cell is always kept
    byCell.foreach { case (cell, members) =>
      val minId = members.keys.min
      assert(members(minId)._2, s"cell $cell min id $minId was dropped")
    }
  }

  test("threshold extremes: > 1 keeps everything, -1 keeps one per cell") {
    assert(result(1.1).forall(_._2._2))
    val onePerCell = result(-1.0)
    val keptPerCell = onePerCell.values.groupBy(_._1)
      .map { case (c, vs) => c -> vs.count(_._2) }
    assert(keptPerCell.values.forall(_ == 1), s"kept per cell: $keptPerCell")
  }

  test("plan: the pairwise work is a cell equi-join — no cartesian, no " +
      "nested-loop join") {
    val p = SemDedup.dedup(model, threshold = 0.8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"pair join degenerated:\n$p")
  }
}
