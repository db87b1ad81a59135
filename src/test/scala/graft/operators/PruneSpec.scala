package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PruneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  def emb: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  lazy val model: IvfFlat.Model = IvfFlat.fit(emb, numCells = 4)

  test("verdict covers every corpus row exactly once and keeps " +
      "ceil(frac * cell size) per cell") {
    val got = Prune.prototypes(model, keepFrac = 0.5)
    assert(got.count() == emb.count())
    assert(got.select("vec_id").distinct().count() == emb.count())
    val perCell = got.groupBy("cell").agg(
        count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    perCell.foreach { case (n, keptN) =>
      assert(keptN == math.ceil(0.5 * n).toLong, s"cell n=$n kept=$keptN")
    }
  }

  test("kept set matches a driver-side recompute: hardest keepFrac per " +
      "cell by rounded prototype similarity") {
    val frac = 0.5
    val got = Prune.prototypes(model, keepFrac = frac).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getInt(3),
        r.getBoolean(4))).toMap
    val cents = model.centroids.toMap
    val assigned = model.assigned.collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getSeq[Float](r.fieldIndex("vec")).toArray,
        r.getInt(r.fieldIndex("cell"))))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        // widen BEFORE multiplying — the engine kernel computes in double
        val xi = a(i).toDouble; val yi = b(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assigned.groupBy(_._3).foreach { case (cell, members) =>
      val ranked = members
        .map { case (id, v, _) =>
          val s = cos(v, cents(cell))
          (id, r6(if (s.isNaN) -1.0 else s))
        }
        .sortBy { case (id, s) => (s, id) }
      val keepN = math.ceil(frac * ranked.length).toInt
      ranked.zipWithIndex.foreach { case ((id, s), ix) =>
        val (gCell, gSim, gRank, gKept) = got(id)
        assert(gCell == cell && gSim == s && gRank == ix + 1,
          s"row $id: got ($gCell,$gSim,$gRank) want ($cell,$s,${ix + 1})")
        assert(gKept == (ix + 1 <= keepN), s"kept mismatch at $id")
      }
    }
  }

  test("keepFrac extremes: 1.0 keeps everything; tiny frac keeps exactly " +
      "one (the hardest) per cell") {
    val all = Prune.prototypes(model, keepFrac = 1.0)
    assert(all.filter(!col("kept")).count() == 0)
    val one = Prune.prototypes(model, keepFrac = 1e-9)
    val perCell = one.filter(col("kept")).groupBy("cell")
      .agg(count(lit(1)).as("n"), min("hardness_rank").as("r"))
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    perCell.foreach { case (n, r) => assert(n == 1L && r == 1) }
  }

  test("plan has no cartesian/pairwise stage — assignment join is the " +
      "broadcast centroid join only") {
    val plan = Prune.prototypes(model, keepFrac = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"unexpected cartesian in plan:\n$plan")
  }
}
