package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity gate for the reference-object centroid scorer: results must be
  * BIT-IDENTICAL to the literal-expression forms it replaced
  * (greatest(struct(sim, cell)) for assignment;
  * reverse(array_sort(array(struct(s, c)))) / struct(-s, c) ascending for
  * probe routing) — the cross-engine IVF/SemDedup/IVF-PQ oracles all
  * assume those exact tie orders and the NaN→-1.0 guard. */
class CellsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // deterministic corpus incl. a zero vector (NaN cosine) and exact
  // duplicates of centroid vectors (score ties across cells)
  private def mkVec(seed: Int, d: Int): Array[Float] =
    Array.tabulate(d)(j => (((seed * 31 + j) % 17) - 8).toFloat / 4f)
  private val d = 8
  private val cents: Array[(Int, Array[Float])] =
    Array.tabulate(6)(c => (c, mkVec(c + 100, d))) ++
      Array((6, mkVec(100, d))) // duplicate of cell 0's vector => ties
  private def corpus: DataFrame =
    (Seq((0L, Array.fill(d)(0f))) ++ (1L to 200L).map(i =>
      (i, if (i % 7 == 0) cents((i % 7).toInt)._2 else mkVec(i.toInt, d))))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))

  private def literalTopN(metric: String, n: Int, tieCellDesc: Boolean) = {
    val scores = cents.map { case (c, v) =>
      if (tieCellDesc)
        struct(nanvl(similarity.sim(metric)(col("vec"), typedlit(v)), lit(-1.0)).as("s"),
          lit(c).as("c"))
      else
        struct(negate(nanvl(similarity.sim(metric)(col("vec"), typedlit(v)), lit(-1.0))).as("s"),
          lit(c).as("c"))
    }
    val arr =
      if (tieCellDesc) slice(reverse(array_sort(array(scores.toSeq: _*))), 1, n)("c")
      else slice(array_sort(array(scores.toSeq: _*)), 1, n)("c")
    corpus.select(col("id"), arr.as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
  }

  private def scorerTopN(metric: String, n: Int, tieCellDesc: Boolean) =
    corpus.select(col("id"),
        cells.nearest_cells(col("vec"), cents, metric, n, tieCellDesc).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

  for {
    metric <- Seq("cosine", "euclidean", "dot")
    n <- Seq(1, 3, 7)
    tie <- Seq(true, false)
  } test(s"scorer ≡ literal form: metric=$metric n=$n tieCellDesc=$tie") {
    assert(scorerTopN(metric, n, tie) == literalTopN(metric, n, tie))
  }

  test("n beyond C returns all cells, ranked") {
    val got = scorerTopN("cosine", 50, tieCellDesc = true)
    assert(got.values.forall(_.length == cents.length))
  }

  test("zero-norm vector lands deterministically (NaN pinned to -1)") {
    val zero = scorerTopN("cosine", 1, tieCellDesc = true)(0L)
    assert(zero == literalTopN("cosine", 1, tieCellDesc = true)(0L))
  }

  test("pruneRerankBase: selective waves filter, near-full coverage " +
      "skips the filter entirely, rows identical either way") {
    val base = spark.range(0, 1000)
      .select(col("id").as("vec_id"),
        pmod(col("id"), lit(16)).cast("int").as(cells.RerankCellCol))
    def planOf(df: DataFrame): String = df.queryExecution.optimizedPlan.toString
    // selective: 4 of 16 cells => filter present, rows = probed cells only
    val selective = cells.pruneRerankBase(base, Seq(0, 1, 2, 3), 16)
    assert(planOf(selective).contains("Filter"))
    assert(selective.count() == 252) // cells 0-7 hold 63 rows, 8-15 hold 62
    assert(!selective.columns.contains(cells.RerankCellCol))
    // full coverage: > half the cells => no filter, full base flows
    val full = cells.pruneRerankBase(base, (0 until 12), 16)
    assert(!planOf(full).contains("Filter"),
      "near-full coverage must skip the per-row filter")
    assert(full.count() == 1000)
    // unknown total keeps the conservative pruning behavior
    val unknown = cells.pruneRerankBase(base, (0 until 12))
    assert(planOf(unknown).contains("Filter"))
    assert(unknown.count() == 752)
    // a caller table without the marker column passes through untouched
    val alien = spark.range(5).select(col("id").as("vec_id"),
      lit(3).as("cell"))
    assert(cells.pruneRerankBase(alien, Seq(0), 16).columns
      .contains("cell"))
  }
}
