package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RrfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def ranked(rows: (Long, Long, Int)*): DataFrame =
    rows.toDF("query_id", "doc_id", "rank")

  test("RRF geometry on a hand-checked fixture: both-list docs outrank " +
      "single-list docs; scores are 1/(60+r) sums rounded to 6") {
    val lex = ranked((1L, 10L, 1), (1L, 20L, 2))
    val vec = ranked((1L, 20L, 1), (1L, 30L, 2))
    val got = Rrf.fuse(lex, vec, k = 10)
      .orderBy("rank")
      .select("doc_id", "lrank", "vrank", "rrf_score", "rank")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getDouble(3), r.getInt(4)))
    // doc 20: 1/62 + 1/61 = 0.032522; doc 10: 1/61 = 0.016393; doc 30: 1/62
    assert(got === Seq(
      (20L, Some(2), Some(1), 0.032522, 1),
      (10L, Some(1), None, 0.016393, 2),
      (30L, None, Some(2), 0.016129, 3)))
  }

  test("equal-score ties break on ascending doc_id (deterministic fusion)") {
    // docs 5 and 9 both score exactly 1/61 (rank 1 in exactly one list)
    val lex = ranked((1L, 9L, 1))
    val vec = ranked((1L, 5L, 1))
    val got = Rrf.fuse(lex, vec, k = 10).orderBy("rank")
      .select("doc_id").as[Long].collect()
    assert(got === Seq(5L, 9L))
  }

  test("k bounds each query independently; queries don't bleed") {
    val lex = ranked((1L to 2L).flatMap(q => (1 to 30).map(r =>
      (q, 100L * q + r, r))): _*)
    val vec = ranked((1L to 2L).flatMap(q => (1 to 30).map(r =>
      (q, 100L * q + 30 + r, r))): _*)
    val got = Rrf.fuse(lex, vec, k = 7)
    assert(got.groupBy("query_id").count().as[(Long, Long)].collect().toMap
      === Map(1L -> 7L, 2L -> 7L))
    // per-query candidates never cross query ids
    assert(got.filter(floor(col("doc_id") / 100) =!= col("query_id")).count() === 0)
  }

  test("battery entry returns k fused rows per query over real tables") {
    val df = graft.VectorQueries.queries("rrf_fusion")(
      spark, "/root/testdata/sf0.001")
    val perQ = df.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(perQ.keySet === (0L until 10L).toSet)
    assert(perQ.values.forall(_ == 10L))
    // queries ⊆ base: the query doc scores rank 1 in both lists for at
    // least most queries — fused head must contain docs found by BOTH
    // retrievers (non-null lrank AND vrank somewhere in every head)
    val bothCnt = df.filter(col("lrank").isNotNull && col("vrank").isNotNull)
      .select("query_id").distinct().count()
    assert(bothCnt === 10L)
  }
}
