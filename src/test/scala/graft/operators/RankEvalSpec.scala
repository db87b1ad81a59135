package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class RankEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def ranked(rows: (Long, Long, Int)*): DataFrame =
    rows.toDF("query_id", "doc_id", "rank")

  private def pairs(rows: (Long, Long)*): DataFrame =
    rows.toDF("query_id", "doc_id")

  test("perfect ranking scores rr=1 and ndcg=1") {
    val sys = ranked((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
    val truth = pairs((1L, 10L), (1L, 20L), (1L, 30L))
    val r = RankEval.rankMetrics(sys, truth, k = 3).collect().head
    assert(r.getAs[Double]("rr") == 1.0)
    assert(r.getAs[Double]("ndcg") == 1.0)
  }

  test("hand-checked partial ranking: first relevant at rank 2") {
    // relevant at ranks 2 and 3 of k=3: rr = 1/2;
    // dcg = 1/log2(3) + 1/log2(4); idcg = 1/log2(2) + 1/log2(3) + 1/log2(4)
    val sys = ranked((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
    val truth = pairs((1L, 20L), (1L, 30L), (1L, 99L))
    val r = RankEval.rankMetrics(sys, truth, k = 3).collect().head
    assert(r.getAs[Double]("rr") == 0.5)
    val ln2 = math.log(2.0)
    val dcg = 1.0 / (math.log(3.0) / ln2) + 1.0 / (math.log(4.0) / ln2)
    val want = math.floor(dcg / RankEval.idcg(3) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("ndcg") == want)
  }

  test("no relevant docs scores zero; queries stay isolated") {
    val sys = ranked((1L, 10L, 1), (2L, 10L, 1))
    val truth = pairs((2L, 10L))
    val rows = RankEval.rankMetrics(sys, truth, k = 1).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Double]("rr"), r.getAs[Double]("ndcg"))).toMap
    assert(rows(1L) == ((0.0, 0.0)))
    assert(rows(2L) == ((1.0, 1.0)))
  }
}
