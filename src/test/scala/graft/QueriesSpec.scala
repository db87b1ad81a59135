package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Guardrails over the driver contract: every registered query must
  * execute at smoke scale, and the oracle map must reference real
  * queries. (Value parity vs DuckDB is tools/compare.py's job.) */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("hybrid_serving_summary serves every probe: n·k result rows") {
    val r = SparkEntry.queries("hybrid_serving_summary")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("result_rows") == r.getAs[Long]("n_queries") * 10,
      s"serving path dropped probes: $r")
    assert(r.getAs[Double]("qps") > 0)
  }

  test("bm25_top_docs: 20 query docs, dense ranks, scores descend per query") {
    val rows = SparkEntry.queries("bm25_top_docs")(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 20, s"expected 20 query docs, got ${byQ.size}")
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length),
        s"qid=$qid ranks not dense")
      val scores = sorted.map(_.getAs[Double]("bm25")).toSeq
      assert(scores == scores.sorted.reverse, s"qid=$qid scores not descending")
      assert(scores.head > 0.0)
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.count() // force full execution
    }
  }
}
