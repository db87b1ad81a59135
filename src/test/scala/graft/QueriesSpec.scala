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

  test("dedup_keep_best keeps exactly the best (priority, length, id) doc " +
      "per near-dup cluster") {
    val rows = SparkEntry.queries("dedup_keep_best")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("priority"), r.getAs[Boolean]("kept")))
    val clusters = SparkEntry.queries("dedup_clusters")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(rows.length == clusters.size)
    rows.foreach { case (id, cl, _, _) => assert(clusters(id) == cl) }
    val meta = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "cast(substring(source, 4, 10) as bigint) priority",
        "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._2).foreach { case (cl, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cluster $cl kept ${kept.length}")
      val want = members.map { case (id, _, _, _) =>
        val (p, nc) = meta(id); (p, -nc, id)
      }.min._3
      assert(kept.head._1 == want,
        s"cluster $cl kept ${kept.head._1}, want $want")
      members.foreach { case (id, _, p, _) => assert(p == meta(id)._1) }
    }
  }

  test("dedup_aware_split: one split per cluster, leak flag matches the " +
      "naive split's cluster spread, singletons agree with the naive split") {
    val rows = SparkEntry.queries("dedup_aware_split")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[String]("split"), r.getAs[String]("naive_split"),
        r.getAs[Boolean]("cluster_leaky")))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cl severed by the cluster-aware split")
      val wantLeaky = members.map(_._4).distinct.length > 1
      members.foreach { case (id, _, _, _, leaky) =>
        assert(leaky == wantLeaky, s"doc $id leak flag")
      }
      if (members.length == 1) {
        // singleton: cluster_id = doc_id, so both hashes agree
        assert(members.head._3 == members.head._4)
      }
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
