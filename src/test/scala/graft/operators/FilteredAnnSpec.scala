package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.hnsw.{HnswParams, IvfHnsw}

class FilteredAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  def emb: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
  def probes: DataFrame = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  lazy val model: IvfHnsw.Model = IvfHnsw.fit(emb, numCells = 4,
    HnswParams(m = 16, efConstruction = 200))
  def hybridProbe(q: DataFrame, kp: Int, round: Int): DataFrame =
    IvfHnsw.knnJoin(model, q, kp, nprobe = 4)

  private def rows(df: DataFrame) =
    df.select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet

  test("selective predicate (matches < k) returns ALL matches — exactly the " +
      "exact filtered top-k, via the guarantee fallback") {
    val pred = col("vec_id") < 7 // 7 matches, k = 10
    val got = FilteredAnn.knnJoin(emb, probes, k = 10, pred, hybridProbe)
    val exact = KnnJoin.exactKnnJoin(emb.filter(pred), probes, k = 10)
    assert(rows(got) == rows(exact))
    // 20 queries x 7 matching rows each — never silently fewer
    assert(got.count() == 20L * 7)
  }

  test("non-selective predicate: exactly k survivors per query, every one " +
      "passing the predicate") {
    val pred = col("vec_id") % 2 === 0 // half the corpus matches
    val got = FilteredAnn.knnJoin(emb, probes, k = 10, pred, hybridProbe)
      .persist()
    val perQuery = got.groupBy("query_id").count().collect()
    assert(perQuery.length == 20 && perQuery.forall(_.getLong(1) == 10))
    assert(got.filter(col("neighbor_id") % 2 =!= 0).count() == 0)
    // plan shape: the predicate semi-join broadcasts the (small) candidate
    // side — the base is never shuffled by the filter application
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"survivors should come from a broadcast left-semi join:\n$p")
    // quality: survivors should broadly agree with the exact filtered top-k
    val exact = KnnJoin.exactKnnJoin(emb.filter(pred), probes, k = 10)
    val hits = got.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id")).count()
    assert(hits.toDouble / exact.count() >= 0.8,
      s"filtered recall = ${hits.toDouble / exact.count()}")
    got.unpersist()
  }

  test("maxRounds = 0 degenerates to the exact scan over the filtered base") {
    val pred = col("vec_id") % 3 === 1
    val got = FilteredAnn.knnJoin(emb, probes, k = 5, pred, hybridProbe,
      maxRounds = 0, scoreDigits = 6)
    val exact = KnnJoin.exactKnnJoin(emb.filter(pred), probes, k = 5,
      scoreDigits = 6)
    assert(got.collect().map(_.toSeq).toSet == exact.collect().map(_.toSeq).toSet)
  }

  test("euclidean probe family (IVF-PQ): fallback scores rank consistently " +
      "with the probe's 1/(1+L2) scores") {
    val pq = IvfPq.fit(emb, numCells = 4, numSub = 8, codesPerSub = 16,
      opqIters = 2, packed = true)
    def pqProbe(q: DataFrame, kp: Int, round: Int): DataFrame =
      IvfPq.knnJoin(pq, emb, q, kp, nprobe = 2, rerank = math.max(50, kp))
    // selective: guarantee branch == exact filtered euclidean top-k
    val pred = col("vec_id") < 6
    val got = FilteredAnn.knnJoin(emb, probes, k = 10, pred, pqProbe,
      metric = "euclidean", scoreDigits = 6)
    val exact = KnnJoin.exactKnnJoin(emb.filter(pred), probes, k = 10,
      metric = "euclidean", scoreDigits = 6)
    assert(got.collect().map(_.toSeq).toSet == exact.collect().map(_.toSeq).toSet)
    // non-selective: escalation satisfies with k predicate-true survivors
    val wide = FilteredAnn.knnJoin(emb, probes, k = 5, col("vec_id") % 2 === 1,
      pqProbe, metric = "euclidean")
    val perQuery = wide.groupBy("query_id").count().collect()
    assert(perQuery.length == 20 && perQuery.forall(_.getLong(1) == 5))
    assert(wide.filter(col("neighbor_id") % 2 =!= 1).count() == 0)
  }

  test("predicate matching nothing returns an empty result, not an error") {
    val got = FilteredAnn.knnJoin(emb, probes, k = 5, col("vec_id") < 0,
      hybridProbe)
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("query_id", "neighbor_id", "score", "rank"))
  }

  test("escalation satisfies moderately selective predicates without the " +
      "exact fallback (probe calls observed), and rounds only shrink the " +
      "query set") {
    val pred = col("vec_id") >= 100 // 400 of 500 rows match
    var calls = 0
    var lastQueryCount = Long.MaxValue
    val counting = (q: DataFrame, kp: Int, round: Int) => {
      calls += 1
      val n = q.count()
      assert(n <= lastQueryCount, "rounds must never grow the query set")
      lastQueryCount = n
      hybridProbe(q, kp, round)
    }
    val got = FilteredAnn.knnJoin(emb, probes, k = 5, pred, counting,
      maxRounds = 3)
    assert(calls >= 1 && calls <= 3)
    val perQuery = got.groupBy("query_id").count().collect()
    assert(perQuery.length == 20 && perQuery.forall(_.getLong(1) == 5))
    assert(got.filter(col("neighbor_id") < 100).count() == 0)
  }
}
