package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfBqSpec extends AnyFunSuite {

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

  lazy val ivf: IvfFlat.Model = IvfFlat.fit(emb, numCells = 4)
  lazy val model: IvfBq.Model = IvfBq.fromIvf(ivf)

  test("all-cells probing ≡ the flat BQ scan exactly (cell routing only " +
      "prunes, never rescores)") {
    val flat = Bq.knnJoin(Bq.fit(emb), emb, probes, k = 5, rerank = 50,
        scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val allCells = IvfBq.knnJoin(model, emb, probes, k = 5, nprobe = 4,
        rerank = 50, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(allCells == flat)
  }

  test("thresholds equal the flat BQ fit (same global midrange)") {
    assert(model.thresholds.toSeq == Bq.fit(emb).thresholds.toSeq)
  }

  test("pruned probing: self-match first, decent recall, fewer rows scanned") {
    val res = IvfBq.knnJoin(model, emb, probes, k = 10, nprobe = 1,
      rerank = 100, scoreDigits = 6)
    // every query's own vector lives in its nearest cell → rank-1 self hit
    val selfTop = res.filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(selfTop.nonEmpty && selfTop.forall { case (q, n) => q == n })
    val exact = KnnJoin.exactKnnJoin(emb, probes, k = 10, metric = "cosine")
    val rec = Recall.microAvgRecall(
        IvfBq.knnJoin(model, emb, probes, k = 10, nprobe = 2, rerank = 100),
        exact).select("recall").first().getDouble(0)
    assert(rec >= 0.4, s"ivfbq nprobe=2 recall@10 = $rec")
  }

  test("batched probes ≡ whole probe set") {
    val whole = IvfBq.knnJoin(model, emb, probes, k = 5, nprobe = 2,
        rerank = 50)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val batched = IvfBq.knnJoinBatched(model, emb, probes, k = 5, nprobe = 2,
        rerank = 50, batchRows = 7)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(batched == whole)
  }
}
