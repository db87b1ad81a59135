package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MrlSpec extends AnyFunSuite {

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

  test("full-prefix truncation is exact: prefixDims = d reproduces " +
      "exact cosine top-k") {
    val exact = KnnJoin.exactKnnJoin(emb, probes, k = 10, metric = "cosine",
        scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val full = Mrl.knnJoinTruncated(emb, probes, k = 10, prefixDims = 64,
        rerank = 10, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(full == exact)
  }

  test("knnJoinTruncated matches an in-memory recompute of the same " +
      "truncated-candidate cut + full rerank") {
    val p = 16
    val got = Mrl.knnJoinTruncated(emb, probes, k = 5, prefixDims = p,
        rerank = 30, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float], n: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val want = (0L until 20L).flatMap { qid =>
      val q = vecs(qid)
      val cands = vecs.toSeq
        .map { case (id, v) => (-r6(cos(q, v, p)), id) }
        .sorted.take(30).map(_._2)
      cands.map { id => (-r6(cos(q, vecs(id), 64)), id) }
        .sorted.take(5).zipWithIndex
        .map { case ((_, id), i) => (qid, id, i + 1) }
    }.toSet
    assert(got == want)
  }

  test("prefix-column layout: identical results to in-flight slicing; " +
      "stage-1 ReadSchema carries only (vec_id, prefix)") {
    val tmp = java.nio.file.Files.createTempDirectory("mrl").toString + "/t"
    Mrl.writePrefixLayout(emb, tmp, prefixDims = 16)
    val fromLayout = Mrl.knnJoinPrefixLayout(spark, tmp, probes, k = 5,
        rerank = 30, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val inFlight = Mrl.knnJoinTruncated(emb, probes, k = 5, prefixDims = 16,
        rerank = 30, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(fromLayout == inFlight)
    // the candidate-stage scan must be column-pruned to the prefix
    val plan = Mrl.knnJoinPrefixLayout(spark, tmp, probes, k = 5, rerank = 30)
      .queryExecution.executedPlan.toString
    val stage1Scan = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("prefix")).toSeq
    assert(stage1Scan.nonEmpty, plan)
    assert(stage1Scan.exists(!_.contains("embedding")),
      s"stage-1 scan must not read the full vector column:\n$plan")
  }

  test("recall improves with prefix width; 16-dim prefix is usable") {
    val exact = KnnJoin.exactKnnJoin(emb, probes, k = 10, metric = "cosine")
    def rec(p: Int): Double =
      Recall.microAvgRecall(
        Mrl.knnJoinTruncated(emb, probes, k = 10, prefixDims = p, rerank = 100),
        exact).select("recall").first().getDouble(0)
    // synthetic embeddings are the adversarial case for truncation: with
    // no matryoshka training, a p-dim prefix carries only ~p/d of the
    // signal — the floor documents that regime, the monotonicity claim is
    // the structural property
    val r4 = rec(4); val r16 = rec(16)
    assert(r16 >= 0.65, s"mrl p=16 recall@10 = $r16")
    assert(r16 >= r4 + 0.1, s"wider prefix must buy recall: p4=$r4 p16=$r16")
  }
}
