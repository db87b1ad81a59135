package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked-retrieval quality metrics: per-query reciprocal rank (MRR's
  * per-query term) and nDCG@k against a binary-relevance truth set —
  * the standard evaluation pair for a retrieval stack (recall@k, already
  * in [[Recall]], measures coverage; RR/nDCG measure ORDER quality).
  *
  * Binary relevance: a (query_id, doc_id) is relevant iff it appears in
  * `truth` (e.g. the exact top-k under the target metric — the same
  * ground-truth contract the recall operators use, reference
  * src/bench/metrics.ts:26-44).
  *
  * Scale shape: both inputs are bounded per-query ranked heads (|Q|·k
  * rows); the join is on (query_id, doc_id) and every aggregation is a
  * per-query hash agg with map-side combine — nothing here ever touches
  * a corpus, so cost is independent of base size at any scale.
  *
  * Determinism/oracle contract: RR = max(rel/rank) (exactly 1/first
  * relevant rank — order-free). DCG sums rel/log2(rank+1) with ln/ln(2)
  * written explicitly on both engines (the unigram_surprisal ln-parity
  * regime); IDCG is emitted as one shared double literal. Both metrics
  * round at `digits` BEFORE any comparison, the recipe every oracle
  * query in this repo uses.
  */
object RankEval {

  /** Ideal DCG@k for binary relevance with ≥k relevant docs: the literal
    * both engines divide by. */
  def idcg(k: Int): Double =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum

  /** @param system ranked results (query_id, doc_id, rank), rank ∈ [1,k]
    * @param truth  relevant set (query_id, doc_id) — binary relevance
    * @param k      evaluation depth (IDCG assumes ≥k relevant per query,
    *               the exact-top-k-as-truth contract)
    * @return (query_id, rr, ndcg) — one row per query in `system` */
  def rankMetrics(system: DataFrame, truth: DataFrame, k: Int,
      digits: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    val rel = truth.select(col("query_id"), col("doc_id"))
      .withColumn("rel", lit(1))
    val labeled = system
      .select(col("query_id"), col("doc_id"), col("rank"))
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val log2rank = log(col("rank") + lit(1.0)) / log(lit(2.0))
    labeled.groupBy("query_id").agg(
      graft.Qutil.rnd(max(col("rel").cast("double") / col("rank")), digits)
        .as("rr"),
      graft.Qutil.rnd(
        sum(col("rel").cast("double") / log2rank) / lit(idcg(k)), digits)
        .as("ndcg"))
  }
}
