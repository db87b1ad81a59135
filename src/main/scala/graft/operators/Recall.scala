package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@k of an approximate k-NN result against the exact oracle —
  * B6/B7 (reference src/bench/metrics.ts:26-75).
  *
  * Micro-averaged: Σhits / Σtotals pooled across queries, NOT
  * mean-of-per-query-recalls (they differ when k > index size —
  * src/bench/metrics.ts:70-75).
  */
object Recall {

  /** Per-query recall rows (B6): query_id, hits, total, recall. */
  def recallPerQuery(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = approx.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val totals = exact.groupBy("query_id").agg(count(lit(1)).as("total"))
    totals.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("total"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("total")).as("recall"))
  }

  /** Pooled micro-average (B7): one row (n_queries, hits, total, recall). */
  def microAvgRecall(approx: DataFrame, exact: DataFrame): DataFrame =
    recallPerQuery(approx, exact).agg(
      count(lit(1)).as("n_queries"),
      sum("hits").as("hits"),
      sum("total").as("total"),
      (sum("hits").cast("double") / sum("total")).as("recall"))
}
