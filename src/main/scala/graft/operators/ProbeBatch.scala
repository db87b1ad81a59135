package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared probe-set batching for the collect-and-broadcast ANN paths.
  *
  * Every distributed ANN query here ships the (small) probe set through
  * the driver as a broadcast — the scan/graph side never shuffles. That
  * contract caps driver heap at the probe-set size, so a LARGE probe set
  * needs hash-batching: split the queries into ceil(n/batchRows) hash
  * groups, run the underlying join per group, union the results.
  * Results are identical to the unbatched run (per-query top-k is
  * independent across queries; the spec asserts set equality on every
  * path).
  *
  * One helper so Hnsw / IvfHnsw / Pq / Opq / Sq / IvfPq / IvfFlat batch
  * identically instead of five hand-rolled copies.
  */
object ProbeBatch {

  /** Run `join` over `queries` in hash batches of ≤ ~batchRows rows.
    * `queryId` must be a stable key column (batching hashes it). */
  def batched(queries: DataFrame, batchRows: Int, queryId: String)(
      join: DataFrame => DataFrame): DataFrame = {
    require(batchRows > 0, "batchRows must be positive")
    val n = queries.count()
    val numBatches = math.max(1, math.ceil(n.toDouble / batchRows).toInt)
    if (numBatches == 1) join(queries)
    else (0 until numBatches).map { b =>
      join(queries.filter(pmod(xxhash64(col(queryId)), lit(numBatches)) === b))
    }.reduce(_ unionByName _)
  }
}
