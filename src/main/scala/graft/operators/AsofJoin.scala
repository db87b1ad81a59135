package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN — the time-series join Spark lacks as a built-in (and the
  * classic example of an operator worth composing rather than
  * hand-scheduling): for each left row, the single right row with the
  * LARGEST right timestamp at-or-before the left timestamp, per key.
  *
  * The scalable formulation is NOT a range join (quadratic row
  * explosion between dense keys) but the union-tag trick: tag both
  * sides, sort each key's rows by (ts, tag) with right rows first at
  * equal timestamps, and carry the last-seen right payload forward with
  * one running window — ONE hash shuffle on the key plus a per-key
  * sort, O(n log n), no candidate blowup at any density. Catalyst plans
  * the whole thing as Exchange + Sort + Window (no join operator at
  * all).
  *
  * The right payload travels as a single STRUCT so all its fields come
  * from the SAME right row even when some field values are null
  * (per-column last(ignoreNulls) would mix rows).
  *
  * Tie semantics: right rows sort BEFORE left rows at equal timestamps,
  * so a right row AT the left timestamp matches — the `>=` semantics of
  * DuckDB's native ASOF JOIN (the cross-engine oracle). Rows with equal
  * (key, ts) on the RIGHT side are ambiguous under as-of semantics in
  * any engine — deduplicate them upstream for determinism.
  */
object AsofJoin {

  /** Backward (at-or-before) LEFT as-of join.
    *
    * @param left     probe side; all its columns survive
    * @param right    reference side
    * @param keyCols  equi-key columns present on both sides
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name
    * @param payload  right columns to attach (each appears as
    *                 `prefix + name`, null when no right row precedes)
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "r_"): DataFrame = {
    require(keyCols.nonEmpty && payload.nonEmpty)
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("_asof_ts") && !leftCols.contains("_asof_tag"),
      "left side already has _asof_* columns")
    // a NULL right timestamp would sort NULLS FIRST under the ascending
    // window order and be carried forward as a spurious "earliest" match;
    // DuckDB's native ASOF JOIN (the oracle semantics) never matches
    // NULL-timestamp rows — drop them
    val rightNN = right.filter(col(rightTs).isNotNull)
    val r2 = rightNN.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("_asof_ts"), lit(0).as("_asof_tag"),
        struct(payload.map(col): _*).as("_asof_pay")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l2 = left.select(
      leftCols.map(col) ++ Seq(
        col(leftTs).as("_asof_ts"), lit(1).as("_asof_tag"),
        lit(null).cast(r2.schema("_asof_pay").dataType).as("_asof_pay")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_ts").asc, col("_asof_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = r2.unionByName(l2)
      .withColumn("_asof_last", last(col("_asof_pay"), ignoreNulls = true).over(w))
      .filter(col("_asof_tag") === 1)
    payload.foldLeft(joined) { (df, p) =>
        df.withColumn(prefix + p, col(s"_asof_last.$p"))
      }
      .drop("_asof_ts", "_asof_tag", "_asof_pay", "_asof_last")
  }
}
