package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the skewed (big) side into
  * `buckets` sub-keys and replicate the other side once per salt, so a hot
  * key's rows spread over `buckets` tasks instead of one straggler.
  *
  * AQE's skew-join split handles sort-merge joins it can observe at
  * runtime; explicit salting remains the tool for hash-partitioned
  * aggregations/joins AQE can't split (and for deterministic layouts). The
  * salt is a pure function of the row (hash of all columns), so results
  * are reproducible — no rand().
  */
object Skew {

  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(buckets)).cast("int")

  /** Inner equi-join `big ⋈ small` on `key`, spreading each big-side key
    * over `buckets` partitions. `small` is replicated `buckets` times
    * (keep it the dimension side). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    val b = big.withColumn("__salt", rowSalt(big, buckets))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe aggregation: count/sum-style per-key aggregates computed as
    * partial per (key, salt) then merged per key — two small shuffles
    * instead of one hot-key shuffle. Aggregates must be algebraic
    * (re-aggregable): pass the partial exprs and the merge exprs. */
  def twoPhaseAgg(df: DataFrame, key: String, buckets: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", rowSalt(df, buckets))
      .groupBy(col(key), col("__salt")).agg(partial.head, partial.tail: _*)
      .groupBy(col(key)).agg(merge.head, merge.tail: _*)
}
