package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffle fact tables ONCE at write time so
  * every later equi-join / aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB this is the difference between re-exchanging a fact table on
  * every query and paying the exchange once at ingest: two tables bucketed
  * into the same number of buckets on their join key sort-merge-join with
  * ZERO Exchange nodes, and a groupBy on the bucket key skips its exchange
  * too. The bucket count is the write-time parallelism contract — size it
  * to the cluster (e.g. 2-4x total cores) and keep it identical across
  * tables that join.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free. */
  def cogroupJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
