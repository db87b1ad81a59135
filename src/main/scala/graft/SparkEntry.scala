package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.KnnJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 expressed as a
  * DataFrame job over the driver-provisioned parquet tables; [[oracleSql]]
  * holds the DuckDB-equivalent SQL for the hash-match correctness gate.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact top-10 cosine neighbors of the first 5 embedding vectors. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val base = t(spark, dir, "embeddings")
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    KnnJoin.exactKnnJoin(base, queries, k = 10, metric = "cosine")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VectorQueries.queries ++ TextQueries.queries ++
      AdvancedQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ VectorQueries.oracle ++ TextQueries.oracle ++
      AdvancedQueries.oracle
}
