package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted inverted index for lexical (BM25) retrieval — the serving
  * counterpart of the from-scratch `bm25_top_docs` pipeline, which
  * re-tokenizes the corpus per query. At 100 TB you tokenize ONCE:
  *
  *  - `build` writes a single posting table (term, doc_id, tf, dl)
  *    BUCKETED AND SORTED BY term, plus a 1-row corpus stats table
  *    (N, avgdl). The build plan is LINEAR — scan → explode → tf
  *    aggregation → per-doc window for dl → bucketed write: one
  *    tokenization pass, zero joins, no vocabulary-sized shuffle or
  *    broadcast (plan-asserted in PlanSpec). Doc length is denormalized
  *    into the posting row; document frequency deliberately is NOT —
  *    see `bm25TopDocs`.
  *  - `bm25TopDocs` serves queries from the persisted table alone: the
  *    bounded query-term set pushes into the scan as an `IN` filter on
  *    the bucket column, so Spark prunes whole buckets for narrow
  *    queries (`SelectedBucketsCount` in the scan) and parquet row-group
  *    stats on the sorted term column prune within buckets for broad
  *    ones. df per query term is a count over that already-pruned scan
  *    (each term's postings are read in full by construction), so it
  *    costs a probe-bounded aggregation at serve time instead of a
  *    corpus-wide join at build time. One map-side-combined agg per
  *    (qid, doc) and a top-k window after — the same shape as the
  *    transient pipeline, minus the corpus-wide aggregations.
  *
  * Score arithmetic is written EXACTLY as `TextQueries.bm25Ranked` (same
  * operation order, 4-dp round-before-rank), and N/avgdl/df derive from
  * exact integer counts — so index-served results hash-match the same
  * DuckDB oracle as the from-scratch path, which is what the
  * `bm25_indexed` battery entry checks.
  */
object TextIndex {

  /** Corpus constants captured at build time. */
  case class Stats(n: Long, avgdl: Double)

  private def statsTable(prefix: String) = s"${prefix}_stats"
  private def postingsTable(prefix: String) = s"${prefix}_postings"

  /** Drop `table` from the catalog AND delete its default warehouse
    * location — a stale directory from a prior session (not in this
    * session's catalog) makes `saveAsTable` fail with
    * LOCATION_ALREADY_EXISTS even in Overwrite mode. */
  private def clearTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    ()
  }

  /** The posting rows (term, doc_id, tf, dl) as one LINEAR plan: the
    * corpus is scanned and exploded exactly once, dl = sum(tf) per doc
    * (the identical integer the transient path counts from the raw
    * token stream) rides a doc-partitioned window — partitions bounded
    * by document length, so no skew hazard — and nothing joins. */
  private[graft] def postingsFor(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    tf.withColumn("dl", sum("tf").over(Window.partitionBy("doc_id")))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
  }

  /** Tokenize `docs` (doc_id, text) and persist the posting + stats
    * tables under `prefix` (overwrites). Returns the corpus stats. */
  def build(docs: DataFrame, prefix: String, numBuckets: Int = 32): Stats = {
    val spark = docs.sparkSession
    clearTable(spark, postingsTable(prefix))
    clearTable(spark, statsTable(prefix))
    postingsFor(docs).write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, "term").sortBy("term")
      .format("parquet").saveAsTable(postingsTable(prefix))
    // n must count ALL docs (a null-text doc never reaches the token
    // stream but still counts toward N, matching the transient path);
    // avgdl derives from the index itself — the write above was the one
    // and only tokenization pass.
    val n = docs.count()
    val avgdl = spark.table(postingsTable(prefix))
      .select(col("doc_id"), col("dl")).distinct()
      .agg(avg("dl")).first().getDouble(0)
    import spark.implicits._
    Seq((n, avgdl)).toDF("n", "avgdl").write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(statsTable(prefix))
    Stats(n, avgdl)
  }

  /** Load the build-time stats for a persisted index. */
  def stats(spark: SparkSession, prefix: String): Stats = {
    val r = spark.table(statsTable(prefix)).first()
    Stats(r.getAs[Long]("n"), r.getAs[Double]("avgdl"))
  }

  /** Okapi BM25 top-`topk` docs per query, served from the persisted
    * index. `queryTerms` (qid, term) must be bounded (the probe
    * contract): its distinct terms become the scan's bucket/row-group
    * pruning filter and the probe side broadcasts. df per term counts
    * the pruned scan's rows (complete per term by construction) and
    * broadcast-joins back — a #query-terms-sized table.
    *
    * Identical score arithmetic + round-before-rank as
    * `TextQueries.bm25Ranked` — results hash-match the same oracle. */
  def bm25TopDocs(spark: SparkSession, prefix: String,
      queryTerms: DataFrame, topk: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(topk > 0, "topk must be positive")
    val st = stats(spark, prefix)
    val qt = queryTerms.select(col("qid"), col("term")).distinct()
    val terms: Array[String] = qt.select("term").distinct()
      .collect().map(_.getString(0))
    val postings = spark.table(postingsTable(prefix))
      .filter(col("term").isin(terms.toSeq: _*))
    val dfT = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val score = log(lit(1.0) +
        (lit(st.n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) *
      col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / st.avgdl))
    val scored = broadcast(qt).join(postings, Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .groupBy("qid", "doc_id")
      .agg(graft.Qutil.rnd(sum(score), 4).as("bm25"))
    val w = Window.partitionBy("qid")
      .orderBy(col("bm25").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topk)
      .select("qid", "rnk", "doc_id", "bm25")
  }

  /** Drop the persisted tables (store CRUD contract). */
  def drop(spark: SparkSession, prefix: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${postingsTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(prefix)}")
    ()
  }
}
