package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted inverted index for lexical (BM25) retrieval — the serving
  * counterpart of the from-scratch `bm25_top_docs` pipeline, which
  * re-tokenizes the corpus per query. At 100 TB you tokenize ONCE:
  *
  *  - `build` writes a posting table (term, doc_id, tf, dl) BUCKETED AND
  *    SORTED BY term, a LEXICON table (term, df — the classic dictionary
  *    file, vocabulary-sized, same bucketing), and a 1-row corpus stats
  *    table (N, avgdl). The posting write is a LINEAR plan — scan →
  *    explode → tf aggregation → per-doc window for dl → bucketed write:
  *    one tokenization pass, zero joins (plan-asserted in PlanSpec); the
  *    lexicon and avgdl then derive from the WRITTEN postings (one
  *    aggregation each — index-derived, never a second tokenize).
  *  - `bm25TopDocs` serves queries from the persisted tables alone: the
  *    bounded query-term set reads its df rows from the bucket-pruned
  *    lexicon first (a vocabulary-keyed point lookup), then becomes the
  *    posting scan's `IN` filter — whole buckets prune for narrow
  *    queries (`SelectedBucketsCount`) and parquet row-group stats on
  *    the sorted term column prune within buckets. One
  *    map-side-combined agg per (qid, doc) and a top-k window after —
  *    the same shape as the transient pipeline, minus the corpus-wide
  *    aggregations.
  *  - STOPWORD-CLASS pruning (`maxDfFrac`): a Zipf head term's posting
  *    list is O(corpus) to read yet contributes ~zero BM25 mass
  *    (df ≈ N ⇒ idf ≈ 0) — measured at 1M docs, head terms made serve
  *    wall ~O(corpus) (BASELINE.md). Because df now lives in the
  *    lexicon, terms with df > maxDfFrac·N are dropped BEFORE the
  *    posting scan, so their lists are never read. Default 1.0 keeps
  *    every term — bit-identical to the transient pipeline.
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
  private def lexiconTable(prefix: String) = s"${prefix}_lexicon"

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

  /** Tokenize `docs` (doc_id, text) and persist the posting + lexicon +
    * stats tables under `prefix` (overwrites). Returns the corpus
    * stats. */
  def build(docs: DataFrame, prefix: String, numBuckets: Int = 32): Stats = {
    val spark = docs.sparkSession
    clearTable(spark, postingsTable(prefix))
    clearTable(spark, lexiconTable(prefix))
    clearTable(spark, statsTable(prefix))
    postingsFor(docs).write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, "term").sortBy("term")
      .format("parquet").saveAsTable(postingsTable(prefix))
    // the lexicon (term, df) aggregates the WRITTEN postings — one
    // vocabulary-sized pass over the index, never a second tokenize.
    // Same bucketing as the postings so query-term lookups bucket-prune.
    spark.table(postingsTable(prefix))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, "term").sortBy("term")
      .format("parquet").saveAsTable(lexiconTable(prefix))
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
    * contract): its distinct terms first look up their df in the
    * bucket-pruned lexicon (a vocabulary-keyed point read), then the
    * SURVIVORS of the `maxDfFrac` cut become the posting scan's
    * bucket/row-group pruning filter — a stopword-class term's
    * O(corpus) posting list is never read. The probe side and the
    * #query-terms df table broadcast.
    *
    * `maxDfFrac = 1.0` (default) keeps every term: identical score
    * arithmetic + round-before-rank as `TextQueries.bm25Ranked`, so
    * results hash-match the same oracle. With `maxDfFrac < 1`, terms
    * with df > maxDfFrac·N contribute nothing (their ~zero idf mass is
    * dropped with them); a query whose every term is cut returns no
    * rows. Indexes persisted before the lexicon existed fall back to
    * counting df from the pruned posting scan (correct, but the cut
    * then can't skip the read). */
  def bm25TopDocs(spark: SparkSession, prefix: String,
      queryTerms: DataFrame, topk: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxDfFrac: Double = 1.0): DataFrame = {
    require(topk > 0, "topk must be positive")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0, "maxDfFrac in (0, 1]")
    val st = stats(spark, prefix)
    val qt = queryTerms.select(col("qid"), col("term")).distinct()
    val allTerms: Array[String] = qt.select("term").distinct()
      .collect().map(_.getString(0))
    import spark.implicits._
    val (terms, dfT) =
      if (spark.catalog.tableExists(lexiconTable(prefix))) {
        val dfPairs = spark.table(lexiconTable(prefix))
          .filter(col("term").isin(allTerms.toSeq: _*))
          .filter(col("df") <= lit(maxDfFrac) * lit(st.n.toDouble))
          .select("term", "df").as[(String, Long)].collect()
        (dfPairs.map(_._1), broadcast(dfPairs.toSeq.toDF("term", "df")))
      } else {
        val pruned = spark.table(postingsTable(prefix))
          .filter(col("term").isin(allTerms.toSeq: _*))
        val counted = pruned.groupBy("term").agg(count(lit(1)).as("df"))
          .filter(col("df") <= lit(maxDfFrac) * lit(st.n.toDouble))
        (allTerms, broadcast(counted))
      }
    if (terms.isEmpty)
      return Seq.empty[(Long, Int, Long, Double)]
        .toDF("qid", "rnk", "doc_id", "bm25")
    val postings = spark.table(postingsTable(prefix))
      .filter(col("term").isin(terms.toSeq: _*))
    val score = log(lit(1.0) +
        (lit(st.n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) *
      col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / st.avgdl))
    val scored = broadcast(qt).join(postings, Seq("term"))
      .join(dfT, Seq("term"))
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
    spark.sql(s"DROP TABLE IF EXISTS ${lexiconTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(prefix)}")
    ()
  }
}
