package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much it looks like a TARGET corpus
  * under hashed n-gram bag-of-words language models, then keep the
  * top-weighted docs. The published recipe, re-expressed Spark-first:
  *
  *  1. Features: word unigrams + bigrams, hashed into `buckets` counts
  *     (the paper's hashed n-gram generative model). The hash is the
  *     battery's portable md5-derived 60-bit integer (same value in any
  *     engine), so the whole pipeline is cross-engine oracle-checkable.
  *  2. Bucket unigram models with add-one smoothing: p̂[b] over the
  *     target docs, q̂[b] over the raw corpus;
  *     λ[b] = ln p̂[b] − ln q̂[b], stored FIXED-POINT (⌊λ·10⁶+0.5⌋ as a
  *     64-bit int) — the only float step in the pipeline, rounded at a
  *     grain 10 orders above double noise.
  *  3. Per-doc importance weight = Σ_b count_doc[b]·λ_fixed[b] — an
  *     EXACT integer sum, so it is addition-order-independent: the same
  *     number on any partitioning, any engine (the same trick the
  *     n-gram dedup pipeline uses).
  *  4. Selection: top-`n` docs by (weight desc, doc_id) — deterministic
  *     rank instead of the paper's Gumbel resampling, which a seeded
  *     hash could add but the battery keeps reproducible.
  *
  * Shape at 100 TB: one tokenize pass (explode of an in-row gram
  * array), two hash aggregations into a `buckets`-sized model table
  * (broadcastable by construction — B is a constant, default 1024),
  * one broadcast join back, one integer aggregation, and a distributed
  * top-n (TakeOrderedAndProject, no single-partition window). The
  * model-estimation side is O(corpus) with map-side combine; nothing
  * shuffles more than (doc_id, bucket) partial counts.
  */
object Dsir {

  /** Portable md5-derived 60-bit hash (same form as the text battery). */
  private def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Materialization barrier (see TextQueries.mat): keeps CollapseProject
    * from inlining the token-array split into every transform-lambda
    * element, which would re-run the split per token. */
  private def mat(df: DataFrame, c: Column, name: String): DataFrame =
    df.withColumn(name, explode(array(c)))

  /** (doc_id, b) one row per unigram+bigram occurrence, b in [0, buckets). */
  private def gramBuckets(docs: DataFrame, buckets: Int): DataFrame = {
    val toks = mat(docs.select(col("doc_id"), col("text")),
      split(trim(col("text")), "\\s+"), "toks")
    val grams = mat(toks, expr(
        """concat(toks, CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(0, size(toks)-2),
          |                 i -> concat(toks[i], ' ', toks[i+1]))
          |  ELSE array() END)""".stripMargin), "grams")
      .select(col("doc_id"), explode(col("grams")).as("g"))
    grams.select(col("doc_id"), pmod(md5Long(col("g")), lit(buckets)).as("b"))
  }

  /** Per-doc fixed-point importance weights: (doc_id, n_grams, dsir_w)
    * for EVERY doc in `docs` (docs whose text yields no grams get no
    * row — join back if zero-feature docs must appear). `isTarget`
    * marks the target-corpus rows inside `docs` (boolean column
    * expression over its columns). */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    val db = gramBuckets(docs, buckets)
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    val targetIds = docs.filter(isTarget).select("doc_id")
    // raw model over everything, target model over the target subset —
    // both are B-row tables; totals ride along via 1-row cross joins
    val qcnt = db.groupBy("b").agg(sum("c").as("cq"))
    val tcnt = db.join(broadcast(targetIds), Seq("doc_id"))
      .groupBy("b").agg(sum("c").as("ct"))
    val tq = qcnt.agg(sum("cq").as("tq"))
    val tt = tcnt.agg(coalesce(sum("ct"), lit(0L)).as("tt"))
    val lam = qcnt.join(tcnt, Seq("b"), "left")
      .crossJoin(broadcast(tq)).crossJoin(broadcast(tt))
      .select(col("b"), floor(
        (log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("tt") + buckets.toDouble)) -
         log((col("cq") + 1.0) / (col("tq") + buckets.toDouble))) * 1e6 + 0.5)
        .cast("long").as("lam"))
    db.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"), sum(col("c") * col("lam")).as("dsir_w"))
  }

  /** Top-`n` raw docs by target-likeness: (rnk, doc_id, n_grams,
    * dsir_w), rank by (dsir_w desc, doc_id asc). The top-n is a
    * distributed TakeOrderedAndProject; the rank is assigned over the
    * already-bounded n rows. */
  def select(docs: DataFrame, isTarget: Column, n: Int,
      buckets: Int = 1024): DataFrame = {
    require(n > 0, "n must be positive")
    val top = importanceWeights(docs, isTarget, buckets)
      .orderBy(col("dsir_w").desc, col("doc_id").asc).limit(n)
    val w = Window.orderBy(col("dsir_w").desc, col("doc_id").asc)
    top.withColumn("rnk", row_number().over(w))
      .select("rnk", "doc_id", "n_grams", "dsir_w")
  }
}
