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

  /** (doc_id, tgt, bs) — the doc's gram-bucket MULTISET as an in-row
    * array (one element per unigram/bigram occurrence). Keeping the
    * histogram in-row is what removes every doc-keyed shuffle from the
    * pipeline: the model side explodes it straight into a map-side-
    * combined B-row aggregation, and the score side never leaves the
    * row at all. */
  private def gramBucketArr(docs: DataFrame, isTarget: Column,
      buckets: Int): DataFrame = {
    val toks = mat(docs.select(col("doc_id"), col("text"),
        isTarget.as("tgt")),
      split(trim(col("text")), "\\s+"), "toks")
    val grams = mat(toks, expr(
        """concat(toks, CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(0, size(toks)-2),
          |                 i -> concat(toks[i], ' ', toks[i+1]))
          |  ELSE array() END)""".stripMargin), "grams")
    mat(grams, expr(
        s"""transform(grams, g ->
           |  pmod(cast(conv(substring(md5(g),1,15),16,10) as bigint),
           |       ${buckets}L))""".stripMargin), "bs")
      .select(col("doc_id"), col("tgt"), col("bs"))
  }

  /** Per-doc fixed-point importance weights: (doc_id, n_grams, dsir_w)
    * for EVERY doc in `docs` (docs whose text yields no grams get no
    * row — join back if zero-feature docs must appear). `isTarget`
    * marks the target-corpus rows inside `docs` (boolean column
    * expression over its columns).
    *
    * Train/score structure like every fitted pipeline here: the TRAIN
    * pass feeds both bucket LMs through one conditional B-row
    * aggregation (map-side combined — the only shuffle in the whole
    * operator, B rows per partition); λ then becomes a LITERAL map
    * (B entries, the trained-parameters-as-literals pattern the ANN
    * fits use), so the SCORE pass is a pure projection — an in-row
    * integer fold per doc, zero shuffle at any corpus size. Every
    * bucket observed in a doc is observed in the corpus, so the map
    * lookup never misses. */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    val g = gramBucketArr(docs, isTarget, buckets)
    val cnt = g.select(col("tgt"), explode(col("bs")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cq"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val tot = cnt.agg(sum("cq").as("tq"), sum("ct").as("tt"))
    val lamRows = cnt.crossJoin(broadcast(tot))
      .select(col("b"), floor(
        (log((col("ct") + 1.0) / (col("tt") + buckets.toDouble)) -
         log((col("cq") + 1.0) / (col("tq") + buckets.toDouble))) * 1e6 + 0.5)
        .cast("long").as("lam"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val lam = typedLit(lamRows.toMap)
    g.select(col("doc_id"),
        size(col("bs")).cast("long").as("n_grams"),
        aggregate(col("bs"), lit(0L),
          (acc, b) => acc + element_at(lam, b)).as("dsir_w"))
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
