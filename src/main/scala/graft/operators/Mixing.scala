package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget domain mixture selection — the production form of
  * "build a training mix": each domain contributes documents until its
  * TOKEN budget is exhausted, not until a sampling *rate* is met (the
  * rate form is `dataset_mix` in the battery; rates hit a target only
  * in expectation and drift with the corpus, budgets hit it exactly).
  *
  * Semantics (greedy prefix under a seeded uniform order):
  *
  *  1. each row draws a portable order key from the md5 hash of
  *     (salt, id) — a deterministic uniform shuffle within its domain;
  *  2. a grouped running token sum follows that order
  *     ([[GroupedPrefixSum]] — two-phase, never a
  *     single-partition-per-domain window);
  *  3. a document is selected iff its domain's budget was not already
  *     exhausted when the document starts, i.e.
  *     `cum_tokens - n_tokens < budget(domain)`.
  *
  * The selected token total per domain therefore lands in
  * [budget, budget + max_doc_tokens); a domain whose corpus is smaller
  * than its budget is kept whole. Selection is a pure function of
  * (salt, data): any engine, run, or cluster layout reproduces the
  * identical set, and a SQL oracle checks it with a plain cumulative
  * window — the battery's `mix_token_budget` entry hash-matches DuckDB
  * end to end.
  *
  * Scale shape: one range sort + two narrow passes over the corpus
  * (the prefix-sum kernel), driver state O(partitions × domains).
  * Budgets travel as a literal CASE column — no join, no broadcast.
  * Intended for LOW-CARDINALITY domain keys (sources, languages,
  * quality tiers), the shape training mixes actually have.
  */
object Mixing {

  /** Rows of `df` selected under per-domain token budgets.
    *
    * Output columns: `idCol`, `domainCol`, `tokensCol` (as long),
    * `cum_tokens` (running sum in selection order, selected rows only)
    * and `budget`. Domains absent from `budgets` are dropped entirely.
    *
    * `tokensCol` must be non-negative; ids must be unique per row (the
    * prefix-sum kernel enforces the total order and throws on
    * duplicates rather than produce layout-dependent sums).
    */
  def tokenBudget(df: DataFrame, domainCol: String, tokensCol: Column,
      budgets: Map[String, Long], idCol: String = "doc_id",
      salt: String = "mixbudget:"): DataFrame = {
    require(budgets.nonEmpty, "token-budget mix needs at least one domain")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    // negative token counts corrupt the greedy prefix silently (the
    // running sum DECREASES, re-admitting documents after exhaustion)
    // — e.g. size(split(null)) = -1 under Spark's legacy sizeOfNull —
    // and NULL counts would slip past a bare `tok < 0` (null comparison
    // is null, falling through to otherwise) only to NPE deep inside
    // the prefix-sum kernel. Same stance as the kernel's duplicate-key
    // guard: throw here with the real diagnostic, don't produce a
    // wrong mix or an opaque failure.
    val tok = tokensCol.cast("long")
    val keyed = df
      .filter(col(domainCol).isin(budgets.keys.toSeq: _*))
      .select(col(idCol), col(domainCol),
        when(tok.isNull || tok < 0, raise_error(concat(
            lit("tokenBudget: null or negative token count for id "),
            col(idCol).cast("string"))))
          .otherwise(tok).as("n_tokens"),
        graft.Qutil.md5Long60(concat(lit(salt), col(idCol))).as("mix_key"))
    val cum = GroupedPrefixSum.runningSum(keyed, "cum_tokens", "n_tokens",
      Seq(domainCol), Seq(col("mix_key"), col(idCol)),
      uniqueKeyCols = Seq(domainCol, "mix_key", idCol))
    // budgets as a literal CASE chain (sorted for a deterministic plan)
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) { case (acc, (d, b)) =>
        when(col(domainCol) === d, lit(b)).otherwise(acc)
      }
    cum.withColumn("budget", budgetCol)
      .filter(col("cum_tokens") - col("n_tokens") < col("budget"))
      .select(col(idCol), col(domainCol), col("n_tokens"),
        col("cum_tokens"), col("budget"))
  }

  /** Per-domain tokens drained by committed epochs, read from the
    * drain summaries under `path` (optionally only epochs strictly
    * before `beforeEpoch` — the replay-idempotence cut). Existence is
    * checked through the Hadoop FileSystem API rather than by matching
    * AnalysisException message text, which varies across Spark error
    * classes: a missing drain directory (no epoch committed yet) is a
    * normal state, everything else propagates. */
  private def drainedTokens(spark: org.apache.spark.sql.SparkSession,
      path: String, domainCol: String,
      beforeEpoch: Option[Long]): Map[String, Long] = {
    val drain = new org.apache.hadoop.fs.Path(s"$path/drain")
    val fs = drain.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(drain)) Map.empty
    else {
      val all = spark.read.parquet(drain.toString)
      beforeEpoch.fold(all)(b => all.filter(col("epoch") < b))
        .groupBy(domainCol).agg(sum("consumed_tokens").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
  }

  /** One micro-batch of the STREAMING mixture: mix `batch` under what
    * REMAINS of `budgets` after all committed epochs before `batchId`,
    * write the selection as `selected/epoch=batchId`, then a per-domain
    * token-sum summary as `drain/epoch=batchId` (both Overwrite — an
    * at-least-once replay of a batch recomputes the identical prior
    * state, because its own epochs are excluded from the consumed scan,
    * and overwrites itself; a crash between the two writes self-heals
    * on replay). The consumed scan reads ONLY the drain summaries —
    * O(epochs × domains) rows, never the selected data — so the
    * per-batch policy cost stays flat as the stream grows. The summary
    * is derived by re-reading the epoch just written, so it is exact
    * against the shipped rows by construction. Exposed for the replay
    * spec; production entry is [[streamingTokenBudget]]. */
  def mixBatch(batch: DataFrame, batchId: Long, path: String,
      domainCol: String, tokensCol: Column, budgets: Map[String, Long],
      idCol: String = "doc_id", salt: String = "mixbudget:"): Unit = {
    val spark = batch.sparkSession
    val consumed: Map[String, Long] =
      drainedTokens(spark, path, domainCol, Some(batchId))
    val remaining = budgets.map { case (d, b) =>
      d -> math.max(0L, b - consumed.getOrElse(d, 0L))
    }
    tokenBudget(batch, domainCol, tokensCol, remaining, idCol, salt)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/selected/epoch=$batchId")
    spark.read.parquet(s"$path/selected/epoch=$batchId")
      .groupBy(domainCol)
      .agg(sum("n_tokens").as("consumed_tokens"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/drain/epoch=$batchId")
  }

  /** STREAMING token-budget mixture — the budget DRAINS across
    * micro-batches: batch b is mixed under `budgets` minus the tokens
    * already selected by committed epochs, so the stream-long selection
    * per domain lands in [budget, budget + max_doc) exactly like the
    * batch form, and once a domain's budget is spent later batches
    * select nothing from it. Selection is prefix-greedy in ARRIVAL
    * order across batches and seeded-hash order within a batch —
    * epoch-per-batchId layout, replay-idempotent by
    * state-at-batch-entry (the store policy-loop contract;
    * `checkpoint` is REQUIRED for the idempotence to hold across
    * restarts). Read the running selection back with [[selected]];
    * [[describe]] reports per-domain drain. */
  def streamingTokenBudget(stream: DataFrame, path: String,
      checkpoint: String, domainCol: String, tokensCol: Column,
      budgets: Map[String, Long], idCol: String = "doc_id",
      salt: String = "mixbudget:")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mixBatch(batch, batchId, path, domainCol, tokensCol, budgets,
          idCol, salt)
      }
      .start()

  /** Every row selected so far across epochs (epoch column included).
    * Requires at least one committed epoch; use [[describe]] for a
    * monitoring call that is safe before the first commit. */
  def selected(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/selected")

  /** Per-domain drain state of a streaming mix: (domain, budget,
    * consumed, remaining, exhausted). A domain is `exhausted` once its
    * next document cannot start inside the budget (consumed >= budget —
    * the batch form's selection rule with zero remaining). Reads the
    * per-epoch drain summaries, not the selected data. */
  def describe(spark: org.apache.spark.sql.SparkSession, path: String,
      budgets: Map[String, Long], domainCol: String = "source"): DataFrame = {
    import spark.implicits._
    // before the first epoch commits there is nothing drained yet —
    // report full budgets rather than throw (the monitoring call runs
    // concurrently with the stream)
    val consumed: Map[String, Long] =
      drainedTokens(spark, path, domainCol, None)
    budgets.toSeq.sortBy(_._1).map { case (d, b) =>
      val c = consumed.getOrElse(d, 0L)
      (d, b, c, math.max(0L, b - c), c >= b)
    }.toDF("domain", "budget", "consumed", "remaining", "exhausted")
  }
}
