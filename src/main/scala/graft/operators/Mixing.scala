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
    val keyed = df
      .filter(col(domainCol).isin(budgets.keys.toSeq: _*))
      .select(col(idCol), col(domainCol),
        tokensCol.cast("long").as("n_tokens"),
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
}
