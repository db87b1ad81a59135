package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling WITHOUT replacement
  * (Efraimidis–Spirakis A-Res): each row draws a seeded uniform
  * u ∈ (0,1) from the portable md5 hash of its id and ranks by
  * key = ln(u)/w — the top-n rows by key are a weight-proportional
  * sample without replacement. Properties the spec pins:
  *
  *  - reproducible: u is a pure projection of (salt, id) — the same
  *    sample on any engine, partitioning, or run;
  *  - scale-invariant: rescaling every weight by a constant multiplies
  *    every key by the same factor, so the selected SET is unchanged;
  *  - one-pass distributed: key is a projection, top-n is
  *    TakeOrderedAndProject — no corpus shuffle, no driver loop.
  *
  * The battery's `sample_weighted` entry oracle-checks the whole
  * pipeline (hash, log arithmetic at fixed point, rank) cross-engine.
  */
object Sampling {

  /** Top-`n` rows of `df` by the A-Res key; rows with weight ≤ 0 are
    * excluded (they can never be sampled). Returns (rnk, idCol, weight,
    * skey) ranked by (skey desc, id asc); `weight` keeps `weightCol`'s
    * own type, and skey is fixed-point-rounded (1e-12) so ranking is
    * engine-stable. */
  def weightedTopN(df: DataFrame, weightCol: Column, n: Int,
      idCol: String = "doc_id", salt: String = "wsample:"): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (graft.Qutil.md5Long60(concat(lit(salt), col(idCol)))
      .cast("double") + 0.5) /
      1.152921504606846976e18
    val keyed = df.filter(weightCol > 0)
      .select(col(idCol), weightCol.as("weight"),
        graft.Qutil.rnd(log(u) / weightCol.cast("double"), 12).as("skey"))
    val top = keyed.orderBy(col("skey").desc, col(idCol).asc).limit(n)
    val w = Window.orderBy(col("skey").desc, col(idCol).asc)
    top.withColumn("rnk", row_number().over(w))
      .select(col("rnk"), col(idCol), col("weight"), col("skey"))
  }
}
