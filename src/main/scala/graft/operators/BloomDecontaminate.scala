package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFilters

/** Bloom-prefiltered eval-set decontamination — the giant-eval scale path
  * of the plain `decontaminate` operator.
  *
  * The plain operator broadcasts eval's distinct shingle STRINGS, which is
  * fine while the eval set is benchmark-sized. Once eval grows to hundreds
  * of millions of shingles the strings stop broadcasting, but a Bloom
  * filter over their hashes still does (~1.2 bytes/item at 1% fpp ≈
  * 120 MB for 100M shingles vs tens of GB of strings). Phase 1 probes the
  * bloom MAP-SIDE with a codegen'd expression
  * ([[graft.functions.BloomMightContainExpr]], no UDF, no shuffle) and
  * discards all but ~fpp of the non-matching corpus rows; phase 2 exactly
  * confirms the survivors with a string equi-join against eval, so bloom
  * false positives and xxhash64 collisions cannot leak into the result.
  * Output is therefore EXACTLY the plain join's — the bloom only bounds
  * how many rows reach the shuffle.
  */
object BloomDecontaminate {

  /** Docs with ≥1 exact eval-shingle hit → (doc_id, n_matched).
    *
    * @param trainShingles exploded (doc_id, shingle) rows of the corpus
    * @param evalShingles  (shingle) rows of the held-out eval set
    * @param expectedEvalItems sizing hint for the bloom bit array
    * @param fpp bloom false-positive rate — tunes prefilter selectivity,
    *            NEVER correctness (phase 2 removes every false positive)
    */
  def contaminatedDocs(trainShingles: DataFrame, evalShingles: DataFrame,
      expectedEvalItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedEvalItems > 0 && fpp > 0 && fpp < 1)
    val evalDistinct = evalShingles.select("shingle").distinct()
    val bloom = evalDistinct.select(xxhash64(col("shingle")).as("sh"))
      .stat.bloomFilter("sh", expectedEvalItems, fpp)
    val survivors = trainShingles.where(
      BloomFilters.bloom_might_contain(xxhash64(col("shingle")), bloom))
    survivors.join(evalDistinct, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
  }
}
