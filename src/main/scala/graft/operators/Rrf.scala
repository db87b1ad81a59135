package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of two ranked retrieval lists — the standard
  * hybrid lexical+vector composition (Cormack/Clarke/Buettcher, SIGIR'09:
  * score(d) = Σ_lists 1/(c + rank_list(d)), c=60). Every retrieval-quality
  * pipeline that mixes BM25-ish lexical ranking with embedding ANN fuses
  * this way; the reference engine emits ranked top-k lists
  * (src/bench/metrics.ts:9-24) that are exactly this operator's input.
  *
  * Spark shape: both inputs are bounded top-k-per-query lists (|Q|·k rows),
  * so the full-outer join on (query_id, doc_id) shuffles only ranked heads,
  * never a corpus — at 100 TB the expensive part is producing the lists
  * (inverted-index join / ANN probe), and fusion stays O(|Q|·k) regardless
  * of corpus size. One exchange on the compound key, one per-query window.
  *
  * Determinism/oracle contract: the two reciprocal terms are summed in a
  * fixed written order (lexical then vector — two IEEE-754 ops, identical
  * across engines), rounded to `scoreDigits` BEFORE ranking, ties broken on
  * ascending doc id — the same recipe the exact-kNN oracle uses.
  */
object Rrf {

  /** @param lexical DataFrame(query_id, doc_id, rank) — ranked lexical list
    * @param vector  DataFrame(query_id, doc_id, rank) — ranked vector list
    * @param k       fused results per query
    * @param c       RRF damping constant (60 per the original paper)
    * @return (query_id, doc_id, lrank, vrank, rrf_score, rank); lrank/vrank
    *         NULL where the doc appeared in only one list
    */
  def fuse(
      lexical: DataFrame,
      vector: DataFrame,
      k: Int,
      c: Int = 60,
      scoreDigits: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    require(c >= 0, "c must be non-negative")
    val l = lexical.select(col("query_id"), col("doc_id"), col("rank").as("lrank"))
    val v = vector.select(col("query_id"), col("doc_id"), col("rank").as("vrank"))
    // Seq-keyed full outer join coalesces the keys — a doc found by only
    // one retriever still carries its (query_id, doc_id).
    val joined = l.join(v, Seq("query_id", "doc_id"), "full_outer")
    val score =
      coalesce(lit(1.0) / (lit(c) + col("lrank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(c) + col("vrank")), lit(0.0))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    joined
      .withColumn("rrf_score", graft.Qutil.rnd(score, scoreDigits))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "lrank", "vrank", "rrf_score", "rank")
  }
}
