package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.similarity

/** Late-interaction multi-vector retrieval (MaxSim): documents and
  * queries are BAGS of vectors (one per token/patch), and
  *
  *   score(q, d) = Σ_i  max_j  dot(q_i, d_j)
  *
  * — each query vector keeps its best-matching document vector, then the
  * per-query-vector maxima sum. The late-interaction scorer of
  * ColBERT-style retrieval, additive beyond the reference's single-vector
  * surface (its kernels are the pairwise similarities of
  * src/similarity.ts:2-24; this composes them over vector bags).
  *
  * Scale shape (the exploded layout IS the scalable one at corpus size):
  * document vectors live as (doc_id, dvec) rows; the query bag is small
  * and broadcast; scoring is two hash aggregations with map-side partial
  * combine (max per (query, doc, query-vector), then sum per (query,
  * doc)) and a top-k window — no corpus self-join, every kernel stays in
  * whole-stage codegen via the native dot-product expression.
  */
object MaxSim {

  /** Brute-force MaxSim top-k: `docVecs` exploded (idCol, vecCol) rows,
    * `queryVecs` exploded (queryId, vecNo, queryVec) rows (small —
    * broadcast). `scoreDigits >= 0` rounds final scores (fixed-point
    * floor form) before ranking so an oracle engine reproduces the
    * order. */
  def maxSimJoin(docVecs: DataFrame, queryVecs: DataFrame, k: Int,
      queryId: String = "query_id", queryVec: String = "query_vec",
      idCol: String = "doc_id", vecCol: String = "vec",
      scoreDigits: Int = -1): DataFrame = {
    require(k > 0)
    val pairScore = similarity.dot_product(col("dvec"), col("qvec"))
    val perQvec = docVecs
      .select(col(idCol).cast("long").as("doc_id"),
        col(vecCol).cast("array<float>").as("dvec"))
      .join(broadcast(queryVecs.select(
        col(queryId).cast("long").as("query_id"),
        col("vec_no").cast("int").as("vec_no"),
        col(queryVec).cast("array<float>").as("qvec"))))
      .groupBy(col("query_id"), col("doc_id"), col("vec_no"))
      .agg(max(pairScore).as("best"))
    val scored = perQvec
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("best")).as("raw"))
      .select(col("query_id"), col("doc_id"),
        (if (scoreDigits >= 0) graft.Qutil.rnd(col("raw"), scoreDigits)
         else col("raw")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
