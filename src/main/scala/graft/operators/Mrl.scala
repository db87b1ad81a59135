package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.similarity

/** Matryoshka-style truncated-dimension retrieval: rank candidates by
  * cosine over only the first `prefixDims` components, then rerank the
  * bounded candidate set with the full vector (MRL embeddings are trained
  * so that dimension prefixes are themselves valid embeddings; serving
  * stacks exploit that by scanning a d/p-times-smaller prefix — additive
  * beyond the reference's whole-vector surface).
  *
  * Scale shape: the candidate stage streams the corpus once against a
  * broadcast probe set touching only `prefixDims/d` of the vector bytes
  * (with a column layout that stores the prefix separately, that is the
  * only data read); the rerank stage reads full vectors for `rerank` rows
  * per query only. Both stages are declarative (slice + codegen cosine +
  * top-k window) — no shuffle of the base data anywhere.
  *
  * Candidate order is (1e-6-rounded truncated cosine, cand_id) and the
  * rerank reuses the battery's rounded-cosine contract, so the WHOLE
  * pipeline is cross-engine oracle-checkable like [[Sq]]/[[Bq]].
  */
object Mrl {

  /** Truncated-prefix candidate generation + exact full-dim top-k rerank.
    * `candDigits` rounds the truncated score before the candidate cut
    * (fixed-point floor form; keep ≥ 0 for cross-engine determinism). */
  def knnJoinTruncated(base: DataFrame, queries: DataFrame, k: Int,
      prefixDims: Int, rerank: Int = 100,
      queryId: String = "query_id", queryVec: String = "query_vec",
      idCol: String = "vec_id", vecCol: String = "embedding",
      scoreDigits: Int = -1, candDigits: Int = 6): DataFrame = {
    require(k > 0 && rerank >= k && prefixDims > 0)
    val tRaw = similarity.cosine_sim(
      slice(col(vecCol), 1, prefixDims), slice(col("qvec"), 1, prefixDims))
    val tCol = if (candDigits >= 0) graft.Qutil.rnd(tRaw, candDigits) else tRaw
    val scored = base
      .join(broadcast(queries.select(col(queryId).cast("long").as("query_id"),
        col(queryVec).cast("array<float>").as("qvec"))))
      .select(col("query_id"), col(idCol).cast("long").as("cand_id"),
        tCol.as("tscore"))
    KnnJoin.cosineCandidateRerank(scored, base, queries, k, rerank,
      queryId, queryVec, idCol, vecCol, scoreDigits)
  }

  /** Write the MRL serving layout: the `prefixDims`-dim prefix as its
    * OWN parquet column beside the full vector, so the candidate stage
    * reads p/d of the vector bytes via plain column pruning (the
    * `ReadSchema` shows only (id, prefix); nothing custom needed — this
    * is exactly what Parquet columnar storage is for). */
  def writePrefixLayout(base: DataFrame, path: String, prefixDims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(prefixDims > 0)
    base.select(col(idCol).cast("long").as("vec_id"),
        slice(col(vecCol), 1, prefixDims).as("prefix"),
        col(vecCol).cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(path)
  }

  /** [[knnJoinTruncated]] against a [[writePrefixLayout]] table: stage 1
    * scans ONLY (vec_id, prefix); stage 2 reads full vectors for the
    * bounded candidate set. Results are identical to slicing the full
    * column in-flight (spec-pinned) — the layout changes bytes read, not
    * semantics. */
  def knnJoinPrefixLayout(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int, rerank: Int = 100,
      queryId: String = "query_id", queryVec: String = "query_vec",
      scoreDigits: Int = -1, candDigits: Int = 6): DataFrame = {
    val layout = spark.read.parquet(path)
    val prefixDims = layout.select(size(col("prefix"))).first().getInt(0)
    require(k > 0 && rerank >= k)
    val tRaw = similarity.cosine_sim(
      col("prefix"), slice(col("qvec"), 1, prefixDims))
    val tCol = if (candDigits >= 0) graft.Qutil.rnd(tRaw, candDigits) else tRaw
    val scored = layout.select("vec_id", "prefix")
      .join(broadcast(queries.select(col(queryId).cast("long").as("query_id"),
        col(queryVec).cast("array<float>").as("qvec"))))
      .select(col("query_id"), col("vec_id").as("cand_id"), tCol.as("tscore"))
    KnnJoin.cosineCandidateRerank(scored, layout, queries, k, rerank,
      queryId, queryVec, "vec_id", "embedding", scoreDigits)
  }

  /** DuckDB twin of [[knnJoinTruncated]] over the battery probe set:
    * same prefix slice, same rounded candidate order, same rounded
    * full-dim rerank, ending in CTE `mrl_topk`. */
  def duckdbTopkCte(prefixDims: Int, nQueries: Int = 100, rerank: Int = 100,
      k: Int = 10): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       |           FROM embeddings WHERE vec_id < $nQueries),
       | tr AS (SELECT q.query_id, e.vec_id AS cand_id,
       |    floor((list_cosine_similarity(CAST(e.embedding[1:$prefixDims] AS DOUBLE[]),
       |      CAST(q.qv[1:$prefixDims] AS DOUBLE[])))*1e6 + 0.5)/1e6 AS tscore
       |   FROM embeddings e, q),
       | cand AS (SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY tscore DESC, cand_id) AS cr FROM tr) WHERE cr <= $rerank),
       | rer AS (SELECT c.query_id, c.cand_id AS neighbor_id,
       |    floor((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |      CAST(q.qv AS DOUBLE[])))*1e6 + 0.5)/1e6 AS score
       |   FROM cand c JOIN embeddings e ON e.vec_id = c.cand_id
       |    JOIN q ON q.query_id = c.query_id),
       | mrl_topk AS (SELECT query_id, neighbor_id, score, rank FROM (
       |   SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY score DESC, neighbor_id) AS rank FROM rer)
       |  WHERE rank <= $k)""".stripMargin
}
