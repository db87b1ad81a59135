package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** LSH-pruned MaxSim — the late-interaction SCALE path (the serving
    * pattern of ColBERT-style systems: per-token candidate generation,
    * exact late-interaction rerank on the survivors):
    *
    *   1. candidates: a document is scored for a query iff ANY of its
    *      vectors shares a hyperplane-LSH bucket with ANY query vector
    *      (same seeded multi-table signatures + 1-bit multiprobe as
    *      [[AnnLsh.lshKnnJoin]] — a single long-keyed equi-join, no
    *      cross join);
    *   2. the exact MaxSim scorer runs only over candidate (query, doc)
    *      pairs.
    *
    * Per query the scan cost drops from every doc vector to the bucket
    * collisions — the trade identical to lshKnnJoin's, tuned by
    * numPlanes/numTables. The signatures are pure (seed, plane, dim)
    * functions, so the WHOLE pruned pipeline is cross-engine
    * oracle-checkable like the flat LSH path. */
  def maxSimJoinPruned(docVecs: DataFrame, queryVecs: DataFrame, k: Int,
      numPlanes: Int = 6, d: Int = 64, seed: Long = 42L, multiProbe: Int = 1,
      numTables: Int = 4,
      queryId: String = "query_id", queryVec: String = "query_vec",
      idCol: String = "doc_id", vecCol: String = "vec",
      scoreDigits: Int = -1): DataFrame = {
    require(k > 0 && numPlanes > 0 && numPlanes <= 56 && numTables > 0)
    def sigs(vec: Column): Seq[Column] = (0 until numTables).map { t =>
      AnnLsh.signature(vec, numPlanes, d, AnnLsh.tableSeed(seed, t)) +
        lit(t.toLong << 56)
    }
    val docs = docVecs.select(col(idCol).cast("long").as("doc_id"),
      col(vecCol).cast("array<float>").as("dvec"))
    val qbag = queryVecs.select(col(queryId).cast("long").as("query_id"),
      col("vec_no").cast("int").as("vec_no"),
      col(queryVec).cast("array<float>").as("qvec"))
    val sigD = docs.select(col("doc_id"),
      explode(array(sigs(col("dvec")): _*)).as("sig"))
    val sigQ0 = qbag.select(col("query_id"),
      explode(array(sigs(col("qvec")): _*)).as("qsig"))
    val probeSigs: Column =
      if (multiProbe <= 0) array(col("qsig"))
      else array(col("qsig") +: (0 until numPlanes).map(i =>
        col("qsig").bitwiseXOR(lit(1L << i))): _*)
    val probes = sigQ0.select(col("query_id"), explode(probeSigs).as("sig"))
    val cand = sigD.join(probes, Seq("sig"))
      .select("query_id", "doc_id").distinct()
    // exact MaxSim restricted to candidate pairs: dock the doc vectors to
    // their candidate queries, then the query bag broadcasts as usual
    val pairScore = similarity.dot_product(col("dvec"), col("qvec"))
    val perQvec = docs.join(cand, Seq("doc_id"))
      .join(broadcast(qbag), Seq("query_id"))
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

  /** IVF-cell-gated MaxSim — coarse routing for CLUSTERED corpora (the
    * roadmap counterpart of [[graft.hnsw.IvfHnsw]] for late interaction):
    *
    *   1. every document vector is assigned to its nearest IVF cell
    *      (greatest-struct argmax against broadcast centroid literals —
    *      ties to the larger cell, the [[IvfFlat]] convention);
    *   2. every query vector ranks the centroids and keeps its `nprobe`
    *      nearest cells ((score desc, cell asc) — the
    *      [[graft.hnsw.IvfHnsw.routeProbes]] total order);
    *   3. candidates: a document is scored for a query iff ANY of its
    *      vectors lives in a cell probed by ANY of the query's vectors —
    *      a small-key cell equi-join, no cross join;
    *   4. the exact MaxSim scorer runs only over candidate pairs.
    *
    * Per query the scan cost drops to ~nprobe/C of the corpus — the IVF
    * trade, with LATE-INTERACTION scoring inside. vs [[maxSimJoinPruned]]:
    * LSH prunes by per-vector collision (corpus-shape-agnostic, pays the
    * signature scan), cells prune by region (cheaper joins, needs a
    * clusterable corpus). Routing/assignment use `metric` (the
    * quantizer's geometry — cosine for normalized late-interaction
    * embeddings); the scorer stays Σ max dot. Centroids are literals, so
    * the WHOLE gated pipeline is cross-engine oracle-checkable like the
    * flat IVF path. */
  def maxSimJoinIvf(docVecs: DataFrame, queryVecs: DataFrame, k: Int,
      centroids: Array[(Int, Array[Float])], nprobe: Int = 2,
      metric: String = "cosine",
      queryId: String = "query_id", queryVec: String = "query_vec",
      idCol: String = "doc_id", vecCol: String = "vec",
      scoreDigits: Int = -1): DataFrame = {
    require(k > 0 && nprobe > 0 && centroids.nonEmpty)
    val docs = docVecs.select(col(idCol).cast("long").as("doc_id"),
      col(vecCol).cast("array<float>").as("dvec"))
    val qbag = queryVecs.select(col(queryId).cast("long").as("query_id"),
      col("vec_no").cast("int").as("vec_no"),
      col(queryVec).cast("array<float>").as("qvec"))
    // doc-vector cells: argmax sim, NaN pinned to -1.0, ties -> larger cell
    val assignScores = centroids.map { case (c, v) =>
      struct(nanvl(similarity.sim(metric)(col("dvec"), typedlit(v)), lit(-1.0)).as("s"),
        lit(c).as("c"))
    }
    val docCells = docs
      .withColumn("cell", greatest(assignScores.toSeq: _*)("c"))
      .select("doc_id", "cell").distinct()
    // query-vector routing: nprobe nearest cells, (score desc, cell asc)
    val ranked = centroids.map { case (c, v) =>
      struct(
        negate(nanvl(similarity.sim(metric)(col("qvec"), typedlit(v)), lit(-1.0))).as("ns"),
        lit(c).as("c"))
    }
    val qCells = qbag
      .withColumn("cells", slice(array_sort(array(ranked.toSeq: _*)), 1, nprobe)("c"))
      .select(col("query_id"), explode(col("cells")).as("cell")).distinct()
    val cand = docCells.join(qCells, Seq("cell"))
      .select("query_id", "doc_id").distinct()
    // exact MaxSim restricted to candidate pairs (same tail as the LSH
    // pruned path)
    val pairScore = similarity.dot_product(col("dvec"), col("qvec"))
    val perQvec = docs.join(cand, Seq("doc_id"))
      .join(broadcast(qbag), Seq("query_id"))
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

  /** Quantizer-SHARING composition: gate late-interaction retrieval with
    * the SAME coarse quantizer a single-vector hybrid index was fitted
    * with (`IvfHnsw.fit`/`load`) — one fleet-wide cell geometry across
    * single- and multi-vector surfaces, so a mixed corpus pays ONE
    * quantizer fit and routes every retrieval mode through the same
    * centroid literals (consistent cell pruning, shared cell-partitioned
    * layouts). Exactly [[maxSimJoinIvf]] with the model's centroids and
    * metric. */
  def maxSimJoinSharedQuantizer(docVecs: DataFrame, queryVecs: DataFrame,
      k: Int, model: graft.hnsw.IvfHnsw.Model, nprobe: Int = 2,
      queryId: String = "query_id", queryVec: String = "query_vec",
      idCol: String = "doc_id", vecCol: String = "vec",
      scoreDigits: Int = -1): DataFrame =
    maxSimJoinIvf(docVecs, queryVecs, k, model.centroids, nprobe,
      model.hnsw.params.metric, queryId, queryVec, idCol, vecCol, scoreDigits)
}
