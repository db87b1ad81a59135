package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Qutil.rnd
import graft.functions.similarity._
import graft.hnsw.{HnswIndexer, HnswParams}
import graft.operators.{AnnLsh, KnnJoin, Recall}

/** Vector-search operator battery over the `embeddings` table.
  *
  * Covers O1/O2 (similarity kernels), B5 (brute-force exact k-NN — the
  * recall oracle, reference src/bench/metrics.ts:9-24), the embedding-cosine
  * near-duplicate self-join, and (once the HNSW model is wired in) the
  * approximate path O12 plus recall@k B6/B7.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def probes(s: SparkSession, dir: String, n: Int = 100): DataFrame =
    emb(s, dir).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B5 exact k-NN, cosine — queries are the first 100 base vectors
    // (reference semantics, src/bench/run.ts:121-122: queries ⊆ base)
    "knn_exact_cosine" -> ((s, dir) =>
      KnnJoin.exactKnnJoin(emb(s, dir), probes(s, dir), k = 10,
        metric = "cosine", scoreDigits = 6)),

    // B5 exact k-NN, euclidean similarity 1/(1+L2) (src/similarity.ts:22-24)
    "knn_exact_euclid" -> ((s, dir) =>
      KnnJoin.exactKnnJoin(emb(s, dir), probes(s, dir), k = 10,
        metric = "euclidean", scoreDigits = 6)),

    // B5 exact k-NN, inner product (MIPS — additive beyond the reference's
    // metric pair; unnormalized embedding models rank by dot product)
    "knn_exact_dot" -> ((s, dir) =>
      KnnJoin.exactKnnJoin(emb(s, dir), probes(s, dir), k = 10,
        metric = "dot", scoreDigits = 6)),

    // O1 kernel sanity: self dot product + L2 norm per vector
    "vec_norms" -> ((s, dir) =>
      emb(s, dir).select(col("vec_id"), col("label"),
        rnd(dot_product(col("embedding"), col("embedding")), 6).as("self_dot"),
        rnd(sqrt(dot_product(col("embedding"), col("embedding"))), 6).as("l2_norm"))),

    // embedding-cosine near-duplicate pairs (brute-force baseline; the
    // LSH-bucketed variant in TextQueries is the 100 TB scale path)
    "near_dup_embeddings" -> ((s, dir) => {
      val a = emb(s, dir).select(col("vec_id").as("id1"), col("embedding").as("e1"))
      val b = emb(s, dir).select(col("vec_id").as("id2"), col("embedding").as("e2"))
      a.join(b, col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          rnd(cosine_sim(col("e1"), col("e2")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.8)
    }),

    // O3-O12: distributed HNSW approximate k-NN (4 partition-local
    // sub-indexes, shard-and-search). Non-SQL-expressible → rows-only gate;
    // quality is asserted by recall_hnsw below and the ScalaTest suite.
    "knn_hnsw_cosine" -> ((s, dir) => {
      val model = HnswIndexer.fit(emb(s, dir),
        HnswParams(m = 16, efConstruction = 200, numPartitions = 4))
      model.knnJoin(probes(s, dir), k = 10, Some(100))
    }),

    // B6/B7 micro-averaged recall@10 of the HNSW path vs the exact oracle
    "recall_hnsw" -> ((s, dir) => {
      val model = HnswIndexer.fit(emb(s, dir),
        HnswParams(m = 16, efConstruction = 200, numPartitions = 4))
      val approx = model.knnJoin(probes(s, dir), k = 10, Some(100))
      val exact = KnnJoin.exactKnnJoin(emb(s, dir), probes(s, dir), k = 10)
      Recall.microAvgRecall(approx, exact)
    }),

    // LSH-bucketed ANN (the non-graph scale path): signature equi-join +
    // rerank. Non-SQL-expressible → rows-only gate; recall_lsh asserts quality.
    "knn_lsh_cosine" -> ((s, dir) =>
      AnnLsh.lshKnnJoin(emb(s, dir), probes(s, dir), k = 10,
        numPlanes = 6, d = 64, numTables = 4)),

    "recall_lsh" -> ((s, dir) => {
      val approx = AnnLsh.lshKnnJoin(emb(s, dir), probes(s, dir), k = 10,
        numPlanes = 6, d = 64, numTables = 4)
      val exact = KnnJoin.exactKnnJoin(emb(s, dir), probes(s, dir), k = 10)
      Recall.microAvgRecall(approx, exact)
    }),

    // IVF-Flat ANN (coarse-quantized scale path). Rows-only gate;
    // OperatorsSpec asserts recall incl. the nprobe=C exhaustive case.
    "knn_ivf_cosine" -> ((s, dir) => {
      val model = graft.operators.IvfFlat.fit(emb(s, dir), numCells = 16)
      graft.operators.IvfFlat.knnJoin(model, probes(s, dir), k = 10, nprobe = 4)
    }),

    // B6/B7 micro-averaged recall@10 of the IVF path vs the exact oracle
    "recall_ivf" -> ((s, dir) => {
      val model = graft.operators.IvfFlat.fit(emb(s, dir), numCells = 16)
      val approx = graft.operators.IvfFlat.knnJoin(model, probes(s, dir), k = 10, nprobe = 4)
      val exact = KnnJoin.exactKnnJoin(emb(s, dir), probes(s, dir), k = 10)
      Recall.microAvgRecall(approx, exact)
    }),

    // PQ ANN (memory-bound scale path: 8-byte codes + ADC scan + exact
    // rerank). Rows-only gate; OperatorsSpec asserts recall floors incl.
    // the exhaustive-rerank exactness case.
    "knn_pq_euclid" -> ((s, dir) => {
      val model = graft.operators.Pq.fit(emb(s, dir), numSub = 8, codesPerSub = 16)
      graft.operators.Pq.knnJoin(model, emb(s, dir), probes(s, dir), k = 10, rerank = 100)
    }),

    "recall_pq" -> ((s, dir) => {
      val model = graft.operators.Pq.fit(emb(s, dir), numSub = 8, codesPerSub = 16)
      val approx = graft.operators.Pq.knnJoin(model, emb(s, dir), probes(s, dir),
        k = 10, rerank = 100)
      val exact = KnnJoin.exactKnnJoin(emb(s, dir), probes(s, dir), k = 10,
        metric = "euclidean")
      Recall.microAvgRecall(approx, exact)
    }),

    // IVF-PQ (the composed largest-corpus path: nprobe cell pruning ×
    // residual PQ codes × exact rerank). Rows-only gate; spec asserts
    // recall floors incl. the all-cells/full-rerank exactness case.
    "knn_ivfpq_euclid" -> ((s, dir) => {
      val model = graft.operators.IvfPq.fit(emb(s, dir), numCells = 16,
        numSub = 8, codesPerSub = 16)
      graft.operators.IvfPq.knnJoin(model, emb(s, dir), probes(s, dir),
        k = 10, nprobe = 6, rerank = 150)
    }),

    "recall_ivfpq" -> ((s, dir) => {
      val model = graft.operators.IvfPq.fit(emb(s, dir), numCells = 16,
        numSub = 8, codesPerSub = 16)
      val approx = graft.operators.IvfPq.knnJoin(model, emb(s, dir), probes(s, dir),
        k = 10, nprobe = 6, rerank = 150)
      val exact = KnnJoin.exactKnnJoin(emb(s, dir), probes(s, dir), k = 10,
        metric = "euclidean")
      Recall.microAvgRecall(approx, exact)
    }),

    // B8 reference-shaped latency summary for the HNSW path: per-query
    // critical-path shard search times → count/avg + exact nearest-rank-
    // floor percentiles (the reference's searchLatencyMs record,
    // src/bench/run.ts:43-53 + src/bench/metrics.ts:46-68). Rows-only:
    // timings are machine-dependent by nature.
    "hnsw_latency_summary" -> ((s, dir) => {
      import graft.functions.FloorPercentiles.floor_percentiles
      val model = HnswIndexer.fit(emb(s, dir),
        HnswParams(m = 16, efConstruction = 200, numPartitions = 4))
      val (_, latencies) = model.knnJoinTimed(probes(s, dir), k = 10, Some(100))
      latencies.agg(
        count(lit(1)).as("n_queries"),
        rnd(avg("search_ms"), 3).as("avg_ms"),
        floor_percentiles(col("search_ms"), Seq(0.50, 0.90, 0.95, 0.99)).as("pcts"))
    }),

    // multimodal features feed straight into the similarity operators —
    // the media→embedding→retrieval composition (stub codec, real plan)
    "multimodal_knn" -> ((s, dir) => {
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("media_id"), lit("text").as("media_type"),
          encode(col("text"), "utf-8").as("content"),
          lit(640).as("width"), lit(480).as("height"))
      val feats = graft.operators.Multimodal.decodeFeaturesStub(media, featureDim = 8)
        .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
      val mprobes = feats.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      KnnJoin.exactKnnJoin(feats, mprobes, k = 5, metric = "cosine", scoreDigits = 6)
    }),

    // multimodal plumbing smoke: media rows (utf-8 bytes of documents as
    // stand-in payloads) → stub feature extraction → per-media summary
    "multimodal_features" -> ((s, dir) => {
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("media_id"), lit("text").as("media_type"),
          encode(col("text"), "utf-8").as("content"),
          lit(640).as("width"), lit(480).as("height"))
      graft.operators.Multimodal.decodeFeaturesStub(media, featureDim = 8)
        .select(col("media_id"), col("n_bytes"),
          graft.Qutil.rnd(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
    }),

    // MLlib-estimator LSH paths (seeded ⇒ deterministic; rows-only gate
    // since MLlib's hash families aren't reproducible in SQL).
    // MinHashLSH OR-joins on 1-row bands, which explodes into hot buckets
    // on this vocab-dense corpus — run the integration demo on a
    // deterministic 1k-doc slice; the banded 2-row minhash_lsh_pairs
    // operator above is the tuned scale path.
    "mllib_minhash_neardups" -> ((s, dir) =>
      graft.operators.MlLsh.minHashNearDups(
        s.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") < 1000),
        maxJaccardDistance = 0.6, numHashTables = 2)),

    // radius 1.5 ≈ 1.27x the worst exact rank-10 distance at this sf
    // (measured max d10 = 1.184; radius 10 degenerated to an all-pairs UDF
    // join). The inter-point distance distribution is dense just above the
    // NN band, so the pair join still touches ~1.3k candidates per probe —
    // the integration demo runs 25 probes; AnnLsh/HNSW/IVF are the tuned
    // scale paths.
    "mllib_brp_ann" -> ((s, dir) =>
      graft.operators.MlLsh.brpAnnJoin(emb(s, dir), probes(s, dir, 25), k = 10,
        maxDistance = 1.5, bucketLength = 1.0)),

    // label centroid stats: per-label mean norm (grouped vector agg)
    "label_centroid_norm" -> ((s, dir) =>
      emb(s, dir).groupBy("label")
        .agg(count(lit(1)).as("n"),
          rnd(avg(sqrt(dot_product(col("embedding"), col("embedding")))), 6)
            .as("avg_norm")))
  )

  val oracle: Map[String, String] = Map(
    "knn_exact_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 100),
        | scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |   floor((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))*1e6 + 0.5)/1e6 AS score
        |  FROM embeddings e, q)
        |SELECT query_id, neighbor_id, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, neighbor_id) AS rank FROM scored)
        |WHERE rank <= 10""".stripMargin,
    "knn_exact_euclid" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 100),
        | scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |   floor((1.0/(1.0 + list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))))*1e6 + 0.5)/1e6 AS score
        |  FROM embeddings e, q)
        |SELECT query_id, neighbor_id, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, neighbor_id) AS rank FROM scored)
        |WHERE rank <= 10""".stripMargin,
    "knn_exact_dot" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 100),
        | scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |   floor((list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))*1e6 + 0.5)/1e6 AS score
        |  FROM embeddings e, q)
        |SELECT query_id, neighbor_id, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, neighbor_id) AS rank FROM scored)
        |WHERE rank <= 10""".stripMargin,
    "vec_norms" ->
      """SELECT vec_id, label,
        | floor((list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))*1e6 + 0.5)/1e6 AS self_dot,
        | floor((sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))))*1e6 + 0.5)/1e6 AS l2_norm
        |FROM embeddings""".stripMargin,
    "near_dup_embeddings" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        | floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))*1e6 + 0.5)/1e6 AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))*1e6 + 0.5)/1e6 >= 0.8""".stripMargin,
    "label_centroid_norm" ->
      """SELECT label, count(*) AS n,
        | floor((avg(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))))*1e6 + 0.5)/1e6 AS avg_norm
        |FROM embeddings GROUP BY label""".stripMargin
  )
}
