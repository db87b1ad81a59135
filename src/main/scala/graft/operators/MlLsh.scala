package graft.operators

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH, Word2Vec}
import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib-estimator LSH paths — the "use MLlib where it already fits"
  * integration alongside the hand-rolled [[AnnLsh]]/[[graft.hnsw]] paths:
  *
  *  - [[minHashNearDups]]: `org.apache.spark.ml.feature.MinHashLSH` over
  *    shingle-set sparse vectors → Jaccard-distance candidate pairs
  *    (`approxSimilarityJoin`, distributed band-bucket join inside MLlib).
  *  - [[brpAnnJoin]]: `BucketedRandomProjectionLSH` (Euclidean) similarity
  *    join + per-query top-k — MLlib's batch ANN shape.
  *
  * Both estimators are seeded, so results are deterministic run-to-run;
  * they remain rows-only in the oracle gate because MLlib's internal hash
  * families are not reproducible in DuckDB SQL.
  */
object MlLsh {

  /** documents(doc_id, text) → near-dup pairs by shingle Jaccard distance. */
  def minHashNearDups(docs: DataFrame, maxJaccardDistance: Double = 0.8,
      numHashTables: Int = 8, dim: Int = 1 << 18, seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // materialization barrier (a one-element explode) so the regex split
    // runs once per doc — inlined into the transform lambda it would
    // re-split per shingle reference (see graft.TextQueries.mat)
    val vecs = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks0"))
      .withColumn("toks", explode(array(col("toks0")))).drop("toks0")
      .select(col("doc_id"),
        expr(
          """array_distinct(CASE WHEN size(toks) >= 3
            |  THEN transform(sequence(0, size(toks)-3),
            |    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
            |  ELSE array() END)""".stripMargin).as("shs"))
      .filter(size(col("shs")) > 0) // MinHashLSH requires ≥1 nonzero entry
      .as[(Long, Seq[String])]
      .map { case (id, shs) =>
        val idx = shs.map(s => math.floorMod(s.hashCode, dim)).distinct.sorted.toArray
        (id, MlVectors.sparse(dim, idx, Array.fill(idx.length)(1.0)))
      }
      .toDF("doc_id", "features")
    val nonEmpty = vecs
    val model = new MinHashLSH()
      .setNumHashTables(numHashTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
      .fit(nonEmpty)
    model.approxSimilarityJoin(nonEmpty, nonEmpty, maxJaccardDistance, "jaccard_dist")
      .select(col("datasetA.doc_id").as("id1"), col("datasetB.doc_id").as("id2"),
        graft.Qutil.rnd(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("id1") < col("id2"))
  }

  /** MLlib `Word2Vec` document vectors — the cross-IMPLEMENTATION
    * parity twin of [[Sgns]] (same tokenization, same mean-of-words doc
    * representation via `Word2VecModel.transform`). Seeded but
    * `numPartitions`-sensitive inside MLlib (its Hogwild-style layout),
    * so the input is coalesced to one partition for a stable demo;
    * [[Sgns.train]] is the layout-independent scale path. Returns
    * (doc_id, embedding array<float>). */
  def word2VecDocVecs(docs: DataFrame, dim: Int = 32, window: Int = 2,
      minCount: Int = 1, maxIter: Int = 3, seed: Long = 42L,
      fitDocs: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def tok(d: DataFrame) = d
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .coalesce(1)
    val toks = tok(docs)
    // fit-on-sample / transform-everywhere (the sgnsModel battery
    // split): the iterative fit runs over the bounded slice, the
    // mean-of-words transform over the full corpus
    val model = new Word2Vec()
      .setVectorSize(dim).setWindowSize(window).setMinCount(minCount)
      .setMaxIter(maxIter).setSeed(seed).setNumPartitions(1)
      .setInputCol("toks").setOutputCol("docvec")
      .fit(fitDocs.map(tok).getOrElse(toks))
    model.transform(toks)
      .select(col("doc_id"), col("docvec"))
      .as[(Long, org.apache.spark.ml.linalg.Vector)]
      .map { case (id, v) => (id, v.toArray.map(_.toFloat)) }
      .toDF("doc_id", "embedding")
  }

  /** Euclidean ANN via BucketedRandomProjectionLSH similarity join. */
  def brpAnnJoin(base: DataFrame, queries: DataFrame, k: Int,
      maxDistance: Double, bucketLength: Double = 2.0,
      numHashTables: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    def toVec(df: DataFrame, idCol: String, vecCol: String, outId: String) =
      df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
        .as[(Long, Array[Float])]
        .map { case (id, v) => (id, MlVectors.dense(v.map(_.toDouble))) }
        .toDF(outId, "features")
    val b = toVec(base, "vec_id", "embedding", "neighbor_id")
    val q = toVec(queries, "query_id", "query_vec", "query_id")
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
      .fit(b)
    val joined = model.approxSimilarityJoin(b, q, maxDistance, "dist")
      .select(col("datasetB.query_id").as("query_id"),
        col("datasetA.neighbor_id").as("neighbor_id"),
        (lit(1.0) / (lit(1.0) + col("dist"))).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
