package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.similarity

/** IVF-Flat approximate k-NN: coarse-quantize the corpus into C cells
  * (seeded sample centroids + one Lloyd refinement, all DataFrame ops),
  * then at query time search only the `nprobe` nearest cells.
  *
  * Scale shape: train = 2 scans + tiny broadcasts; the inverted index is
  * the base table hash-partitioned by cell id; a query touches
  * nprobe/C of the data. Everything stays in whole-stage codegen
  * (centroid scoring uses the native cosine expression against literal
  * vectors); no driver loops over data — only over the C centroids,
  * which are small by construction.
  */
object IvfFlat {

  case class Model(centroids: Array[(Int, Array[Float])], assigned: DataFrame)

  /** Deterministic training: initial centroids = the C vectors with the
    * smallest mixed hash of their id, refined by one Lloyd iteration. */
  def fit(base: DataFrame, numCells: Int = 16, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    val spark = base.sparkSession
    import spark.implicits._
    val hashed = base.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("h", xxhash64(col("id"), lit(seed)))
    val init = hashed.orderBy("h").limit(numCells)
      .select("id", "vec").as[(Long, Array[Float])].collect()
      .zipWithIndex.map { case ((_, v), i) => (i, v) }
    val afterAssign = assign(hashed.select("id", "vec"), init)
    // one Lloyd step: element-wise mean per cell via posexplode
    val refined = afterAssign
      .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg("x").as("mx"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("ps"))
      .select(col("cell"), expr("transform(ps, p -> cast(p.mx as float))").as("cvec"))
      .as[(Int, Array[Float])].collect()
      .sortBy(_._1)
    val finalCentroids = if (refined.length == numCells) refined else init
    Model(finalCentroids, assign(hashed.select("id", "vec"), finalCentroids)
      .repartition(col("cell")))
  }

  /** argmax-similarity cell assignment against broadcast literal centroids.
    * Zero-norm vectors score NaN under cosine, and Spark orders NaN above
    * every double — without the nanvl guard greatest() would hand such
    * rows an arbitrary (last-NaN) cell. They pin to -1.0 (worst) instead,
    * landing deterministically in the first cell. */
  private def assign(df: DataFrame, centroids: Array[(Int, Array[Float])]): DataFrame = {
    val scores = centroids.map { case (c, v) =>
      struct(nanvl(similarity.cosine_sim(col("vec"), typedlit(v)), lit(-1.0)).as("s"),
        lit(c).as("c"))
    }
    df.withColumn("best", greatest(scores.toSeq: _*))
      .withColumn("cell", col("best.c")).drop("best")
  }

  /** Query: probe the nprobe nearest cells, exact rerank inside them. */
  def knnJoin(model: Model, queries: DataFrame, k: Int, nprobe: Int = 4,
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    require(k > 0 && nprobe > 0)
    // same NaN guard as assign(): a zero-norm query probes the first
    // nprobe cells deterministically instead of NaN-ranked arbitrary ones
    val cellScores = model.centroids.map { case (c, v) =>
      struct(nanvl(similarity.cosine_sim(col("qvec"), typedlit(v)), lit(-1.0)).as("s"),
        lit(c).as("c"))
    }
    val probes = queries
      .select(col(queryId), col(queryVec).as("qvec"))
      .withColumn("cells",
        slice(reverse(array_sort(array(cellScores: _*))), 1, nprobe))
      .select(col(queryId), col("qvec"), explode(col("cells.c")).as("cell"))
    val cands = model.assigned.join(probes, Seq("cell"))
      .select(col(queryId), col("id").as("neighbor_id"),
        nanvl(similarity.cosine_sim(col("vec"), col("qvec")), lit(-1.0)).as("score"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
