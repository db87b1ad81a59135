package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.similarity

/** Hard-negative mining for contrastive training — the embedding-side
  * twin of the text battery's data-selection ops: for each anchor
  * vector, surface the most-similar vectors of a DIFFERENT label (the
  * "hard" negatives a contrastive loss learns most from), tagged with
  * the anchor's hardest-positive similarity and the FaceNet semi-hard
  * flag (sim(negative) < sim(hardest positive) — negatives inside the
  * margin band but not harder than the positive).
  *
  * Spark shape (the same scale contract as the exact kNN oracle,
  * KnnJoin): the bounded anchor set broadcasts against the base, which
  * streams partition-local exactly once — no base shuffle; the label
  * constraint and the positive/negative split are column predicates on
  * the joined row, so they ride the same single scan. Per-anchor top-k
  * is a rank window over the candidate union. For corpora where even
  * one streamed scan per mining pass is too much, swap the candidate
  * generator for any of the engine's ANN paths (IVF/BQ/HNSW knnJoin
  * with overfetch) and keep the same split/rank tail — the exact form
  * here is the oracle the approximate one is measured against.
  */
object Mining {

  /** @param base    (vec_id, embedding, label) corpus
    * @param anchors (query_id, query_vec, query_label) — bounded probe set
    * @param k       negatives per anchor
    * @return (query_id, rnk, neighbor_id, label, score, pos_score,
    *         semi_hard): the top-k different-label neighbors by
    *         descending score (ties by neighbor id), each with the
    *         anchor's hardest same-label (non-self) similarity and the
    *         semi-hard flag; pos_score/semi_hard are null when the
    *         anchor's label has no other member. */
  def hardNegatives(base: DataFrame, anchors: DataFrame, k: Int,
      metric: String = "cosine", scoreDigits: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    val sim = graft.Qutil.rnd(
      similarity.sim(metric)(col("embedding"), col("query_vec")), scoreDigits)
    val scored = base.join(broadcast(anchors))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_label"),
        col("vec_id"), col("label"), sim.as("score"))
    val pos = scored.filter(col("label") === col("query_label"))
      .groupBy("query_id").agg(max("score").as("pos_score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    scored.filter(col("label") =!= col("query_label"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .join(broadcast(pos), Seq("query_id"), "left")
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("label"), col("score"), col("pos_score"),
        (col("score") < col("pos_score")).as("semi_hard"))
  }
}
