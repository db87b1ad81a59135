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
  /** Contrastive TRAINING TRIPLETS — the data product a contrastive /
    * metric-learning run actually consumes: per anchor, the hardest
    * positive (most-similar same-label vector, the hard-positive
    * convention) paired with the top-`negK` hardest negatives, each row
    * carrying the (pos − neg) similarity margin the loss sees. Same
    * broadcast no-base-shuffle shape as [[hardNegatives]]; anchors with
    * no same-label partner yield no triplet (no positive exists). */
  def trainingTriplets(base: DataFrame, anchors: DataFrame, negK: Int,
      metric: String = "cosine", scoreDigits: Int = 6): DataFrame = {
    require(negK > 0, "negK must be positive")
    val sim = graft.Qutil.rnd(
      similarity.sim(metric)(col("embedding"), col("query_vec")), scoreDigits)
    val scored = base.join(broadcast(anchors))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_label"),
        col("vec_id"), col("label"), sim.as("score"))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    val pos = scored.filter(col("label") === col("query_label"))
      .withColumn("prn", row_number().over(wp)).filter(col("prn") === 1)
      .select(col("query_id"), col("vec_id").as("pos_id"),
        col("score").as("pos_score"))
    val negs = scored.filter(col("label") =!= col("query_label"))
      .withColumn("rnk", row_number().over(wp)).filter(col("rnk") <= negK)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neg_id"),
        col("score").as("neg_score"))
    negs.join(broadcast(pos), Seq("query_id"))
      .select(col("query_id"), col("rnk"), col("pos_id"), col("neg_id"),
        col("pos_score"), col("neg_score"),
        graft.Qutil.rnd(col("pos_score") - col("neg_score"), scoreDigits)
          .as("margin"))
  }

  /** IVF-gated hard-negative mining — the SCALE path: candidates come
    * from each anchor's `nprobe` nearest IVF cells (~nprobe/C of the
    * corpus per anchor instead of a full scan), with the same
    * negative/positive split and ranking as [[hardNegatives]]. Anchors
    * whose probed cells yield fewer than k negatives ESCALATE (nprobe
    * ×4 per round, capped at all-cells — at which point the result IS
    * the exact one), so the returned cardinality matches the exact
    * operator's. At nprobe = numCells the whole result is bit-identical
    * to [[hardNegatives]] (spec-pinned). pos_score is the hardest
    * positive among the PROBED candidates (the exact twin scans
    * everything) — null when the probed cells hold no same-label
    * vector. `base` supplies labels by id; at 100 TB materialize the
    * label-joined assignment once instead of re-joining per call. */
  def hardNegativesIvf(base: DataFrame, model: IvfFlat.Model,
      anchors: DataFrame, k: Int, nprobe: Int = 4,
      scoreDigits: Int = 6): DataFrame = {
    require(k > 0 && nprobe > 0)
    val numCells = model.centroids.length
    val labeled = model.assigned.select(col("id"), col("cell"))
      .join(base.select(col("vec_id").as("id"), col("embedding"),
        col("label")), Seq("id"))

    def mine(pend: DataFrame, np: Int): DataFrame = {
      val probes = pend
        .withColumn("cells", graft.functions.cells.nearest_cells(
          col("query_vec"), model.centroids, "cosine",
          n = math.min(np, numCells), tieCellDesc = true))
        .select(col("query_id"), col("query_vec"), col("query_label"),
          explode(col("cells")).as("cell"))
      val raw = nanvl(
        similarity.sim("cosine")(col("embedding"), col("query_vec")),
        lit(-1.0))
      val sc =
        if (scoreDigits >= 0) graft.Qutil.rnd(raw, scoreDigits) else raw
      val cand = labeled.join(probes, Seq("cell"))
        .filter(col("id") =!= col("query_id"))
        .select(col("query_id"), col("query_label"),
          col("id"), col("label"), sc.as("score"))
      val pos = cand.filter(col("label") === col("query_label"))
        .groupBy("query_id").agg(max("score").as("pos_score"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("id").asc)
      cand.filter(col("label") =!= col("query_label"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
        .join(broadcast(pos), Seq("query_id"), "left")
        .select(col("query_id"), col("rnk"), col("id").as("neighbor_id"),
          col("label"), col("score"), col("pos_score"),
          (col("score") < col("pos_score")).as("semi_hard"))
    }

    var np = math.min(nprobe, numCells)
    var pending = anchors
    var acc: List[DataFrame] = Nil
    var done = false
    while (!done) {
      val r = mine(pending, np)
      if (np >= numCells) { acc ::= r; done = true }
      else {
        val sat = r.groupBy("query_id").agg(count(lit(1)).as("n"))
          .filter(col("n") === k).select("query_id")
        acc ::= r.join(broadcast(sat), Seq("query_id"), "left_semi")
        pending = pending.join(broadcast(sat), Seq("query_id"), "left_anti")
        if (pending.limit(1).count() == 0) done = true
        else np = math.min(np * 4, numCells)
      }
    }
    acc.reduce(_ unionByName _)
  }

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
