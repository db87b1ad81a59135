package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate canonicalization: connected components over a candidate
  * pair list (e.g. MinHash-LSH buckets), assigning every doc a
  * cluster_id = min doc_id of its component.
  *
  * Adaptive execution:
  *  - The pair list after LSH banding is orders of magnitude smaller than
  *    the corpus (it only contains near-dup candidates). When it fits on
  *    the driver (≤ `driverEdgeLimit` edges), a single collect + in-memory
  *    union-find resolves components in one pass — no iterative jobs.
  *  - Above the limit, distributed min-label propagation with path
  *    compression (pointer jumping): each round folds every vertex's label
  *    to the min over {self, neighbors' labels, label's label}, converging
  *    in O(log diameter) rounds; `localCheckpoint` keeps the plan flat.
  *
  * Only edge-incident vertices iterate; singleton docs rejoin at the end
  * as their own cluster, so per-round work is proportional to the
  * near-dup subgraph, never the corpus.
  */
object Dedup {

  /** @param docs  (doc_id) — the full corpus (defines singleton clusters)
    * @param pairs (id1, id2) candidate near-dup pairs, id1 < id2
    * @param roundsOut when set, receives the pointer-jumping round count
    *                  (0 on the union-find path) — scale-bench telemetry
    * @return (doc_id, cluster_id, is_canonical) for every doc */
  def connectedComponents(docs: DataFrame, pairs: DataFrame,
      driverEdgeLimit: Long = 5000000L, maxRounds: Int = 25,
      roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val edges2 = pairs.select(col("id1").cast("long").as("a"), col("id2").cast("long").as("b"))
    // size probe and driver fetch in ONE pipeline pass: collect at most
    // limit+1 edges (LocalLimit early-exits partitions) — the expensive
    // LSH pair pipeline runs once on the common small-graph path, and the
    // driver never holds more than limit+1 rows
    val probeLimit = math.min(driverEdgeLimit, Int.MaxValue - 1L).toInt
    val probe = edges2.limit(probeLimit + 1).as[(Long, Long)].collect()
    val labels: DataFrame =
      if (probe.length <= probeLimit) {
        // driver union-find over the (small) candidate graph
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
          r
        }
        probe.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val resolved = parent.keys.map(k => (k, find(k))).toSeq
        roundsOut.foreach(_.set(0))
        spark.createDataFrame(resolved).toDF("doc_id", "lbl")
      } else {
        val edges = edges2
          .union(edges2.select(col("b").as("a"), col("a").as("b")))
          .persist()
        var lbls = edges.select(col("a").as("doc_id")).distinct()
          .withColumn("lbl", col("doc_id")).localCheckpoint()
        var changed = 1L
        var rounds = 0
        while (changed > 0 && rounds < maxRounds) {
          val nbrMin = edges
            .join(lbls.select(col("doc_id").as("b"), col("lbl").as("nl")), Seq("b"))
            .groupBy(col("a").as("doc_id")).agg(min("nl").as("nmin"))
          val stepped = lbls.join(nbrMin, Seq("doc_id"), "left")
            .select(col("doc_id"),
              least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
          // path compression: follow the label's own label one hop
          val next = stepped.alias("s")
            .join(stepped.select(col("doc_id").as("lbl"), col("lbl").as("ll")).alias("p"),
              Seq("lbl"), "left")
            .select(col("doc_id"), least(col("lbl"), coalesce(col("ll"), col("lbl"))).as("lbl"))
            .localCheckpoint()
          changed = next.join(lbls.select(col("doc_id"), col("lbl").as("old")), Seq("doc_id"))
            .filter(col("lbl") =!= col("old")).count()
          lbls = next
          rounds += 1
        }
        edges.unpersist()
        roundsOut.foreach(_.set(rounds))
        lbls
      }
    docs.select(col("doc_id")).join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
  }

  /** LEAKAGE-PROOF train/val/test assignment over a clustered corpus:
    * hash the near-dup CLUSTER id (md5, portable fixed-point — the
    * engine-free split arithmetic every oracle mirrors), never the item
    * id, so whole clusters land in one split. Appends:
    *
    *  - `split`        — 8/1/1 by md5(cluster_id): the leak-free split
    *  - `naive_split`  — 8/1/1 by md5(item id): what a per-item split
    *                     would have done
    *  - `cluster_leaky` — true when the naive split SEVERS this cluster
    *                      (members in >1 split): the contamination the
    *                      cluster-aware split eliminates, measurable as
    *                      the flagged-row fraction
    *
    * One aggregation on cluster_id + one broadcast-able join on the
    * (bounded, cluster-count-sized) leak table — shuffle-wise the same
    * shape at any corpus size. Shared by the text (`dedup_aware_split`)
    * and image (`media_dedup_split`) batteries so the two modalities
    * carry the SAME leakage guarantee. */
  def clusterAwareSplit(cl: DataFrame, idCol: String = "doc_id",
      clusterCol: String = "cluster_id"): DataFrame = {
    def name(b: Column) = when(b < 8, "train")
      .when(b === 8, "val").otherwise("test")
    val withSplits = cl
      .withColumn("cb",
        graft.Qutil.md5Long60(
          concat(lit("split:"), col(clusterCol).cast("string"))) % 10)
      .withColumn("nb",
        graft.Qutil.md5Long60(
          concat(lit("split:"), col(idCol).cast("string"))) % 10)
    val leaky = withSplits.groupBy(clusterCol)
      .agg((countDistinct(name(col("nb"))) > 1).as("cluster_leaky"))
    withSplits.join(leaky, Seq(clusterCol))
      .withColumn("split", name(col("cb")))
      .withColumn("naive_split", name(col("nb")))
      .drop("cb", "nb")
  }
}
