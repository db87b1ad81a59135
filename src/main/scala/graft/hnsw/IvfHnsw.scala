package graft.hnsw

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.IvfFlat

/** Hybrid IVF→HNSW: coarse cells route queries, per-cell HNSW sub-graphs
  * answer them — the composition that makes graph ANN sublinear on a
  * cluster.
  *
  * Plain distributed HNSW ([[HnswIndexer]]) shards arbitrarily by
  * hash(id), so EVERY query must search EVERY shard (shard-and-search);
  * per-query work grows with the shard count, i.e. linearly with corpus
  * size at fixed shard memory. Here the shards are IVF cells
  * ([[IvfFlat.fit]]'s deterministic coarse quantizer): a query ranks the
  * C centroids (driver-side, C is small by construction) and searches
  * only its `nprobe` nearest cells' sub-graphs — per-query work is
  * nprobe/C of the corpus regardless of C, the same pruning that makes
  * [[graft.operators.IvfPq]] scale, but with graph-quality candidate
  * generation inside each cell instead of a flat code scan.
  *
  * Build cost equals plain HNSW build (one shuffle on the cell key, then
  * executor-local inserts in ascending-id order — deterministic); the
  * graph rows reuse [[PartGraphRow]] with part = cell id, so the
  * executor-side [[SubIndexCache]], persistence format, and
  * [[HnswModel]]'s save/load all apply unchanged.
  */
object IvfHnsw {

  /** `hnsw.graph` holds one sub-index per CELL (part = cell id). */
  case class Model(centroids: Array[(Int, Array[Float])], hnsw: HnswModel) {
    def unpersist(): Unit = hnsw.unpersist()
  }

  /** Cell-partitioned build: assign cells with the SEARCH metric (a
    * mismatched assignment strands true neighbors in never-probed cells),
    * then build one deterministic HNSW per cell. */
  def fit(df: DataFrame, numCells: Int = 8,
      params: HnswParams = HnswParams(),
      idCol: String = "vec_id", vecCol: String = "embedding",
      balanceSlack: Double = 0.0): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = params
    // balanceSlack > 0 caps cell sizes (IvfFlat.assignBalanced), bounding
    // the slowest per-cell builder and the hottest probe shard
    val ivf = IvfFlat.fit(df, numCells, p.seed, idCol, vecCol,
      metric = p.metric, balanceSlack = balanceSlack)
    val graph = ivf.assigned
      .select(col("cell"), col("id"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .repartition(numCells, col("cell"))
      .sortWithinPartitions("cell", "id")
      .mapPartitions { it =>
        // a hash partition may hold several cells: build one sub-index per
        // cell run (rows arrive sorted by (cell, id), so insertion order
        // inside each cell is ascending id — same determinism contract as
        // HnswIndexer.fit)
        it.toArray.groupBy(_._1).iterator.flatMap { case (cell, rows) =>
          val idx = new HnswIndex(p.m, p.efConstruction, -1, Metric(p.metric),
            Some(p.effectiveEfSearch), None, p.seed)
          idx.buildIndex(rows.iterator.map { case (_, id, v) => (id, v) })
          idx.toRows.map(r => PartGraphRow(cell, r.id, r.level, r.vector, r.neighbors))
        }
      }
    val persisted = graph.persist()
    persisted.count()
    Model(ivf.centroids, new HnswModel(spark, p, persisted))
  }

  /** Cell-routed search: rank centroids per query (NaN-guarded, id
    * tie-break), search the `nprobe` nearest cells' sub-graphs only, merge
    * with the usual per-query top-k window. */
  def knnJoin(model: Model, queries: DataFrame, k: Int, nprobe: Int = 2,
      efSearchOverride: Option[Int] = None,
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    require(k > 0 && nprobe > 0)
    val session = model.hnsw.graph.sparkSession
    import session.implicits._
    val p = model.hnsw.params
    val probes: Array[(Long, Array[Float])] = queries
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val metric = Metric(p.metric)
    val cellsOf: Map[Long, Array[Int]] = probes.map { case (qid, qv) =>
      val ranked = model.centroids.map { case (c, cent) =>
        val s = metric.sim(qv, cent)
        (if (java.lang.Double.isNaN(s)) -1.0 else s, c)
      }.sortBy { case (s, c) => (-s, c) }.take(nprobe).map(_._2)
      qid -> ranked
    }.toMap
    val wanted = cellsOf.values.flatten.toSet.toSeq
    val bcQ = session.sparkContext.broadcast(probes)
    val bcCells = session.sparkContext.broadcast(cellsOf)
    val ef = efSearchOverride
    val hnsw = model.hnsw
    // partition pruning: untouched cells never rebuild or search
    val pruned = hnsw.graph.filter(col("part").isin(wanted: _*))
    val local = pruned.mapPartitions { rows =>
      hnsw.rebuild(rows, p).flatMap { case (cell, idx) =>
        bcQ.value.iterator
          .filter { case (qid, _) => bcCells.value(qid).contains(cell) }
          .flatMap { case (qid, qv) =>
            idx.searchKNN(qv, k, ef).iterator.map { case (id, s) => (qid, id, s) }
          }
      }
    }.toDF("query_id", "neighbor_id", "score")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    local.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Persistence: centroids parquet + the cell-keyed graph via
    * [[HnswModel.save]] (store CRUD contract; load-missing → None). */
  def save(model: Model, path: String): Unit = {
    val spark = model.hnsw.spark
    import spark.implicits._
    model.hnsw.save(s"$path/hnsw")
    model.centroids.toSeq.toDF("cell", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: SparkSession, path: String): Option[Model] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/centroids"))) return None
    import spark.implicits._
    val centroids = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Float])].collect().sortBy(_._1)
    HnswModel.load(spark, s"$path/hnsw").map(Model(centroids, _))
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    ()
  }
}
