package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.similarity
import graft.hnsw.{HnswIndex, HnswModel, HnswParams, IvfHnsw, Metric, SubIndexPin}

/** Streaming upsert for the HYBRID index ([[graft.hnsw.IvfHnsw]]): every
  * micro-batch assigns its new vectors to their nearest IVF cell (the
  * same greatest-struct argmax the batch fit uses, against the FIXED
  * centroids of a fitted model) and inserts them into that cell's pinned
  * executor-side HNSW sub-index — per-batch work is O(batch), queries
  * keep the cell-routed sublinear probe, and [[snapshot]] writes the
  * exact on-disk layout [[IvfHnsw.load]] serves, so a stream-built index
  * is batch-servable without conversion.
  *
  * Composition contract: centroids are FROZEN at construction (train on
  * a batch corpus or a seeded sample — retraining centroids online would
  * silently re-route the corpus). Ingest uses greedy nearest-centroid
  * assignment; a long-running stream on a drifting distribution should
  * periodically compact through a batch refit (the
  * [[EventPipeline.StreamingIndexMaintainer]] pattern).
  *
  * Executor pinning caveats are those of [[IncrementalIndex]]: exact in
  * local mode and on static clusters (identity cell partitioning routes
  * cell c's rows to task c); [[indexedCount]] is the consistency probe.
  */
class IncrementalIvfIndex(spark: SparkSession,
    val centroids: Array[(Int, Array[Float])], params: HnswParams,
    val maintainerId: String = java.util.UUID.randomUUID().toString)
    extends Serializable {

  private val p = params
  private val numCells = centroids.length

  /** foreachBatch sink: assign cells and insert one micro-batch of
    * (vec_id, embedding) rows. Insert order inside a batch cell is
    * ascending id — replaying identical batches rebuilds identical
    * shards; already-present ids are skipped (task-retry idempotence). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val mid = maintainerId
    val pr = p
    import batch.sparkSession.implicits._
    val scores = centroids.map { case (c, v) =>
      struct(nanvl(similarity.sim(pr.metric)(col("embedding"), typedlit(v)),
        lit(-1.0)).as("s"), lit(c).as("c"))
    }
    batch
      .select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .withColumn("cell", greatest(scores.toSeq: _*)("c"))
      .select(col("cell"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Array[Float])]
      .repartition(numCells, col("cell"))
      .sortWithinPartitions("cell", "vec_id")
      .foreachPartition { (it: Iterator[(Int, Long, Array[Float])]) =>
        // a partition may hold several cells (hash packing is irrelevant
        // here — the pin key comes from the ROW's cell, not the task id)
        it.foreach { case (cell, id, v) =>
          val key = s"$mid/$cell"
          val idx = Option(SubIndexPin.get(key)).getOrElse {
            val built = new HnswIndex(pr.m, pr.efConstruction, -1,
              Metric(pr.metric), Some(pr.effectiveEfSearch), None, pr.seed)
            SubIndexPin.put(key, built)
            built
          }
          idx.synchronized {
            if (!idx.nodes.contains(id)) idx.addPoint(id, v)
          }
        }
      }
  }

  /** Cell-routed pinned-shard k-NN: each probe searches only its
    * `nprobe` nearest cells' pinned sub-indexes — the same routing order
    * as [[IvfHnsw.routeProbes]] ((score desc, cell asc), NaN pinned to
    * -1.0). Probes are already driver-resident (the pinned-shard
    * contract), so the O(|Q|·C) cell ranking happens on the collected
    * array. */
  def knnJoin(queries: DataFrame, k: Int, nprobe: Int = 2,
      efSearchOverride: Option[Int] = None): DataFrame = {
    require(k > 0 && nprobe > 0)
    import spark.implicits._
    val cents = centroids
    val metric = Metric(p.metric)
    val probes = queries
      .select(col("query_id").cast("long"), col("query_vec").cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val routed = probes.map { case (qid, qv) =>
      val ranked = cents.map { case (c, cv) =>
        val s = metric.sim(qv, cv)
        ((if (s.isNaN) -1.0 else s), c)
      }.sortBy { case (s, c) => (-s, c) }.take(nprobe).map(_._2)
      (qid, qv, ranked)
    }
    val byCell: Map[Int, Array[(Long, Array[Float])]] = routed
      .flatMap { case (qid, qv, cells) => cells.map(c => (c, (qid, qv))) }
      .groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2)) }
    val bc = spark.sparkContext.broadcast(byCell)
    val mid = maintainerId
    val ef = efSearchOverride
    val local = spark.sparkContext
      .makeRDD(0 until numCells, numCells)
      .mapPartitions { cellIds =>
        cellIds.flatMap { cell =>
          val qs = bc.value.getOrElse(cell, Array.empty[(Long, Array[Float])])
          if (qs.isEmpty) Iterator.empty
          else Option(SubIndexPin.get(s"$mid/$cell")).iterator.flatMap { idx =>
            idx.synchronized {
              qs.iterator.flatMap { case (qid, qv) =>
                idx.searchKNN(qv, k, ef).iterator.map { case (id, s) => (qid, id, s) }
              }.toVector
            }.iterator
          }
        }
      }.toDF("query_id", "neighbor_id", "score")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    local.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Total vectors currently held by the pinned cell shards. */
  def indexedCount(): Long = {
    val mid = maintainerId
    spark.sparkContext.makeRDD(0 until numCells, numCells)
      .mapPartitions { cellIds =>
        cellIds.map(cell => Option(SubIndexPin.get(s"$mid/$cell"))
          .map(idx => idx.synchronized(idx.size.toLong)).getOrElse(0L))
      }.sum().toLong
  }

  /** Persist as a BATCH-SERVABLE hybrid model: the exact layout
    * [[IvfHnsw.save]] writes (cell-partitioned graph + params.json +
    * centroids parquet), so `IvfHnsw.load(spark, path)` serves the
    * stream-built index with file-pruned probes — no conversion step. */
  def snapshot(path: String): Unit = {
    val mid = maintainerId
    import spark.implicits._
    val graph = spark.sparkContext.makeRDD(0 until numCells, numCells)
      .mapPartitions { cellIds =>
        cellIds.flatMap { cell =>
          Option(SubIndexPin.get(s"$mid/$cell")).iterator.flatMap { idx =>
            idx.synchronized {
              idx.toRows.map(r => graft.hnsw.PartGraphRow(
                cell, r.id, r.level, r.vector, r.neighbors)).toVector
            }.iterator
          }
        }
      }.toDS()
    new HnswModel(spark, p, graph).save(s"$path/hnsw", cellPartitioned = true)
    centroids.toSeq.toDF("cell", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Drop the pinned shards (every executor). */
  def close(): Unit = {
    val mid = maintainerId
    spark.sparkContext.makeRDD(0 until numCells, numCells)
      .foreachPartition((_: Iterator[Int]) => SubIndexPin.evictModel(mid))
    SubIndexPin.evictModel(mid)
  }
}

object IncrementalIvfIndex {
  /** Start an incremental maintainer from a fitted batch model's
    * centroids (the frozen-quantizer contract). */
  def fromModel(spark: SparkSession, model: IvfHnsw.Model): IncrementalIvfIndex =
    new IncrementalIvfIndex(spark, model.centroids, model.hnsw.params)
}
