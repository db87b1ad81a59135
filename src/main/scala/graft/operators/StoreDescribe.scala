package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-row observability contract for every PERSISTED index store
  * (VERDICT r10 #7): the 100 TB serving cost model prices bytes/query
  * and compaction cadence from fit-time constants, but operating a
  * fleet of indexes needs those numbers QUERYABLE from the store
  * itself — bytes on disk, live/deleted rows, epoch count, growth past
  * the frozen quantizer — without recomputing a fit or reading code
  * internals. Each store object exposes `describe()` returning exactly
  * one [[StoreDescription]] row; a fleet dashboard is a `union` of
  * them (schemas are identical by construction).
  *
  * Fields every store fills the same way:
  *  - `live_rows` / `deleted_rows` — rows serving / in the delete
  *    vector awaiting compaction;
  *  - `epochs` — append generations since the last compaction (1 =
  *    freshly built/compacted);
  *  - `bytes_on_disk` — the store's whole footprint (all parts);
  *  - `growth_since_fit` — live rows / quantizer-fit rows; None where
  *    the store has no trained quantizer (text, image-hash);
  *  - `needs_compaction` — the store's OWN trigger rule, evaluated
  *    (growth factor for quantized stores; pending deletes or epoch
  *    spread for the others);
  *  - `detail` — kind-specific `k=v` pairs (cells, dim, avgdl, …).
  */
case class StoreDescription(
    store_kind: String,
    location: String,
    family: String,
    live_rows: Long,
    deleted_rows: Long,
    epochs: Long,
    bytes_on_disk: Long,
    growth_since_fit: Option[Double],
    needs_compaction: Boolean,
    detail: String)

object StoreDescribe {

  /** Total bytes under `path` (0 when the path does not exist). */
  def pathBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Bytes under a catalog TABLE's storage location (0 when the table
    * does not exist). */
  def tableBytes(spark: SparkSession, table: String): Long = {
    if (!spark.catalog.tableExists(table)) return 0L
    val loc = spark.sql(s"DESCRIBE FORMATTED $table")
      .where("col_name = 'Location'")
      .collect().headOption.map(_.getString(1))
    loc.map(pathBytes(spark, _)).getOrElse(0L)
  }

  /** Count of `epoch=*` children under `path` (0 when missing). */
  def epochDirs(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).count(_.getPath.getName.startsWith("epoch=")).toLong
  }

  def toDf(spark: SparkSession, d: StoreDescription): DataFrame = {
    import spark.implicits._
    Seq(d).toDS().toDF()
  }
}
