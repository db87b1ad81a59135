package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** B4 streaming fvecs source (reference `streamFvecs`,
  * src/bench/dataset.ts:153-194: chunked read, per-record delivery, early
  * close at the limit).
  *
  * Spark-first shape: Structured Streaming's file source drives the
  * splittable [[FvecsFileFormat]] — each micro-batch discovers newly
  * arrived fvecs files and decodes them with the same byte-split reader
  * the batch path uses, so the streaming and batch scans cannot diverge.
  * The reference's "chunk" knob becomes `maxFilesPerTrigger`.
  *
  * Global `vec_id`s: base offsets re-list the directory per micro-batch,
  * so ids stay stable iff files arrive in lexicographically increasing
  * path order (the standard part-file sink convention; same contract as
  * the multi-file batch reader).
  */
object FvecsStream {

  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Streaming DataFrame over an fvecs directory; new files are picked up
    * per trigger, `maxFilesPerTrigger` files at a time. */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .format(classOf[FvecsFileFormat].getName)
      .schema(schema)
      .option("graft.fvecs.path", dir)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(dir)

  /** `streamFvecs(limit, onRecord)` analog: deliver micro-batches to
    * `onBatch` until at least `limit` rows have been delivered (batches
    * are trimmed so exactly min(limit, available) rows cross), then stop
    * the query — the early-close semantics of the reference's chunked
    * reader (src/bench/dataset.ts:188-191). Returns rows delivered.
    *
    * Delivery is bounded even if more files keep arriving: once the cap
    * is hit, later batches are skipped and the query is stopped from the
    * caller thread (stopping from inside foreachBatch would deadlock the
    * stream execution thread). */
  def ingestWithLimit(spark: SparkSession, dir: String, limit: Long,
      maxFilesPerTrigger: Int = 1)(onBatch: DataFrame => Unit): Long = {
    require(limit > 0, "limit must be positive")
    val delivered = new AtomicLong(0L)
    val q: StreamingQuery = readStream(spark, dir, maxFilesPerTrigger)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val remaining = limit - delivered.get()
        if (remaining > 0) {
          val take = batch.limit(math.min(remaining, Int.MaxValue.toLong).toInt)
            .cache()
          try {
            val n = take.count()
            if (n > 0) onBatch(take.toDF())
            delivered.addAndGet(n)
          } finally { take.unpersist(); () }
        }
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    delivered.get()
  }
}
