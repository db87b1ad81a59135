package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bridge to an EXTERNAL embedding model — the one kernel class a pure
  * relational engine cannot express: every vector operator in the engine
  * (all 13 ANN families, semantic dedup, hard-negative mining) consumes
  * an embedding column, and in production that column comes from model
  * inference, not from pre-provisioned parquet. The reference leaves
  * exactly this seam open as an injected extension point
  * (`similarityFunction`, src/main.ts:37-45); at corpus scale the seam
  * is inference, so the bridge is its scaled analog.
  *
  * Contract (the Arrow-UDF shape, JVM-native):
  *
  *  - [[ModelRunner.embedBatch]] receives AT MOST `batchSize` texts per
  *    call and returns one `dim`-length vector per text, in order.
  *    Batching is how real inference amortizes (tokenizer + forward
  *    pass); `batchSize` is also the BACKPRESSURE bound — the bridge
  *    materializes at most one batch of rows per partition at a time
  *    (lazy `Iterator.grouped`), so executor memory is bounded by
  *    batch x row size regardless of partition size.
  *  - [[ModelRunner.open]]/[[ModelRunner.close]] bracket each partition:
  *    weight loading / session teardown happen once per partition, not
  *    per row (the `mapPartitions` lifecycle every external-resource
  *    integration needs).
  *  - The bridge never shuffles: embedding is a partition-local map, so
  *    at 100 TB it scales with the scan and the model's throughput.
  *    Inference is genuinely imperative work — the documented
  *    last-resort `mapPartitions` tier, kept to exactly this seam.
  *  - The SAME transform runs unchanged on a STREAMING frame
  *    (mapPartitions is stateless), so `readStream → embed → writeStream`
  *    needs no second code path (spec-pinned via MemoryStream).
  *
  * Determinism gate: [[HashStubModel]] is a deterministic stand-in whose
  * output is a pure md5 fixed-point function of the text — bit-identical
  * across partitionings, batch sizes and engines — so bridge-composed
  * pipelines are full DuckDB-oracle-checkable (`bridge_knn`) and a real
  * model can be dropped in without touching the plumbing.
  */
trait ModelRunner extends Serializable {
  /** Embedding width; every returned vector must have this length. */
  def dim: Int
  /** Called once per partition before the first batch. */
  def open(): Unit = {}
  /** Called once per partition after the last batch (also on empty
    * partitions that were opened). */
  def close(): Unit = {}
  /** One inference call: `texts.length <= batchSize`; must return
    * exactly one `dim`-length vector per input, in input order. */
  def embedBatch(texts: Array[String]): Array[Array[Float]]
}

/** Deterministic md5 fixed-point stub: component j of a text's embedding
  * is `((md5_60("emb:<j>:<text>") % 2000001) - 1000000) / 1e6` computed
  * in double then narrowed to float — the exact arithmetic of
  * [[EmbeddingBridge.stubEmbedColumn]] and of the DuckDB oracle
  * (`('0x' || substr(md5(...),1,15))::BIGINT`), so the JVM runner, the
  * Catalyst column and the oracle agree bit-for-bit. */
class HashStubModel(val dim: Int) extends ModelRunner {
  override def embedBatch(texts: Array[String]): Array[Array[Float]] =
    texts.map { t =>
      Array.tabulate(dim) { j =>
        (((HashStubModel.md5Long60(s"emb:$j:$t") % 2000001L) - 1000000L)
          / 1e6).toFloat
      }
    }
}

object HashStubModel {
  /** JVM twin of [[graft.Qutil.md5Long60]]: first 15 hex chars of the
    * UTF-8 md5, parsed base 16 (60 bits, non-negative). */
  def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }
}

object EmbeddingBridge {

  /** (idCol, textCol) → (idCol, embedding array<float>) through `runner`
    * in batches of at most `batchSize` texts. Partition-local (no
    * shuffle, no driver round-trip); memory bounded by one batch. */
  def embed(docs: DataFrame, runner: ModelRunner, batchSize: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val spark = docs.sparkSession
    val dim = runner.dim
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        runner.open()
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; runner.close() }
        // a limit/take may stop consuming mid-partition — the task
        // completion listener guarantees teardown regardless
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        val out = it.grouped(batchSize).flatMap { batch =>
          val texts = batch.iterator.map(_._2).toArray
          val vecs = runner.embedBatch(texts)
          require(vecs.length == texts.length,
            s"model returned ${vecs.length} vectors for ${texts.length} texts")
          vecs.foreach(v => require(v.length == dim,
            s"model returned a ${v.length}-dim vector, contract says $dim"))
          batch.iterator.map(_._1).zip(vecs.iterator)
        }
        new Iterator[(Long, Array[Float])] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): (Long, Array[Float]) = out.next()
        }
      }
      .toDF(idCol, "embedding")
  }

  /** The [[HashStubModel]] arithmetic as a pure Catalyst column (stays
    * inside whole-stage codegen — the zero-model fast path, and the
    * bit-identity pin for the runner). */
  def stubEmbedColumn(textCol: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      (((graft.Qutil.md5Long60(
          concat(lit("emb:"), j.cast("string"), lit(":"), textCol))
        % 2000001L) - 1000000L) / 1e6).cast("float"))
}
