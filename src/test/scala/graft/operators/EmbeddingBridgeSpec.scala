package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Test double that records its lifecycle into a shared (same-JVM in
  * local mode) companion ledger: batch sizes seen, open/close counts. */
class RecordingStubModel(dim: Int) extends HashStubModel(dim) {
  override def open(): Unit = RecordingStubModel.opens.incrementAndGet()
  override def close(): Unit = RecordingStubModel.closes.incrementAndGet()
  override def embedBatch(texts: Array[String]): Array[Array[Float]] = {
    RecordingStubModel.batchSizes.add(texts.length)
    super.embedBatch(texts)
  }
}
object RecordingStubModel {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  def reset(): Unit = { opens.set(0); closes.set(0); batchSizes.clear() }
}

/** A runner violating the one-vector-per-text contract. */
class ShortModel extends ModelRunner {
  val dim = 4
  def embedBatch(texts: Array[String]): Array[Array[Float]] =
    texts.drop(1).map(_ => Array.fill(4)(0f))
}

/** A runner violating the dim contract. */
class WrongDimModel extends ModelRunner {
  val dim = 4
  def embedBatch(texts: Array[String]): Array[Array[Float]] =
    texts.map(_ => Array.fill(3)(0f))
}

class EmbeddingBridgeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("text").isNotNull)
    .select("doc_id", "text")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

  test("stub runner ≡ stub column bit-for-bit, invariant to batch size " +
      "and partitioning — the cross-engine identity the oracle rides on") {
    val viaColumn = asMap(docs.select(col("doc_id"),
      EmbeddingBridge.stubEmbedColumn(col("text"), 8).as("e")))
    for (bs <- Seq(1, 3, 64, 100000); parts <- Seq(1, 7)) {
      val viaBridge = asMap(EmbeddingBridge.embed(
        docs.repartition(parts), new HashStubModel(8), batchSize = bs))
      assert(viaBridge == viaColumn, s"batchSize=$bs parts=$parts")
    }
  }

  test("backpressure and lifecycle: batches never exceed batchSize, " +
      "open/close bracket every partition exactly once") {
    RecordingStubModel.reset()
    val parts = 3
    val n = docs.count()
    val out = EmbeddingBridge.embed(
      docs.repartition(parts), new RecordingStubModel(4), batchSize = 7)
    assert(out.count() == n)
    import scala.jdk.CollectionConverters._
    val sizes = RecordingStubModel.batchSizes.asScala.toSeq
    assert(sizes.nonEmpty && sizes.forall(_ <= 7),
      s"a batch exceeded the backpressure bound: ${sizes.max}")
    assert(sizes.sum == n, "every text embedded exactly once")
    // one open and one close per partition (count() runs one pass)
    assert(RecordingStubModel.opens.get() == parts)
    assert(RecordingStubModel.closes.get() == parts)
    // at most one short batch per partition: the grouped iterator fills
    // every batch except each partition's last
    assert(sizes.count(_ < 7) <= parts)
  }

  test("contract violations fail loudly: wrong vector count, wrong dim") {
    val e1 = intercept[Exception] {
      EmbeddingBridge.embed(docs, new ShortModel, batchSize = 16).count()
    }
    assert(e1.getMessage.contains("vectors for")
      || Option(e1.getCause).exists(_.getMessage.contains("vectors for")))
    val e2 = intercept[Exception] {
      EmbeddingBridge.embed(docs, new WrongDimModel, batchSize = 16).count()
    }
    assert(e2.getMessage.contains("contract says")
      || Option(e2.getCause).exists(_.getMessage.contains("contract says")))
  }

  test("streaming path: readStream → embed → memory sink equals the " +
      "batch run (same transform, no second code path)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val want = asMap(EmbeddingBridge.embed(
      docs, new HashStubModel(6), batchSize = 32))
    val stream = MemoryStream[(Long, String)]
    val q = EmbeddingBridge.embed(
        stream.toDF.toDF("doc_id", "text"), new HashStubModel(6),
        batchSize = 32)
      .writeStream.format("memory").queryName("bridge_stream")
      .outputMode("append").start()
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val (h1, h2) = all.splitAt(all.length / 2)
    stream.addData(h1.toSeq); q.processAllAvailable()
    stream.addData(h2.toSeq); q.processAllAvailable()
    val got = spark.table("bridge_stream").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    q.stop()
    assert(got == want)
  }

  test("composition: bridge embeddings feed the exact kNN unchanged and " +
      "match the column-path kNN exactly") {
    val viaBridge = EmbeddingBridge.embed(
      docs, new HashStubModel(16), batchSize = 64)
    val viaColumn = docs.select(col("doc_id"),
      EmbeddingBridge.stubEmbedColumn(col("text"), 16).as("embedding"))
    def knn(base: org.apache.spark.sql.DataFrame) =
      KnnJoin.exactKnnJoin(base,
          base.filter(col("doc_id") < 5)
            .select(col("doc_id").as("query_id"),
              col("embedding").as("query_vec")),
          k = 5, metric = "cosine", baseId = "doc_id", scoreDigits = 6)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    assert(knn(viaBridge) == knn(viaColumn))
  }
}
