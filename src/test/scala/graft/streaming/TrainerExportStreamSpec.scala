package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Mixing, SequenceExport}

class TrainerExportStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def doc(i: Long): (Long, String, String) = {
    val words = (0 until (4 + (i % 5)).toInt)
      .map(j => s"w${(i * 11 + j * 3) % 40}")
    (i, s"src${i % 3}", words.mkString(" "))
  }

  // sized so epoch 0 drains src2 fully, epoch 1 still ships src0/src1
  // (per-domain supply is ~60 tokens per 30-doc batch)
  private val budgets = Map("src0" -> 150L, "src1" -> 100L, "src2" -> 60L)
  private val seqLen = 16

  // frozen tokenizer artifacts, trained on a seed slice (the production
  // shape: tokenizer fit offline, the stream only applies it)
  private lazy val seedDocs =
    (100L until 140L).map(doc).toDF("doc_id", "source", "text")
  private lazy val model = Bpe.train(seedDocs, numMerges = 40)
  private lazy val dict = Bpe.vocabTable(
    Bpe.encodeTokens(seedDocs, model)).select("token", "id").cache()

  private def splitOf(df: DataFrame) =
    when(pmod(col("doc_id"), lit(4)) === 0, "heldout").otherwise("train")

  private def shippedRows(path: String): Set[Seq[Any]] =
    TrainerExportStream.sequences(spark, path)
      .select(col("epoch"), col("split"), col("seq_id"), col("n_tokens"),
        col("token_ids"), expr("transform(doc_spans, x -> x.doc_id)"))
      .collect().map(_.toSeq).toSet

  test("streaming mix→pack→export: drain across epochs, audits green, " +
      "and a kill between sequences and audit replays bit-identically") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = (0L until 30L).map(doc)
    val b2 = (30L until 60L).map(doc)

    def runStream(path: String, ckpt: String,
        inject: Boolean): Set[Seq[Any]] = {
      val source = MemoryStream[(Long, String, String)]
      val docsDf = source.toDF().toDF("doc_id", "source", "text")
      def start() = TrainerExportStream.start(docsDf, path, ckpt,
        "source", budgets, model, dict, seqLen, splitOf, rowsPerShard = 4)
      val q1 = start()
      source.addData(b1: _*)
      q1.processAllAvailable(); q1.stop()

      if (inject) {
        // the kill window: epoch 1's sequences exist, audit does not —
        // exactly what a JVM death between the two writes leaves
        Seq(("train", 999L, 999L, Array(999L)))
          .toDF("split", "seq_id", "n_tokens", "token_ids")
          .withColumn("shard", lit(0L))
          .write.mode("overwrite").partitionBy("split", "shard")
          .parquet(s"$path/epochs/epoch=1/sequences")
        // torn epochs are invisible to every reader
        assert(!TrainerExportStream.sequences(spark, path)
          .select("epoch").distinct().collect().map(_.getLong(0))
          .contains(1L))
      }

      val q2 = start()
      source.addData(b2: _*)
      q2.processAllAvailable(); q2.stop()
      assert(TrainerExportStream.verifyAll(spark, path).isEmpty,
        "conservation audit must be green across epochs")
      shippedRows(path)
    }

    val tmp = java.nio.file.Files.createTempDirectory("tex").toString
    val clean = runStream(s"$tmp/clean", s"$tmp/ckpt-clean", inject = false)
    val replayed = runStream(s"$tmp/killed", s"$tmp/ckpt-killed",
      inject = true)
    assert(replayed == clean,
      "kill+replay must converge bit-identically to the clean run")
    assert(clean.nonEmpty && clean.exists(_.head == 1L),
      "both epochs must have shipped")

    // budget drain: stream-long per-domain selection lands in
    // [min(budget, supply), budget + max_doc) — and the describe row
    // agrees with the shipped artifact
    val all = (b1 ++ b2).toDF("doc_id", "source", "text")
    val supply = all.groupBy("source")
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val drained = Mixing.describe(spark, s"$tmp/clean/mix", budgets)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    budgets.foreach { case (d, b) =>
      val got = drained(d)
      assert(got >= math.min(b, supply(d)) && got < b + 10,
        s"$d drained $got outside [min($b,${supply(d)}), $b+maxdoc)")
    }
  }

  test("single-epoch stream equals the independent batch primitives " +
      "bit for bit (mix + frozen pack + export composed by hand)") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0L until 40L).map(doc)
    val tmp = java.nio.file.Files.createTempDirectory("texb").toString

    // streaming, one batch
    val source = MemoryStream[(Long, String, String)]
    val q = TrainerExportStream.start(
      source.toDF().toDF("doc_id", "source", "text"),
      s"$tmp/stream", s"$tmp/ckpt", "source", budgets, model, dict,
      seqLen, splitOf, rowsPerShard = 4)
    source.addData(data: _*)
    q.processAllAvailable(); q.stop()

    // batch primitives, composed by hand
    val docsDf = data.toDF("doc_id", "source", "text")
    val sel = Mixing.tokenBudget(docsDf, "source",
      size(split(trim(col("text")), "\\s+")).cast("long"), budgets)
    val mixed = docsDf.join(sel.select("doc_id"), Seq("doc_id"), "left_semi")
    val packed = Bpe.packSequencesFrozen(mixed, model, seqLen,
      splitOf(mixed), dict)
    SequenceExport.write(packed, s"$tmp/batch", rowsPerShard = 4)

    def rows(df: DataFrame) = df
      .select(col("split"), col("seq_id"), col("n_tokens"),
        col("token_ids"), expr("transform(doc_spans, x -> x.doc_id)"))
      .collect().map(_.toSeq).toSet
    assert(rows(TrainerExportStream.sequences(spark, s"$tmp/stream")) ==
      rows(SequenceExport.read(spark, s"$tmp/batch")))
  }

  test("frozen dictionary: out-of-vocabulary symbols pack as the UNK id, " +
      "token counts conserve") {
    // 'zq' never appears in the seed corpus, so its symbols fall outside
    // the frozen dictionary
    val docs = Seq((1L, "w0 zq w1")).toDF("doc_id", "text")
    val packed = Bpe.packSequencesFrozen(docs, model, 64, lit("train"),
      dict).collect()
    val ids = packed.flatMap(_.getSeq[Long](3))
    assert(ids.contains(-2L), "OOV symbols must map to unkId")
    val total = Bpe.tokenStats(docs, model)
      .agg(sum("n_bpe_tokens")).first().getLong(0)
    assert(packed.map(_.getLong(2)).sum == total,
      "conservation must include UNK tokens")
  }
}
