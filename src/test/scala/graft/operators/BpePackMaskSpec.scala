package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpePackMaskSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def model = Bpe.BpeModel(Array.empty, "</w>")

  test("packTokensMasked: mask boundaries coincide with doc_spans; " +
      "masked count conserves the flagged docs' tokens exactly") {
    val docs = Seq(
      (1L, 1, "aa bb cc"), (2L, 0, "dd ee"), (3L, 1, "ff"),
      (4L, 0, "gg hh ii jj"), (5L, 1, "kk ll")
    ).toDF("doc_id", "m", "text")
      .withColumn("toks", split(col("text"), " "))
    val packed = Bpe.packTokensMasked(docs, seqLen = 4, lit("train"),
      col("toks"), col("m")).orderBy("seq_id").collect()

    val masks = Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 1)
    packed.foreach { r =>
      val mask = r.getSeq[Int](r.fieldIndex("loss_mask"))
      val spans = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("doc_spans"))
      // the mask at every position equals its covering span's doc flag
      spans.foreach { s =>
        val (d, st, ln) = (s.getLong(0), s.getInt(1), s.getInt(2))
        (st until st + ln).foreach { p =>
          assert(mask(p) == masks(d),
            s"seq ${r.getLong(1)} pos $p: mask ${mask(p)} != doc $d flag")
        }
      }
      // spans tile the sequence, so the mask has no unattributed slot
      assert(spans.map(_.getInt(2)).sum == r.getLong(2))
    }
    // global conservation: sum of mask == total tokens of flagged docs
    val maskedTotal = packed.map(_.getSeq[Int](4).sum).sum
    assert(maskedTotal == 3 + 1 + 2) // docs 1, 3, 5

    // unmasked twin is IDENTICAL apart from the loss_mask column
    val plain = Bpe.packTokens(docs, seqLen = 4, lit("train"), col("toks"))
      .orderBy("seq_id").collect()
    assert(plain.map(_.getSeq[Long](3)).toSeq ==
      packed.map(_.getSeq[Long](3)).toSeq)
  }

  test("packConversationsPadded: role-driven mask, span/mask boundary " +
      "identity, truncation, padding, layout determinism") {
    val L = 64
    // expected token counts straight from the shared greedy encoder
    // (the zero-merge model encodes per character + end-mark)
    def enc(t: String): Int = t.trim.split("\\s+").filter(_.nonEmpty)
      .map(w => Bpe.encodeWordLen(w, model)).sum
    val fixture = Seq(
      (1L, 0L, "system", "be helpful"),
      (1L, 1L, "user", "what is spark"),
      (1L, 2L, "assistant", "a distributed engine"),
      (1L, 3L, "user", "thanks"),
      (1L, 4L, "assistant", "welcome"),
      (2L, 0L, "user", "hello there friend"),
      (2L, 1L, "assistant", "hi"),
      // conversation 3 overflows L mid-assistant-turn
      (3L, 0L, "user", "one two three four five six seven eight"),
      (3L, 1L, "assistant", "nine ten eleven twelve thirteen fourteen")
    )
    val c1Masked = enc("a distributed engine") + enc("welcome")
    val c3User = enc("one two three four five six seven eight")
    assert(enc(fixture.filter(_._1 == 1L).map(_._4).mkString(" ")) < L)
    assert(c3User < L &&
      c3User + enc("nine ten eleven twelve thirteen fourteen") > L)
    val turns = fixture.toDF("conv_id", "turn_ix", "role", "text")

    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.packConversationsPadded(df, model, seqLen = L, lit("train"))
    val out = run(turns).orderBy("conv_id").collect()
    assert(out.length == 3)

    out.foreach { r =>
      val n = r.getLong(3).toInt
      val ids = r.getSeq[Long](4)
      val mask = r.getSeq[Int](5)
      val spans = r.getSeq[org.apache.spark.sql.Row](6)
      assert(ids.length == L && mask.length == L)
      // padding: ids -1 and mask 0 beyond n_tokens
      (n until L).foreach { p =>
        assert(ids(p) == -1L && mask(p) == 0)
      }
      // spans tile [0, n) in order and the mask equals the span's role
      assert(spans.map(_.getInt(3)).sum == n)
      var expect = 0
      spans.foreach { s =>
        assert(s.getInt(2) == expect); expect += s.getInt(3)
        val bit = if (s.getString(1) == "assistant") 1 else 0
        (s.getInt(2) until s.getInt(2) + s.getInt(3)).foreach { p =>
          assert(mask(p) == bit)
        }
      }
    }

    // conv 1: masked tokens = exactly the assistant turns' encodings
    val byConv = out.map(r => r.getLong(2) -> r).toMap
    assert(byConv(1L).getSeq[Int](5).sum == c1Masked)
    // conv 3: truncation at L cuts the assistant turn mid-stream
    assert(byConv(3L).getLong(3) == L.toLong)
    assert(byConv(3L).getSeq[Int](5).sum == L - c3User)
    val spans3 = byConv(3L).getSeq[org.apache.spark.sql.Row](6)
    assert(spans3.map(_.getInt(3)).toSeq == Seq(c3User, L - c3User),
      "the overflowing turn must be cut at the window")

    // layout determinism
    val a = out.map(r => (r.getLong(2), r.getSeq[Long](4), r.getSeq[Int](5)))
    val b = run(turns.repartition(7)).orderBy("conv_id").collect()
      .map(r => (r.getLong(2), r.getSeq[Long](4), r.getSeq[Int](5)))
    assert(a.toSeq == b.toSeq)
  }

  test("masked pack ships through SequenceExport with mask conservation " +
      "in the audit") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 100)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("m", (pmod(col("doc_id"), lit(2)) === 0).cast("int"))
    val packed = Bpe.packTokensMasked(docs, seqLen = 64,
      when(pmod(col("doc_id"), lit(3)) === 0, "val").otherwise("train"),
      col("toks"), col("m"))
    val dir = java.nio.file.Files.createTempDirectory("seqmask").toString
    SequenceExport.write(packed, dir, rowsPerShard = 16)
    assert(SequenceExport.verify(spark, dir).isEmpty)
    // the audit's mask_sum is real (non-zero) and conserves the total
    val auditMask = spark.read.parquet(s"$dir/audit")
      .agg(sum("mask_sum")).first().getLong(0)
    val wantMask = packed
      .agg(sum(expr("aggregate(loss_mask, 0L, (a, x) -> a + x)")))
      .first().getLong(0)
    assert(auditMask == wantMask && auditMask > 0)
    // a mask flip in the shipped shards is caught: tamper one shard's
    // audit mask_sum
    val audit = spark.read.parquet(s"$dir/audit").collect()
    val schema = spark.read.parquet(s"$dir/audit").schema
    val tampered = audit.zipWithIndex.map { case (r, i) =>
      if (i == 0)
        org.apache.spark.sql.Row(r.get(0), r.get(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6) + 1)
      else r
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(tampered.toSeq), schema)
      .write.mode("overwrite").parquet(s"$dir/audit")
    assert(SequenceExport.verify(spark, dir).count() == 1)
  }

  test("packTokensMasked: a NULL or out-of-domain mask throws with the " +
      "offending id, instead of shipping null loss_mask entries") {
    val bad = Seq((1L, Some(1), "aa bb"), (2L, None, "cc dd"))
      .toDF("doc_id", "m", "text")
      .withColumn("toks", split(col("text"), " "))
    val e = intercept[Exception] {
      Bpe.packTokensMasked(bad, seqLen = 4, lit("train"),
        col("toks"), col("m")).collect()
    }
    assert(e.getMessage.contains("mask must be 0/1"))

    val oob = Seq((1L, 1, "aa bb"), (2L, 7, "cc dd"))
      .toDF("doc_id", "m", "text")
      .withColumn("toks", split(col("text"), " "))
    val e2 = intercept[Exception] {
      Bpe.packTokensMasked(oob, seqLen = 4, lit("train"),
        col("toks"), col("m")).collect()
    }
    assert(e2.getMessage.contains("mask must be 0/1"))
  }
}
