package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SequenceExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  test("write → read round-trips every sequence, shards are dense " +
      "seq_id ranges, and the audit verifies clean") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 80)
    val model = Bpe.train(docs, numMerges = 30)
    val split = when(pmod(col("doc_id"), lit(2)) === 0, "train")
      .otherwise("val")
    val packed = Bpe.packSequences(docs, model, seqLen = 64, split)
    val dir = java.nio.file.Files.createTempDirectory("seqexp").toString
    SequenceExport.write(packed, dir, rowsPerShard = 16)

    // round trip: identical sequence set
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("split", "seq_id", "n_tokens", "token_ids").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[Long](3))).toSet
    assert(key(SequenceExport.read(spark, dir)) == key(packed))

    // shard assignment is the dense integral rule
    val bad = SequenceExport.read(spark, dir)
      .filter(col("shard").cast("long") =!= expr("seq_id DIV 16L"))
      .count()
    assert(bad == 0L)

    // audit verifies clean on the intact artifact
    assert(SequenceExport.verify(spark, dir).isEmpty)

    // a tampered audit (one shard's token sum off by one) is caught
    val audit = spark.read.parquet(s"$dir/audit").collect()
    val schema = spark.read.parquet(s"$dir/audit").schema
    val tampered = audit.zipWithIndex.map { case (r, i) =>
      if (i == 0)
        org.apache.spark.sql.Row(r.get(0), r.get(1), r.getLong(2),
          r.getLong(3) + 1, r.getLong(4), r.getLong(5), r.getLong(6))
      else r
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(tampered.toSeq), schema)
      .write.mode("overwrite").parquet(s"$dir/audit")
    val mism = SequenceExport.verify(spark, dir).collect()
    assert(mism.length == 1, "exactly the tampered shard must surface")
  }

  test("shuffled: seeded dense permutation per split — deterministic " +
      "across layouts, distinct per seed, and the shuffled export's " +
      "audit conserves exactly the packed corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 120)
    val model = Bpe.train(docs, numMerges = 30)
    val split = when(pmod(col("doc_id"), lit(2)) === 0, "train")
      .otherwise("val")
    val packed = Bpe.packSequences(docs, model, seqLen = 64, split)

    def omap(df: org.apache.spark.sql.DataFrame) =
      df.select("split", "seq_id", "order_id").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e0 = omap(SequenceExport.shuffled(packed))
    // dense 0-based permutation per split
    e0.keys.map(_._1).toSet.foreach { s: String =>
      val ords = e0.collect { case ((sp, _), o) if sp == s => o }.toSeq
      assert(ords.sorted == (0L until ords.size).toSeq)
    }
    // pure function of (seed, data): any layout reproduces it
    assert(omap(SequenceExport.shuffled(packed.repartition(7))) == e0)
    // a different seed is a different permutation
    assert(omap(SequenceExport.shuffled(packed, "epoch1:")) != e0)
    // and not the identity (pack order must not leak through)
    assert(e0.exists { case ((_, seqId), o) => seqId != o })

    // shuffled export: shards derive from order_id; audit still
    // verifies clean, and per-split digests equal the unshuffled
    // export's (the artifact is exactly a permutation of the pack)
    val d1 = java.nio.file.Files.createTempDirectory("seqshuf").toString
    val d2 = java.nio.file.Files.createTempDirectory("seqplain").toString
    SequenceExport.write(SequenceExport.shuffled(packed), d1,
      rowsPerShard = 16, ordCol = "order_id")
    SequenceExport.write(packed, d2, rowsPerShard = 16)
    assert(SequenceExport.verify(spark, d1).isEmpty)
    def bySplit(p: String) = spark.read.parquet(s"$p/audit")
      .groupBy("split").agg(sum("n_sequences").as("s"),
        sum("n_tokens_sum").as("t"), sum("id_sum").as("i"),
        sum("span_sum").as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(bySplit(d1) == bySplit(d2))
  }
}
