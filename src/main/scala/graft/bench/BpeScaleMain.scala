package graft.bench

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** BPE tokenizer-training scale point on the shared Zipf corpus
  * generator: the corpus pays one word-count aggregation (distributed),
  * the merge loop runs on the bounded word-TYPE table (driver), and
  * application streams with a per-partition word memo. Records the
  * split between the corpus-bound and vocabulary-bound phases — the
  * claim that corpus size only enters through the one aggregation.
  *
  * `sbt "runMain graft.bench.BpeScaleMain 1000000 80 50000 500"`
  */
object BpeScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val len = if (args.length > 1) args(1).toInt else 80
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val merges = if (args.length > 3) args(3).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("bpescale").toString
    TextIndexScaleMain.corpus(spark, n, len, vocab)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")

    val t0 = System.nanoTime()
    val model = Bpe.train(docs, numMerges = merges)
    val trainS = (System.nanoTime() - t0) / 1e9
    println(f"BPE-SCALE train n=$n tokens~${n * len} merges=${model.merges.length} " +
      f"wall=$trainS%.1fs")

    val t1 = System.nanoTime()
    val agg = Bpe.tokenStats(docs, model)
      .agg(org.apache.spark.sql.functions.sum("n_words"),
        org.apache.spark.sql.functions.sum("n_bpe_tokens")).first()
    val applyS = (System.nanoTime() - t1) / 1e9
    val (w, t) = (agg.getLong(0), agg.getLong(1))
    println(f"BPE-SCALE apply wall=$applyS%.1fs rate=${n / applyS}%.0f docs/s " +
      f"words=$w bpe_tokens=$t tokens_per_word=${t.toDouble / w}%.2f")

    // the LAST MILE at scale: full encode → vocab ids → straddle-packed
    // 2048-token training sequences; conservation asserted against the
    // tokenStats total above (any drop/dup in the explode-pack shuffle
    // would break the exact integer equality)
    val t2 = System.nanoTime()
    val split = org.apache.spark.sql.functions.when(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(10)) < 8, "train")
      .otherwise("heldout")
    val seqs = Bpe.packSequences(docs, model, seqLen = 2048, split)
      .groupBy("split")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("seqs"),
        org.apache.spark.sql.functions.sum("n_tokens").as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val packS = (System.nanoTime() - t2) / 1e9
    val packed = seqs.map(_._3).sum
    println(f"BPE-SCALE pack wall=$packS%.1fs rate=${n / packS}%.0f docs/s " +
      f"(${t / packS}%.0f tokens/s) " +
      seqs.map { case (s, c, tk) => s"$s:${c}seq/${tk}t" }.mkString(" "))
    require(packed == t,
      s"token conservation: packed $packed != encoded $t")
    spark.stop()
  }
}
