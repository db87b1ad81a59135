package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance-resampling SCALE point: the published LLM
  * data-selection recipe over the Zipf corpus generator shared with the
  * text scale benches. The pipeline is one tokenize/explode pass, two
  * B-row model aggregations (B = hash buckets, a constant), one
  * broadcast join, an exact-integer per-doc sum, and a distributed
  * top-n — so wall should scale linearly in corpus tokens with a
  * vocabulary-independent model side. This bench records that shape
  * and the selection skew (how much likelier a target-like doc is to
  * be kept than a background doc).
  *
  * Target construction: docs with doc_id ≡ 0..1 (mod 20) get a planted
  * topical token block appended, and the TARGET set is a disjoint
  * slice (doc_id ≡ 2..3 mod 20) carrying the same block — so selection
  * must generalize by content, not membership.
  *
  * `sbt "runMain graft.bench.DsirScaleMain 1000000 80 50000 1024"`
  */
object DsirScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val len = if (args.length > 1) args(1).toInt else 80
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val buckets = if (args.length > 3) args(3).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val topical = (0 until 12).map(i => s"topic$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("dsirscale").toString
    TextIndexScaleMain.corpus(spark, n, len, vocab)
      .withColumn("slot", pmod(col("doc_id"), lit(20)))
      .withColumn("text",
        when(col("slot") < 4, concat(col("text"), lit(" " + topical)))
          .otherwise(col("text")))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")

    val isTarget = col("slot") >= 2 && col("slot") < 4 // 10%, content-like
    val keep = (n / 10).toInt // select 10% of the corpus

    val t0 = System.nanoTime()
    val sel = Dsir.select(docs, isTarget, n = keep, buckets = buckets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wall = (System.nanoTime() - t0) / 1e9
    // how the selection splits: planted-but-not-target (slot 0..1,
    // content twins of the target) vs background
    val slotOf = (id: Long) => id % 20
    val twinIds = sel.count(id => slotOf(id) < 2)
    val targetIds = sel.count(id => slotOf(id) >= 2 && slotOf(id) < 4)
    val bgIds = sel.size - twinIds - targetIds
    val twinRate = twinIds.toDouble / (n / 10)   // of all twin docs
    val bgRate = bgIds.toDouble / (n * 0.8)      // of all background docs
    println(f"DSIR-SCALE n=$n tokens~${n * len} buckets=$buckets keep=$keep " +
      f"wall=$wall%.1fs rate=${n / wall}%.0f docs/s")
    println(f"DSIR-SCALE selected: content-twins=$twinIds (rate=$twinRate%.3f) " +
      f"target-members=$targetIds background=$bgIds (rate=$bgRate%.4f) " +
      f"skew=${twinRate / math.max(bgRate, 1e-12)}%.0fx")
    spark.stop()
  }
}
