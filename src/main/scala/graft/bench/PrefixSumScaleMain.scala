package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GroupedPrefixSum

/** Scale point for the sequence-packing prefix sum (VERDICT r10 #1/#2):
  * the grouped running sum over a 3-way train/val/test split, two-phase
  * GroupedPrefixSum (range sort + per-partition partials + broadcast
  * offsets) vs the `PARTITION BY split` window whose 3 partitions
  * funnel ~80% of the corpus through ONE task. Both arms produce the
  * identical pack assignment (asserted on a seeded sample + global
  * aggregates — a full collect at this n would be the driver
  * bottleneck the operators avoid).
  *
  * At battery scale the window wins (one tiny job); the crossover this
  * main measures is the design point: wall vs n for both arms, plus the
  * window arm's MAX TASK input fraction (the quantity that breaks at
  * 100×, visible long before the wall does).
  *
  * `sbt "runMain graft.bench.PrefixSumScaleMain 100000000"`
  */
object PrefixSumScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (doc_id, split 8/1/1, n_tokens) — the packing stage's exact input
    // shape, written to parquet so both arms pay the same scan
    val tmp = java.nio.file.Files.createTempDirectory("psum").toString
    val cb = pmod(graft.Qutil.md5Long60(
      concat(lit("split:"), col("doc_id"))), lit(10))
    spark.range(n).toDF("doc_id")
      .withColumn("split", when(cb < 8, "train")
        .when(cb === 8, "val").otherwise("test"))
      .withColumn("n_tokens",
        (pmod(hash(col("doc_id")), lit(400)) + 20).cast("long"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/in")
    val in = spark.read.parquet(s"$tmp/in")
    val total = in.count()
    println(s"PSUM corpus n=$total")

    def packs(cum: org.apache.spark.sql.DataFrame) = cum
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")) / 512.0).cast("long"))
    def digest(df: org.apache.spark.sql.DataFrame): (Long, Seq[Any]) = {
      // order-free exact digest: per-split pack count + token sum +
      // a checksum over (doc_id, pack_id)
      val agg = packs(df).groupBy("split").agg(
        countDistinct("pack_id").as("packs"), sum("n_tokens").as("toks"),
        sum(col("pack_id") * col("doc_id") % 1000003L).as("chk"))
        .orderBy("split").collect().toSeq
      (df.count(), agg.map(_.toSeq))
    }
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PSUM $what wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val two = timed("two_phase") {
      digest(GroupedPrefixSum.runningSum(in, "cum", "n_tokens",
        Seq("split"), Seq(col("doc_id"))))
    }
    val wp = Window.partitionBy("split").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val win = timed("window") {
      digest(in.withColumn("cum", sum("n_tokens").over(wp)))
    }
    require(two == win, s"arms disagree:\n$two\n$win")
    // the scale-breaking quantity: the window funnels each split into
    // ONE task — report the largest split's corpus fraction (that task's
    // input) vs the two-phase arm's 1/partitions
    val maxFrac = in.groupBy("split").count()
      .agg(max("count")).first().getLong(0).toDouble / total
    println(f"PSUM identical-digest OK; window max-task fraction=" +
      f"$maxFrac%.3f vs two-phase ${1.0 / cpus.toInt}%.3f")
    spark.stop()
  }
}
