package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dsir, PplFilter}

/** Measures what the tokenize-once handoff (VERDICT r10 #3) is actually
  * worth, with the box noise controlled: the three perplexity-score
  * input shapes are timed INTERLEAVED in one JVM over the same corpus,
  * several rounds each, so a contention burst hits all arms alike and
  * the medians compare like-for-like (the BASELINE convention: same-run
  * ratios only).
  *
  *   text — score re-splits the text string (the pre-r11 chain shape);
  *   toks — score consumes a carried array<string> token column
  *          (NgramDup trim's `clean_toks` handoff);
  *   grams — score consumes the precomputed array<long> gram-bucket
  *          column (`Dsir.gramBucketsFromToks` materialized at the
  *          previous stage — md5 runs zero times here).
  *
  * Also reports the one-off cost of MAKING each handoff column (extra
  * write wall + bytes on disk), so the chain-level decision is priced
  * end-to-end, not just at the consumer.
  *
  * `sbt "runMain graft.bench.TokenHandoffBenchMain 2000000 40 50000 3"`
  */
object TokenHandoffBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val len = if (args.length > 1) args(1).toInt else 40
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val rounds = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("tokhand").toString

    // the CurationPipelineMain Zipf corpus, minus the twin planting
    val text = concat_ws(" ",
      transform(
        sequence(lit(0), pmod(hash(col("doc_id")), lit(len)) + lit(len / 2)),
        i => concat(lit("t"), floor(pow(lit(vocab.toDouble),
          (pmod(hash(col("doc_id"), i), lit(100000)).cast("double") + 0.5)
            / 100000.0)).cast("long"))))
    spark.range(n).toDF("doc_id").withColumn("text", text)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/text")
    val dText = spark.read.parquet(s"$tmp/text")

    def timed(what: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"TOKHAND $what wall=$w%.2fs")
      w
    }
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().map(_.length()).sum
    }

    // one-off handoff production cost (write wall + bytes)
    timed("make_toks") {
      dText.withColumn("toks", split(trim(col("text")), "\\s+"))
        .write.mode("overwrite").parquet(s"$tmp/toks")
    }
    timed("make_grams") {
      val toked = dText.withColumn("toks", split(trim(col("text")), "\\s+"))
      Dsir.gramBucketsFromToks(toked, col("toks"))
        .select(col("doc_id"), col("bs"))
        .write.mode("overwrite").parquet(s"$tmp/grams")
    }
    println(f"TOKHAND bytes text=${dirBytes(s"$tmp/text")} " +
      f"toks=${dirBytes(s"$tmp/toks")} grams=${dirBytes(s"$tmp/grams")}")
    val dToks = spark.read.parquet(s"$tmp/toks")
    val dGrams = spark.read.parquet(s"$tmp/grams")

    val model = PplFilter.fit(
      dText.filter(pmod(col("doc_id"), lit(20)) < 4))

    def drain(df: DataFrame): Unit = {
      df.agg(sum("ce_fp"), sum("n_grams")).collect(); ()
    }
    val walls = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    var sums = Set.empty[Long]
    (1 to rounds).foreach { r =>
      walls("text") ::= timed(s"score_text r$r") {
        drain(PplFilter.score(dText, model))
      }
      walls("toks") ::= timed(s"score_toks r$r") {
        drain(PplFilter.scoreToks(dToks, col("toks"), model))
      }
      walls("grams") ::= timed(s"score_grams r$r") {
        drain(PplFilter.scoreGrams(dGrams, model))
      }
      // all three arms must agree bit-for-bit (checked once, off-clock)
      if (r == 1) {
        sums = Seq(
          PplFilter.score(dText, model),
          PplFilter.scoreToks(dToks, col("toks"), model),
          PplFilter.scoreGrams(dGrams, model))
          .map(_.agg(sum("ce_fp")).first().getLong(0)).toSet
        require(sums.size == 1, s"arms disagree: $sums")
      }
    }
    def med(xs: List[Double]): Double = xs.sorted.apply(xs.length / 2)
    val mt = med(walls("text")); val mk = med(walls("toks"))
    val mg = med(walls("grams"))
    println(f"TOKHAND medians text=$mt%.2fs toks=$mk%.2fs grams=$mg%.2fs " +
      f"toks/text=${mk / mt}%.2f grams/text=${mg / mt}%.2f " +
      f"(n=$n rounds=$rounds, arms bit-identical)")
    spark.stop()
  }
}
