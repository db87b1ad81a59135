package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingBridge, HashStubModel}

/** Throughput point for the external-embedding bridge (VERDICT r11 #1):
  * 1M synthetic documents through the batched ModelRunner contract with
  * the deterministic md5 stub standing in for the model, measuring
  *
  *  - rows/s through the bridge at several batch sizes (the contract's
  *    backpressure knob — a real model amortizes per-batch fixed cost,
  *    the stub isolates the PLUMBING's share of the wall), vs
  *  - the pure-Catalyst stub column (whole-stage codegen — the ceiling
  *    the mapPartitions seam gives up), vs
  *  - the bridge composed into downstream work (exact top-k against a
  *    probe set), confirming the seam doesn't break pipeline shape.
  *
  * Digests are asserted equal across every arm (same md5 arithmetic), so
  * the bench is also a 1M-scale bit-identity check.
  *
  * `sbt "runMain graft.bench.BridgeBenchMain 1000000"`
  */
object BridgeBenchMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic docs with realistic text sizes (~40 words), parqueted so
    // every arm pays the same scan
    val tmp = java.nio.file.Files.createTempDirectory("bridge").toString
    spark.range(n).toDF("doc_id")
      .withColumn("text", concat(lit("doc "), col("doc_id").cast("string"),
        lit(" "),
        expr("repeat(concat('tok', cast(doc_id % 997 as string), ' '), " +
          "cast(pmod(hash(doc_id), 60) + 10 as int))")))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")
    println(s"BRIDGE corpus n=${docs.count()} dim=$dim")

    def timed(what: String)(df: org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      // order-free digest over every component: forces full evaluation
      // and pins bit-identity across arms
      val d = df.select(
          expr("aggregate(embedding, 0L, (a, x) -> a + cast(x * 1e6 as long))")
            .as("s"))
        .agg(sum("s")).first().getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"BRIDGE $what wall=$wall%.1fs rows_per_s=${n / wall}%.0f digest=$d")
      d
    }

    val viaColumn = timed("catalyst_column") {
      docs.select(col("doc_id"),
        EmbeddingBridge.stubEmbedColumn(col("text"), dim).as("embedding"))
    }
    for (bs <- Seq(16, 256, 4096)) {
      val d = timed(s"bridge_bs$bs") {
        EmbeddingBridge.embed(docs, new HashStubModel(dim), batchSize = bs)
      }
      require(d == viaColumn, s"bridge bs=$bs digest drifted")
    }

    // composed serving: bridge → exact cosine top-5 for 8 probes
    val emb = EmbeddingBridge.embed(docs, new HashStubModel(dim),
      batchSize = 256)
    val probes = emb.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("embedding").as("query_vec"))
    val t0 = System.nanoTime()
    val kn = graft.operators.KnnJoin.exactKnnJoin(
      emb, probes, k = 5, metric = "cosine", baseId = "doc_id",
      scoreDigits = 6).count()
    println(f"BRIDGE knn_compose wall=${(System.nanoTime() - t0) / 1e9}%.1fs rows=$kn")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
