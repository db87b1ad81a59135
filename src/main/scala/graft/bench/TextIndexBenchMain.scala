package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextIndex

/** Build-once / serve-many measurement for the persisted BM25 inverted
  * index ([[graft.operators.TextIndex]]). The battery's `bm25_indexed`
  * entry times build + first serve in one number (the fit-included
  * convention every trained-ANN entry follows); the SCALE argument for
  * the index — tokenize the corpus once, not per query — needs the two
  * costs separated:
  *
  *  - build: tokenize + posting aggregation + bucketed write (paid once
  *    at ingest)
  *  - transient: the from-scratch `bm25Ranked` pipeline, which re-runs
  *    corpus tokenization and three corpus-wide aggregations per call
  *  - serve: bucket-pruned posting probe (per query batch; repeated to
  *    show the steady state — serve timings include query-term
  *    derivation from the posting table, which a real caller supplies)
  *
  * Break-even is build / (transient − serve) calls; at 100 TB the
  * transient path is not runnable per query at all, so the honest
  * framing is "serve cost is independent of corpus tokenization cost".
  *
  * `sbt "runMain graft.bench.TextIndexBenchMain /root/testdata/sf0.1 20 32 3"`
  */
object TextIndexBenchMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nq = if (args.length > 1) args(1).toInt else 20
    val buckets = if (args.length > 2) args(2).toInt else 32
    val repeats = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val prefix = "graft_tix_bench"

    val t0 = System.nanoTime()
    TextIndex.build(docs, prefix, numBuckets = buckets)
    val buildS = (System.nanoTime() - t0) / 1e9

    def serveOnce(): (Long, Double) = {
      val queryTerms = spark.table(s"${prefix}_postings")
        .filter(col("doc_id") < nq)
        .select(col("doc_id").as("qid"), col("term"))
      val t = System.nanoTime()
      val cnt = TextIndex.bm25TopDocs(spark, prefix, queryTerms, topk = 10).count()
      (cnt, (System.nanoTime() - t) / 1e9)
    }
    val serves = (1 to repeats).map(_ => serveOnce())

    val t1 = System.nanoTime()
    val transientCnt = graft.TextQueries.bm25Ranked(spark, dir, nq, topk = 10).count()
    val transientS = (System.nanoTime() - t1) / 1e9

    println(f"TEXTINDEX dir=$dir docs=$nDocs buckets=$buckets nq=$nq " +
      f"build=${buildS}%.2fs transient=${transientS}%.2fs (rows=$transientCnt) " +
      serves.zipWithIndex.map { case ((c, s), i) =>
        f"serve${i + 1}=${s}%.2fs(rows=$c)" }.mkString(" "))
    TextIndex.drop(spark, prefix)
    spark.stop()
  }
}
