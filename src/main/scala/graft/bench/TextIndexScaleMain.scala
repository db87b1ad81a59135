package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextIndex

/** BM25 inverted-index SCALE point (the text analog of the vector paths'
  * 1M/10M measurements): a synthetic Zipf corpus far past the sf0.1
  * fixture, measuring
  *
  *  - build: the one-and-only tokenization pass + bucketed posting write
  *    (tokens/sec — the ingest-side cost a 100 TB corpus pays once),
  *  - serve: steady-state bucket-pruned probes (bounded by the query
  *    terms' postings, NOT the corpus),
  *  - transient: the from-scratch `bm25Ranked` pipeline at the same
  *    scale (O(corpus) per call — the thing the index exists to avoid),
  *  - correctness: indexed top-k ≡ transient top-k at scale (same score
  *    arithmetic, bit-identical rounding).
  *
  * The corpus is generated as pure column expressions (deterministic in
  * (doc_id, position), partition-independent): token ranks follow an
  * inverse-CDF Zipf-ish draw r = floor(V^u) (P(rank ≤ r) = log_V r, so
  * p(r) ∝ 1/r — the standard heavy-tail shape of natural text), doc
  * length varies len/2..3len/2 keyed on doc_id.
  *
  * `sbt "runMain graft.bench.TextIndexScaleMain 1000000 80 50000 64 20 3"`
  */
object TextIndexScaleMain {

  /** n docs of ~len tokens over a vocab-sized Zipf-ish vocabulary. */
  def corpus(spark: SparkSession, n: Long, len: Int, vocab: Int): DataFrame =
    spark.range(n).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(
          sequence(lit(0), pmod(hash(col("doc_id")), lit(len)) + lit(len / 2)),
          i => concat(lit("t"), floor(pow(lit(vocab.toDouble),
            (pmod(hash(col("doc_id"), i), lit(100000)).cast("double") + 0.5)
              / 100000.0)).cast("long")))))

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val len = if (args.length > 1) args(1).toInt else 80
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val buckets = if (args.length > 3) args(3).toInt else 64
    val nq = if (args.length > 4) args(4).toInt else 20
    val repeats = if (args.length > 5) args(5).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the corpus to parquet first: build then reads from disk
    // (the honest ingest shape) and the transient path reads the same files
    val tmp = java.nio.file.Files.createTempDirectory("tixscale").toString
    corpus(spark, n, len, vocab)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    val prefix = "graft_tix_scale"

    val t0 = System.nanoTime()
    val stats = TextIndex.build(docs, prefix, numBuckets = buckets)
    val buildS = (System.nanoTime() - t0) / 1e9
    val postings = spark.table(s"${prefix}_postings").count()
    val tokens = (n * stats.avgdl).toLong
    println(f"TEXTINDEX-SCALE build docs=$n tokens=$tokens postings=$postings " +
      f"avgdl=${stats.avgdl}%.1f wall=${buildS}%.1fs " +
      f"rate=${tokens / buildS}%.0f tok/s buckets=$buckets")

    // probe contract: the first nq docs' terms, one query per doc (the
    // same query-set projection the sf benches use)
    val queryTerms = spark.table(s"${prefix}_postings")
      .filter(col("doc_id") < nq)
      .select(col("doc_id").as("qid"), col("term")).cache()
    queryTerms.count()
    var fullPairs = Set.empty[(Long, Long)]
    val serveWalls = (1 to repeats).map { _ =>
      val t = System.nanoTime()
      fullPairs = TextIndex.bm25TopDocs(spark, prefix, queryTerms, topk = 10)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (System.nanoTime() - t) / 1e9
    }
    println(f"TEXTINDEX-SCALE serve nq=$nq rows=${fullPairs.size} " +
      serveWalls.zipWithIndex.map { case (s, i) => f"serve${i + 1}=${s}%.1fs" }
        .mkString(" "))

    // stopword-class pruning: a Zipf query set carries head terms whose
    // posting lists are O(corpus) to read — the lexicon lets the serve
    // path drop them BEFORE the posting scan. The cut's ranking cost
    // depends on where it lands on the idf curve (df = frac·N ⇒
    // idf = ln(1 + (1-frac)/frac + ...)), so sweep a frac list to map
    // the quality/wall trade-off against the same full-serve top-10.
    val fracs = sys.env.getOrElse("TIX_MAXDF", "0.05")
      .split(",").map(_.toDouble)
    for (maxDfFrac <- fracs) {
      var prunedPairs = Set.empty[(Long, Long)]
      val prunedWalls = (1 to repeats).map { _ =>
        val t = System.nanoTime()
        prunedPairs = TextIndex.bm25TopDocs(spark, prefix, queryTerms,
            topk = 10, maxDfFrac = maxDfFrac)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        (System.nanoTime() - t) / 1e9
      }
      println(f"TEXTINDEX-SCALE serve-pruned maxDfFrac=$maxDfFrac " +
        f"rows=${prunedPairs.size} " +
        prunedWalls.zipWithIndex.map { case (s, i) => f"serve${i + 1}=${s}%.1fs" }
          .mkString(" ") +
        // ranking quality of the cut: overlap of pruned vs full top-10
        f" overlap@10=${prunedPairs.intersect(fullPairs).size.toDouble / fullPairs.size}%.3f")
    }

    // the from-scratch pipeline at the same scale: re-tokenizes the
    // corpus and runs corpus-wide aggregations per call — and must agree
    // with the index bit-for-bit on the served top-k (TIX_TRANSIENT=0
    // skips it when only re-measuring serve phases)
    if (!sys.env.get("TIX_TRANSIENT").contains("0")) {
      val t1 = System.nanoTime()
      val transientDf = graft.TextQueries.bm25Ranked(spark, tmp, nq, topk = 10)
      val transientRes = transientDf.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val transientS = (System.nanoTime() - t1) / 1e9
      val indexedRes = TextIndex.bm25TopDocs(spark, prefix, queryTerms, topk = 10)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val agree = indexedRes == transientRes
      println(f"TEXTINDEX-SCALE transient wall=${transientS}%.1fs " +
        f"agree=$agree (indexed ≡ from-scratch at n=$n)")
      require(agree, "indexed and transient BM25 must be bit-identical")
    }

    TextIndex.drop(spark, prefix)
    spark.stop()
  }
}
