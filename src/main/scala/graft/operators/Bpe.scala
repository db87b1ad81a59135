package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application (Sennrich et
  * al., "Neural Machine Translation of Rare Words with Subword Units")
  * — the tokenizer-fitting step of an LLM data pipeline, Spark-first:
  *
  *  - The corpus pays exactly ONE distributed pass: the word-count
  *    aggregation (explode → map-side-combined group-by → top
  *    `maxWordTypes` word types by (count desc, word asc) — the
  *    standard frequency-floor truncation). Everything after runs on
  *    the bounded word-TYPE table on the driver, which is how classic
  *    BPE trainers work too: merge statistics are weighted by type
  *    counts, so corpus size only enters through the one aggregation.
  *  - The merge loop is deterministic: each round counts adjacent
  *    symbol pairs over the types (weighted), picks the most frequent
  *    pair with ties broken lexicographically, and merges its
  *    occurrences left-to-right in every type. Stops early when no
  *    pair reaches `minPairCount`.
  *  - [[tokenStats]] applies the learned merges per document with the
  *    standard lowest-rank-first greedy loop — genuinely imperative
  *    work, so it runs in `mapPartitions` (the documented last-resort
  *    tier) with a per-partition word → token-count memo: natural text
  *    repeats words heavily, so the per-row cost collapses to a hash
  *    lookup for all but first sightings.
  *
  * Training is iterative (not SQL-expressible), so the battery entry is
  * rows-only by nature; the spec pins hand-computed merge sequences,
  * train/apply consistency, and partitioning invariance instead.
  */
object Bpe {

  /** Learned merge list, in rank order (rank 0 = first, most frequent). */
  case class BpeModel(merges: Array[(String, String)], endMark: String) {
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Merge every left-to-right non-overlapping (a, b) adjacency. Shared
    * by train and apply so their semantics cannot drift. */
  private[operators] def mergePair(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Train `numMerges` BPE merges on the corpus' word-count table. */
  def train(docs: DataFrame, numMerges: Int, maxWordTypes: Int = 100000,
      minPairCount: Long = 2L, endMark: String = "</w>",
      textCol: String = "text"): BpeModel = {
    require(numMerges >= 0 && maxWordTypes > 0)
    // the one corpus pass: word counts, truncated deterministically
    val types: Array[(String, Long)] = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word").asc).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // driver loop over the bounded type table
    var words: Array[(Array[String], Long)] = types.map { case (w, c) =>
      (w.map(_.toString).toArray :+ endMark, c)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    while (rounds < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= minPairCount)
      if (best.isEmpty) rounds = numMerges
      else {
        val (pair, _) = best.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        words = words.map { case (syms, c) =>
          (mergePair(syms, pair._1, pair._2), c)
        }
        rounds += 1
      }
    }
    BpeModel(merges.toArray, endMark)
  }

  /** Tokenize one word with the standard lowest-rank-first greedy loop:
    * repeatedly merge the present pair with the smallest merge rank
    * until none applies. Returns the BPE token count. */
  private[operators] def encodeWordLen(word: String, model: BpeModel): Int = {
    var syms: Array[String] = word.map(_.toString).toArray :+ model.endMark
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val r = model.ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = p }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = mergePair(syms, bestPair._1, bestPair._2)
    }
    syms.length
  }

  /** Per-doc BPE statistics under a trained model:
    * (doc_id, n_words, n_bpe_tokens) — the sizing signal (tokens per
    * doc under YOUR tokenizer) that batch shaping and packing need. */
  def tokenStats(docs: DataFrame, model: BpeModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val memo = mutable.HashMap.empty[String, Int]
        it.map { case (id, text) =>
          val ws = text.trim.split("\\s+").filter(_.nonEmpty)
          var toks = 0L
          ws.foreach { w =>
            toks += memo.getOrElseUpdate(w, encodeWordLen(w, m))
          }
          (id, ws.length.toLong, toks)
        }
      }
      .toDF(idCol, "n_words", "n_bpe_tokens")
  }
}
