package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
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
    * until none applies. Returns the BPE token count ([[encodeWord]]'s
    * length — one greedy loop shared by count and sequence forms). */
  private[operators] def encodeWordLen(word: String, model: BpeModel): Int =
    encodeWord(word, model).length

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

  /** FULL encode under a trained model: (doc_id, syms) where `syms` is
    * the doc's BPE symbol sequence (words tokenized by the standard
    * lowest-rank-first greedy loop, concatenated in order; the `</w>`
    * end-mark rides the last symbol of each word as in [[train]]).
    * Same per-partition word memo as [[tokenStats]] — Zipf makes the
    * memo hit rate the dominant term, so encode is ~the cost of the
    * word split for repeated vocabulary. */
  def encodeTokens(docs: DataFrame, model: BpeModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val ws = text.trim.split("\\s+").filter(_.nonEmpty)
          (id, ws.flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, m))))
        }
      }
      .toDF(idCol, "syms")
  }

  /** [[encodeWordLen]]'s sequence form (shared greedy loop). */
  private[operators] def encodeWord(word: String,
      model: BpeModel): Array[String] = {
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
    syms
  }

  /** Deterministic token-id dictionary over an encoded corpus:
    * (token, id, n) with ids dense from 0 in (count desc, token asc)
    * order — assigned by the two-phase [[Ordinal]] zipWithIndex, never
    * a single-partition window. The vocabulary table is the model
    * artifact tokenizer exports ship as `vocab.json`. */
  def vocabTable(encoded: DataFrame): DataFrame = {
    val counts = encoded
      .select(explode(col("syms")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    Ordinal.withOrdinal(counts, "id", col("n").desc, col("token").asc)
      .select(col("token"), col("id"), col("n"))
  }

  /** THE LAST MILE of the curation chain: raw docs → fixed-length
    * token-ID training rows. Encode ([[encodeTokens]]) → dictionary ids
    * (broadcast [[vocabTable]] join on the exploded tokens) → global
    * token offsets per split (doc-level [[GroupedPrefixSum]], so a doc
    * STRADDLES a sequence boundary exactly like production packing —
    * no padding, no document loss) → one shuffle on (split, seq_id)
    * assembling (split, seq_id, n_tokens, token_ids).
    *
    * Every sequence except each split's last has exactly `seqLen` ids.
    * Scale shape: one explode (linear in tokens), the P×G-bounded
    * prefix sum, one even group-by on dense sequence keys; the vocab
    * broadcast is bounded by |merges| + alphabet by construction. The
    * corpus is ENCODED EXACTLY ONCE: the prefix sum's eager totals job
    * writes the range-sort shuffle, and both downstream lineages (the
    * token explode AND the vocabulary aggregation) derive from the same
    * post-sort RDD, so every later job reuses that shuffle output
    * (skipped stages) instead of re-running the encode.
    *
    * PRECONDITION: `idCol` must be unique per row within each split
    * (the prefix sum needs a total order — enforced, throws on
    * duplicates). Deterministic for a fixed (model, corpus, split):
    * ids, order and straddles are pure functions of the data
    * (spec-pinned, including partitioning invariance). */
  def packSequences(docs: DataFrame, model: BpeModel, seqLen: Int,
      splitExpr: Column, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(seqLen >= 1)
    // splitExpr evaluates over the CALLER's columns (it may reference
    // fields encode drops), so it is materialized before the encode
    // projection and joined back through the (id, split) pair
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    val enc = docs
      .select(col(idCol).cast("long"), splitExpr.cast("string"),
        col(textCol))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val m = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, sp, text) =>
          val ws = text.trim.split("\\s+").filter(_.nonEmpty)
          (id, sp,
            ws.flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, m))))
        }
      }
      .toDF(idCol, "split", "syms")
      .withColumn("n_toks", size(col("syms")).cast("long"))
    val offs = GroupedPrefixSum.runningSum(enc, "cum", "n_toks",
      Seq("split"), Seq(col(idCol)), uniqueKeyCols = Seq("split", idCol))
    // vocab from the POST-SORT frame, not `enc`: same rows, but the
    // lineage shares the prefix sum's shuffle output, so the encode
    // mapPartitions is never re-executed for the dictionary build
    val vocab = vocabTable(offs)
    val tokRows = offs
      .select(col("split"), (col("cum") - col("n_toks")).as("base"),
        posexplode(col("syms")).as(Seq("pos", "token")))
      .withColumn("off", col("base") + col("pos"))
      .join(broadcast(vocab.select("token", "id")), Seq("token"))
    tokRows
      // integral DIV, not floor(double /): exact past 2^53 tokens/split
      .groupBy(col("split"), expr(s"off DIV ${seqLen}L").as("seq_id"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("transform(array_sort(collect_list(struct(off, id))), x -> x.id)")
          .as("token_ids"))
      .select("split", "seq_id", "n_tokens", "token_ids")
  }
}
