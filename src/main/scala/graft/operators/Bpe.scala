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
        it.map { case (id, text0) =>
          // null text is data: zero tokens, not an executor NPE
          val text = if (text0 == null) "" else text0
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
        it.map { case (id, text0) =>
          // null text is data: zero tokens, not an executor NPE
          val text = if (text0 == null) "" else text0
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
    * (spec-pinned, including partitioning invariance).
    *
    * Each sequence also carries `doc_spans: array<struct<doc_id, start,
    * len>>` — the PROVENANCE of its tokens: which doc contributed the
    * ids at positions [start, start+len), spans sorted by start and
    * tiling [0, n_tokens) exactly. Production training needs these for
    * attention resets at doc boundaries, per-doc loss masks, and
    * decontamination audits of a shipped sequence file. */
  def packSequences(docs: DataFrame, model: BpeModel, seqLen: Int,
      splitExpr: Column, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    packSyms(encodeForPack(docs, model, splitExpr, idCol, textCol),
      seqLen, idCol)

  /** [[packSequences]]' back half over a PRE-TOKENIZED corpus: `toksCol`
    * is the doc's token array (any tokenizer — carried BPE symbols, a
    * whitespace split, an external model's pieces). Dictionary ids,
    * offsets, straddles and assembly are identical to the BPE path;
    * only the encode is skipped. Unlike the iterative BPE front, every
    * step here is relational (prefix sum + floor arithmetic), so this
    * form is SQL-oracle-checkable end to end. */
  def packTokens(docs: DataFrame, seqLen: Int, splitExpr: Column,
      toksCol: Column, idCol: String = "doc_id"): DataFrame = {
    val enc = docs
      .select(col(idCol).cast("long").as(idCol),
        splitExpr.cast("string").as("split"), toksCol.as("syms"))
      .withColumn("n_toks", size(col("syms")).cast("long"))
    // an arbitrary tokenizer's dictionary is CORPUS-VOCABULARY-sized
    // (unbounded — ids, typos), unlike the BPE path's |merges|+alphabet
    // bound: no broadcast hint; size-based planning + AQE decide
    packSyms(enc, seqLen, idCol, boundedVocab = false)
  }

  /** [[packTokens]] with a LOSS MASK: `maskExpr` is the per-document
    * 0/1 train-on-these-tokens flag (the SFT shape — mask user/system
    * spans, train on assistant spans; or mask license-tainted docs in a
    * mixed pack). The output gains `loss_mask: array<int>` aligned
    * index-for-index with `token_ids`: every token carries its source
    * document's flag, so mask boundaries coincide exactly with
    * `doc_spans` boundaries by construction. Same shuffles as the
    * unmasked pack (the mask rides the existing token rows). */
  def packTokensMasked(docs: DataFrame, seqLen: Int, splitExpr: Column,
      toksCol: Column, maskExpr: Column, idCol: String = "doc_id"): DataFrame = {
    // guard the mask domain like Mixing.tokenBudget guards tokens: a
    // NULL or out-of-domain mask would flow through the pack into null
    // loss_mask entries and a null audit mask_sum — ship the diagnostic
    // here, not a silently poisoned pack
    val m = maskExpr.cast("int")
    val enc = docs
      .select(col(idCol).cast("long").as(idCol),
        splitExpr.cast("string").as("split"), toksCol.as("syms"),
        when(m.isNull || (m =!= 0 && m =!= 1), raise_error(concat(
            lit("packTokensMasked: mask must be 0/1, got "),
            coalesce(m.cast("string"), lit("NULL")), lit(" for id "),
            col(idCol).cast("string"))))
          .otherwise(m).as("doc_mask"))
      .withColumn("n_toks", size(col("syms")).cast("long"))
    packSyms(enc, seqLen, idCol, boundedVocab = false,
      maskCol = Some("doc_mask"))
  }

  /** [[packSequences]] under a FROZEN dictionary — the streaming /
    * multi-epoch form: `dict` (token, id) comes from the tokenizer's
    * shipped artifacts ([[vocabTable]] over the training corpus,
    * [[saveVocab]]/[[loadVocab]] round-trip), NOT from the batch at
    * hand, so every epoch of a stream packs with the SAME ids and the
    * shipped sequences are trainer-comparable across epochs. Symbols
    * outside the dictionary map to `unkId` (the reserved UNK id every
    * real tokenizer carries; it must not collide with dictionary ids —
    * dense from 0 — or the pad id). Token conservation still holds
    * exactly: unknown tokens are packed, not dropped. */
  def packSequencesFrozen(docs: DataFrame, model: BpeModel, seqLen: Int,
      splitExpr: Column, dict: DataFrame, unkId: Long = -2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    packSyms(encodeForPack(docs, model, splitExpr, idCol, textCol),
      seqLen, idCol, dict = Some((dict, unkId)))

  /** The shared encode front: (idCol, split, syms, n_toks). `splitExpr`
    * evaluates over the CALLER's columns (it may reference fields the
    * encode projection drops), so it is materialized before the encode. */
  private def encodeForPack(docs: DataFrame, model: BpeModel,
      splitExpr: Column, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    docs
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
  }

  /** The shared pack back half: (idCol, split, syms, n_toks) →
    * (split, seq_id, n_tokens, token_ids, doc_spans). `boundedVocab`
    * gates the dictionary-join broadcast hint: true only when the
    * caller can BOUND the dictionary by construction (the BPE path's
    * |merges| + alphabet); an unbounded dictionary must be left to
    * size-based planning + AQE or the hint becomes a 100×-scale OOM. */
  private def packSyms(enc: DataFrame, seqLen: Int, idCol: String,
      boundedVocab: Boolean = true, maskCol: Option[String] = None,
      dict: Option[(DataFrame, Long)] = None): DataFrame = {
    require(seqLen >= 1)
    val offs = GroupedPrefixSum.runningSum(enc, "cum", "n_toks",
      Seq("split"), Seq(col(idCol)), uniqueKeyCols = Seq("split", idCol))
    val tokCols = Seq(col("split"), (col("cum") - col("n_toks")).as("base")) ++
      maskCol.map(col).toSeq :+
      posexplode(col("syms")).as(Seq("pos", "token"))
    val exploded = offs
      .select(tokCols: _*)
      .withColumn("off", col("base") + col("pos"))
    val tokRows = dict match {
      case Some((d, unkId)) =>
        // FROZEN dictionary (tokenizer artifact — bounded, broadcast);
        // out-of-dictionary symbols become the reserved UNK id, never
        // dropped (token conservation is the pack's core invariant)
        exploded
          .join(broadcast(d.select(col("token"),
            col("id").cast("long").as("id"))), Seq("token"), "left_outer")
          .withColumn("id", coalesce(col("id"), lit(unkId)))
      case None =>
        // vocab from the POST-SORT frame, not `enc`: same rows, but the
        // lineage shares the prefix sum's shuffle output, so the encode
        // mapPartitions is never re-executed for the dictionary build
        val vocab = vocabTable(offs)
        val dict0 = vocab.select("token", "id")
        exploded.join(if (boundedVocab) broadcast(dict0) else dict0,
          Seq("token"))
    }
    // integral DIV, not floor(double /): exact past 2^53 tokens/split
    val grouped = tokRows
      .groupBy(col("split"), expr(s"off DIV ${seqLen}L").as("seq_id"))
    val seqs = maskCol match {
      case None =>
        grouped.agg(count(lit(1)).as("n_tokens"),
          expr("transform(array_sort(collect_list(struct(off, id))), x -> x.id)")
            .as("token_ids"))
      case Some(m) =>
        grouped.agg(count(lit(1)).as("n_tokens"),
            array_sort(collect_list(struct(col("off"), col("id"),
              col(m).as("m")))).as("pairs"))
          .withColumn("token_ids", expr("transform(pairs, x -> x.id)"))
          .withColumn("loss_mask", expr("transform(pairs, x -> x.m)"))
          .drop("pairs")
    }
    // provenance spans from the DOC-level frame: doc [base, cum) meets
    // sequence s for s in [base DIV L, (cum-1) DIV L] — fan-out is one
    // row per (doc, sequence) intersection, ~n_docs + n_seqs rows total,
    // so the extra aggregation + dense-key join stay linear and even
    val spans = offs.filter(col("n_toks") > 0)
      .select(col("split"), col(idCol),
        (col("cum") - col("n_toks")).as("base"), col("cum"))
      .select(col("split"), col(idCol), col("base"), col("cum"),
        explode(expr(s"sequence(base DIV ${seqLen}L, (cum - 1) DIV ${seqLen}L)"))
          .as("seq_id"))
      .select(col("split"), col("seq_id"),
        greatest(col("base") - col("seq_id") * seqLen, lit(0L))
          .cast("int").as("start"),
        (least(col("cum"), (col("seq_id") + 1) * seqLen)
          - greatest(col("base"), col("seq_id") * seqLen))
          .cast("int").as("len"),
        col(idCol).cast("long").as("span_doc"))
      .groupBy("split", "seq_id")
      .agg(expr("transform(array_sort(collect_list(struct(start, span_doc, len))), " +
        "x -> struct(x.span_doc as doc_id, x.start as start, x.len as len))")
        .as("doc_spans"))
    val outCols = Seq("split", "seq_id", "n_tokens", "token_ids") ++
      maskCol.map(_ => "loss_mask").toSeq :+ "doc_spans"
    seqs.join(spans, Seq("split", "seq_id"))
      .select(outCols.map(col): _*)
  }

  /** The NO-STRADDLE mode: one padded sequence per document (the
    * fine-tuning layout — one example per row, padded to `seqLen`,
    * truncated if longer). `seq_id` is dense per split in `idCol`
    * order (the same prefix-sum kernel, value 1 per doc); `n_tokens`
    * is the REAL (pre-pad, post-truncate) length, so the loss mask is
    * `position < n_tokens`; `doc_spans` is the single doc's span.
    * `padId` must not collide with a dictionary id (ids are dense from
    * 0, so the -1 default never does). */
  def packSequencesPadded(docs: DataFrame, model: BpeModel, seqLen: Int,
      splitExpr: Column, padId: Long = -1L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(seqLen >= 1)
    val enc = encodeForPack(docs, model, splitExpr, idCol, textCol)
    val offs = GroupedPrefixSum.runningSum(
      enc.withColumn("one", lit(1L)), "cum", "one",
      Seq("split"), Seq(col(idCol)), uniqueKeyCols = Seq("split", idCol))
    val vocab = vocabTable(offs)
    val withIds = offs
      .select(col("split"), (col("cum") - 1).as("seq_id"),
        col(idCol).cast("long").as("span_doc"),
        posexplode(col("syms")).as(Seq("pos", "token")))
      .filter(col("pos") < seqLen) // truncate before the shuffle
      .join(broadcast(vocab.select("token", "id")), Seq("token"))
      .groupBy("split", "seq_id")
      .agg(first(col("span_doc")).as("span_doc"),
        count(lit(1)).cast("long").as("n_tokens"),
        expr("transform(array_sort(collect_list(struct(pos, id))), x -> x.id)")
          .as("ids"))
    withIds.select(col("split"), col("seq_id"), col("n_tokens"),
      concat(col("ids"),
        array_repeat(lit(padId), (lit(seqLen) - size(col("ids"))).cast("int")))
        .as("token_ids"),
      array(struct(col("span_doc").as("doc_id"),
        lit(0).as("start"), col("n_tokens").cast("int").as("len")))
        .as("doc_spans"))
  }

  /** ROLE-AWARE fine-tuning packing: one padded sequence per
    * CONVERSATION. `turns` holds one row per turn (convCol, turnCol,
    * roleCol, textCol); each conversation's turns are encoded and
    * concatenated in `turnCol` order, truncated at `seqLen`, padded
    * with `padId`, and every token carries a LOSS-MASK bit: 1 iff its
    * turn's role equals `lossRole` (train on assistant tokens, attend
    * to but don't train on user/system — the SFT objective).
    *
    * Output: (split, seq_id, convCol, n_tokens, token_ids, loss_mask,
    * turn_spans) where `turn_spans: array<struct<turn_ix, role, start,
    * len>>` tiles [0, n_tokens) in order — mask boundaries coincide
    * with span boundaries by construction (spec-pinned), and the
    * masked-token count equals the post-truncation length sum of
    * `lossRole` turns.
    *
    * Scale shape: within-conversation offsets use a plain window
    * partitioned by conversation (millions of SMALL groups — the
    * opposite regime from the split-level [[GroupedPrefixSum]], which
    * would put O(conversations) state on the driver); the dense
    * per-split seq_id uses the prefix-sum kernel over one row per
    * conversation. `splitExpr` must be constant within a conversation.
    * Conversations with zero total tokens are dropped. */
  def packConversationsPadded(turns: DataFrame, model: BpeModel,
      seqLen: Int, splitExpr: Column, lossRole: String = "assistant",
      padId: Long = -1L, convCol: String = "conv_id",
      turnCol: String = "turn_ix", roleCol: String = "role",
      textCol: String = "text"): DataFrame = {
    require(seqLen >= 1)
    val spark = turns.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    val enc = turns
      .select(col(convCol).cast("long"), col(turnCol).cast("long"),
        col(roleCol).cast("string"), splitExpr.cast("string"), col(textCol))
      .as[(Long, Long, String, String, String)]
      .mapPartitions { it =>
        val m = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        it.map { case (cid, tix, role, sp, text) =>
          val ws = Option(text).getOrElse("").trim.split("\\s+")
            .filter(_.nonEmpty)
          (cid, tix, role, sp,
            ws.flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, m))))
        }
      }
      .toDF(convCol, turnCol, roleCol, "split", "syms")
      .withColumn("n_toks", size(col("syms")).cast("long"))
    val wTurn = org.apache.spark.sql.expressions.Window
      .partitionBy("split", convCol).orderBy(turnCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // duplicate (split, conv, turn_ix) keys would make the running
    // window — and with it truncation, token order and the mask —
    // partition-layout-dependent: throw, like the packSyms path's
    // prefix-sum uniqueness guard (same partitioning as wTurn, so the
    // check rides the same shuffle)
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy("split", convCol, turnCol)
    val guarded = enc
      .withColumn("n_dup", count(lit(1)).over(wDup))
      .withColumn("n_toks",
        when(col("n_dup") > 1, raise_error(concat(
          lit("packConversationsPadded: duplicate turn key ("),
          col(convCol).cast("string"), lit(", "),
          col(turnCol).cast("string"), lit(")"))))
          .otherwise(col("n_toks")))
      .drop("n_dup")
    // every downstream lineage (conv ordinal, vocab, tokens, spans)
    // derives from the post-window frame, so they all reuse the one
    // (split, conv) window shuffle — no re-encode, no persist needed
    val turnOffs = guarded.withColumn("cum", sum("n_toks").over(wTurn))
      .withColumn("base", col("cum") - col("n_toks"))
      .filter(col("base") < seqLen) // turns entirely beyond the window drop
    val convSeq = GroupedPrefixSum.runningSum(
        turnOffs.select("split", convCol).distinct()
          .withColumn("one", lit(1L)),
        "ccum", "one", Seq("split"), Seq(col(convCol)),
        uniqueKeyCols = Seq("split", convCol))
      .select(col("split"), col(convCol), (col("ccum") - 1).as("seq_id"))
    val vocab = vocabTable(turnOffs)
    val tokRows = turnOffs.join(convSeq, Seq("split", convCol))
      .select(col("split"), col("seq_id"), col(roleCol), col("base"),
        posexplode(col("syms")).as(Seq("pos", "token")))
      .withColumn("off", col("base") + col("pos"))
      .filter(col("off") < seqLen) // truncate before the shuffle
      .join(broadcast(vocab.select("token", "id")), Seq("token"))
    val seqs = tokRows.groupBy("split", "seq_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        array_sort(collect_list(struct(col("off"), col("id"),
          when(col(roleCol) === lossRole, 1).otherwise(0).as("m"))))
          .as("pairs"))
      .withColumn("ids", expr("transform(pairs, x -> x.id)"))
      .withColumn("mask", expr("transform(pairs, x -> x.m)"))
      .drop("pairs")
    val spans = turnOffs.join(convSeq, Seq("split", convCol))
      .select(col("split"), col("seq_id"), col(convCol),
        col(turnCol), col(roleCol),
        col("base").cast("int").as("start"),
        (least(col("cum"), lit(seqLen.toLong)) - col("base"))
          .cast("int").as("len"))
      .filter(col("len") > 0)
      .groupBy("split", "seq_id")
      .agg(first(col(convCol)).as(convCol),
        expr(s"transform(array_sort(collect_list(struct(start, " +
          s"$turnCol, $roleCol, len))), x -> struct(x.$turnCol as turn_ix, " +
          s"x.$roleCol as role, x.start as start, x.len as len))")
          .as("turn_spans"))
    seqs.join(spans, Seq("split", "seq_id"))
      .select(col("split"), col("seq_id"), col(convCol),
        col("n_tokens"),
        concat(col("ids"), array_repeat(lit(padId),
          (lit(seqLen) - size(col("ids"))).cast("int"))).as("token_ids"),
        concat(col("mask"), array_repeat(lit(0),
          (lit(seqLen) - size(col("mask"))).cast("int"))).as("loss_mask"),
        col("turn_spans"))
  }

  /** Write the dictionary as the single `vocab.json` artifact tokenizer
    * exports ship: one JSON object, token → dense id, id order. The
    * vocabulary is bounded by |merges| + alphabet by construction, so
    * the driver-side collect is the right layout (one file, not a
    * parquet directory). */
  def saveVocab(vocab: DataFrame, path: String): Unit = {
    import org.json4s.JsonAST.{JInt, JObject}
    val rows = vocab.select("token", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    writeString(vocab.sparkSession, path,
      org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods
        .render(JObject(rows.toList.map { case (t, i) => t -> JInt(i) }))))
  }

  /** Read a [[saveVocab]] artifact back as a (token, id) frame. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import org.json4s.JsonAST.{JInt, JObject}
    import spark.implicits._
    org.json4s.jackson.JsonMethods.parse(readString(spark, path)) match {
      case JObject(fields) =>
        fields.map { case (t, v) => (t, v.asInstanceOf[JInt].num.toLong) }
          .toDF("token", "id")
      case other => throw new IllegalArgumentException(
        s"$path is not a vocab.json object: ${other.getClass.getSimpleName}")
    }
  }

  /** Write the trained model (merge list + end mark — the `merges.txt`
    * analog) as one JSON file; [[loadModel]] round-trips it so a
    * tokenizer trained once is reusable across sessions/clusters. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: BpeModel,
      path: String): Unit = {
    import org.json4s.JsonAST.{JArray, JObject, JString}
    writeString(spark, path,
      org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods
        .render(JObject(List(
          "end_mark" -> JString(model.endMark),
          "merges" -> JArray(model.merges.toList.map { case (a, b) =>
            JArray(List(JString(a), JString(b))) }))))))
  }

  /** Read a [[saveModel]] artifact back. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): BpeModel = {
    import org.json4s.JsonAST.{JArray, JObject, JString}
    org.json4s.jackson.JsonMethods.parse(readString(spark, path)) match {
      case JObject(fields) =>
        val m = fields.toMap
        val endMark = m("end_mark").asInstanceOf[JString].s
        val merges = m("merges").asInstanceOf[JArray].arr.map {
          case JArray(List(JString(a), JString(b))) => (a, b)
          case other => throw new IllegalArgumentException(
            s"bad merge entry in $path: $other")
        }
        BpeModel(merges.toArray, endMark)
      case other => throw new IllegalArgumentException(
        s"$path is not a model.json object: ${other.getClass.getSimpleName}")
    }
  }

  private def writeString(spark: org.apache.spark.sql.SparkSession,
      path: String, s: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readString(spark: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
