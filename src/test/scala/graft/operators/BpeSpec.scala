package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  test("hand-computed merge sequence: counts weight by word frequency, " +
      "ties break lexicographically, merges apply left-to-right") {
    // "ab" x3: symbols a b </w>. pairs (a,b):3, (b,</w>):3 — tie broken
    // lexicographically: (a,b) < (b,</w>) → merge (a,b) first, then
    // (ab,</w>)
    val m1 = Bpe.train(Seq((1L, "ab ab ab")).toDF("doc_id", "text"),
      numMerges = 10)
    assert(m1.merges.toSeq == Seq(("a", "b"), ("ab", "</w>")))

    // "aa" x2 + "ab": pairs (a,a):2, (a,</w>):2, (a,b):1, (b,</w>):1 —
    // tie (a,a) vs (a,</w>) → ("a","</w>") is lexicographically smaller
    // ('<' < 'a'); then (a, a</w>):2 wins round 2; round 3 has no pair
    // with count ≥ 2 → early stop
    val m2 = Bpe.train(Seq((1L, "aa aa ab")).toDF("doc_id", "text"),
      numMerges = 10)
    assert(m2.merges.toSeq == Seq(("a", "</w>"), ("a", "a</w>")))

    // all-distinct words: no pair reaches minPairCount → zero merges
    val m3 = Bpe.train(Seq((1L, "ab cd ef")).toDF("doc_id", "text"),
      numMerges = 10)
    assert(m3.merges.isEmpty)
  }

  test("overlapping pair merges left-to-right: 'aaa' under merge (a,a)") {
    assert(Bpe.mergePair(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
    assert(Bpe.mergePair(Array("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
  }

  test("apply: training words collapse to their trained token counts; " +
      "unseen words tokenize by rank-greedy merges") {
    val corpus = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(corpus, numMerges = 10)
    // every training word is fully merged → 1 token each
    val st = Bpe.tokenStats(corpus, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(st.toSeq == Seq((1L, 3L, 3L))) // 3 words, 1 token each
    // unseen "abab": a b a b </w> → rank0 (a,b) everywhere → ab ab </w>
    // → rank1 (ab,</w>) → ab ab</w> → 2 tokens
    assert(Bpe.encodeWordLen("abab", model) == 2)
    // word with chars never seen in training stays at chars + endmark
    assert(Bpe.encodeWordLen("xyz", model) == 4)
  }

  test("training is invariant to partitioning and deterministic on " +
      "real docs; apply memo returns consistent stats") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(docs, numMerges = 50)
    val b = Bpe.train(docs.repartition(13), numMerges = 50)
    assert(a.merges.toSeq == b.merges.toSeq)
    assert(a.merges.length == 50)
    val st = Bpe.tokenStats(docs, a).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // BPE tokens per doc: at least 1 per word (fully merged), at most
    // chars+1 per word; merges learned ⇒ strictly fewer tokens than
    // raw chars for typical docs
    assert(st.forall { case (_, w, t) => t >= w })
    val st2 = Bpe.tokenStats(docs.repartition(7), a).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(st.toSet == st2.toSet)
  }

  test("maxWordTypes truncation is deterministic (count desc, word asc)") {
    val df = Seq((1L, "cc cc cc bb bb aa aa zz")).toDF("doc_id", "text")
    // keep 3 types: cc(3), then aa(2) before bb(2) by word order — zz cut
    val m = Bpe.train(df, numMerges = 3, maxWordTypes = 3,
      minPairCount = 1L)
    // merges derive only from {cc x3, aa x2, bb x2}: round 1 ties
    // (c,c):3 with (c,</w>):3 and ("c","</w>") is lexicographically
    // smaller ('<' < 'c'); zz was truncated so no 'z' merge can appear
    assert(m.merges.head == ("c", "</w>"))
    assert(m.merges.forall { case (a, b) => !a.contains("z") && !b.contains("z") })
  }

  test("encodeTokens emits the exact symbol sequences; vocabTable ids " +
      "are dense (count desc, token asc)") {
    import org.apache.spark.sql.functions._
    val corpus = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(corpus, numMerges = 10)
    // trained: "ab" collapses to one symbol "ab</w>"
    val enc = Bpe.encodeTokens(
      Seq((1L, "ab ab"), (2L, "ab cd")).toDF("doc_id", "text"), model)
    val byId = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(1L) == Seq("ab</w>", "ab</w>"))
    // unseen "cd": no merge applies → chars + end-mark
    assert(byId(2L) == Seq("ab</w>", "c", "d", "</w>"))
    val vocab = Bpe.vocabTable(enc).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // counts: ab</w> x3; </w>, c, d x1 each → id 0 = ab</w>, then
    // lexicographic among the ties: "</w>" < "c" < "d"
    assert(vocab("ab</w>") == ((0L, 3L)))
    assert(vocab("</w>")._1 == 1L && vocab("c")._1 == 2L
      && vocab("d")._1 == 3L)
  }

  test("packSequences: hand-checked straddle, exact seqLen everywhere " +
      "but each split's tail, ids decode back, partitioning-invariant") {
    import org.apache.spark.sql.functions._
    val corpus = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(corpus, numMerges = 10) // "ab" → 1 token
    // docs of 2, 2, 3 "ab"-tokens in one split: token stream length 7,
    // seqLen 3 → sequences of 3, 3, 1; doc 3 (3 tokens at offsets 4-6)
    // STRADDLES sequences 1 and 2
    val docs = Seq(
      (1L, "ab ab"), (2L, "ab ab"), (3L, "ab ab ab"))
      .toDF("doc_id", "text")
    val out = Bpe.packSequences(docs, model, seqLen = 3, lit("train"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3)))
      .sortBy(t => (t._1, t._2))
    // single token type → every id is 0; the shape is the assertion
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("train", 0L, 3L), ("train", 1L, 3L), ("train", 2L, 1L)))
    assert(out.flatMap(_._4).forall(_ == 0L))

    // two-split corpus on real text: every non-tail sequence is exactly
    // seqLen, totals conserve, and a 7-way repartition changes nothing
    val d2 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 60)
    val m2 = Bpe.train(d2, numMerges = 30)
    val split = when(pmod(col("doc_id"), lit(2)) === 0, "train")
      .otherwise("val")
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.packSequences(df, m2, seqLen = 128, split).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[Long](3)))
    val a = run(d2)
    a.groupBy(_._1).foreach { case (sp, seqs) =>
      val tail = seqs.maxBy(_._2)
      seqs.foreach { case (_, sid, n, ids) =>
        assert(n == ids.length)
        if (sid != tail._2) assert(n == 128L, s"$sp seq $sid has $n")
      }
      // conservation: Σ sequence tokens == Σ doc tokens of the split
      val want = Bpe.tokenStats(d2.filter(split === sp), m2)
        .agg(sum("n_bpe_tokens")).first().getLong(0)
      assert(seqs.map(_._3).sum == want, s"$sp token conservation")
    }
    val b = run(d2.repartition(7))
    assert(a.map(t => (t._1, t._2, t._3, t._4)).toSet ==
      b.map(t => (t._1, t._2, t._3, t._4)).toSet,
      "packing must be partitioning-invariant")

    // splitExpr referencing a CALLER column (dropped by the encode
    // projection) must still evaluate — the chain hands in its own
    // split assignment as a plain column
    val withCol = d2.withColumn("my_split",
      when(pmod(col("doc_id"), lit(2)) === 0, "train").otherwise("val"))
    val c = Bpe.packSequences(withCol, m2, seqLen = 128, col("my_split"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3)))
    assert(c.map(t => (t._1, t._2, t._3, t._4)).toSet ==
      a.map(t => (t._1, t._2, t._3, t._4)).toSet,
      "column-based split must equal the expression-based split")
  }

  test("packSequences: duplicate doc_ids violate the total-order " +
      "precondition and throw instead of packing layout-dependently") {
    import org.apache.spark.sql.functions._
    val corpus = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(corpus, numMerges = 10)
    val dup = Seq((1L, "ab ab"), (1L, "ab ab"), (2L, "ab"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.packSequences(dup, model, seqLen = 3, lit("train"))
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
