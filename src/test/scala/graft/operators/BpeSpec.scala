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

  test("doc_spans: hand-checked straddle provenance — spans tile each " +
      "sequence and a doc's spans sum to its token count") {
    import org.apache.spark.sql.functions._
    val corpus = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(corpus, numMerges = 10) // "ab" → 1 token
    // stream: d1:[0,1] d2:[2,3] d3:[4,5,6]; L=3 → d2 and d3 straddle
    val docs = Seq((1L, "ab ab"), (2L, "ab ab"), (3L, "ab ab ab"))
      .toDF("doc_id", "text")
    val out = Bpe.packSequences(docs, model, seqLen = 3, lit("train"))
      .collect().map { r =>
        (r.getLong(1), r.getLong(2),
          r.getSeq[org.apache.spark.sql.Row](4)
            .map(s => (s.getLong(0), s.getInt(1), s.getInt(2))))
      }.sortBy(_._1)
    assert(out.map(t => (t._1, t._3)).toSeq == Seq(
      (0L, Seq((1L, 0, 2), (2L, 2, 1))),
      (1L, Seq((2L, 0, 1), (3L, 1, 2))),
      (2L, Seq((3L, 0, 1)))))
    // tiling: spans partition [0, n_tokens) exactly
    out.foreach { case (_, n, spans) =>
      assert(spans.head._2 == 0)
      spans.sliding(2).foreach {
        case Seq((_, s1, l1), (_, s2, _)) => assert(s1 + l1 == s2)
        case _ => ()
      }
      assert(spans.map(_._3).sum == n)
    }
    // real corpus: per-doc span lengths conserve the doc's token count
    val d2 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 60)
    val m2 = Bpe.train(d2, numMerges = 30)
    val split = when(pmod(col("doc_id"), lit(2)) === 0, "train")
      .otherwise("val")
    val packed = Bpe.packSequences(d2, m2, seqLen = 128, split).collect()
    val perDoc = packed.flatMap(
      _.getSeq[org.apache.spark.sql.Row](4)
        .map(s => (s.getLong(0), s.getInt(2).toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = Bpe.tokenStats(d2, m2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(perDoc == want.filter(_._2 > 0),
      "every doc's spans must sum to its token count")
    packed.foreach { r =>
      val spans = r.getSeq[org.apache.spark.sql.Row](4)
        .map(s => (s.getInt(1), s.getInt(2)))
      assert(spans.map(_._2).sum == r.getLong(2))
      assert(spans.head._1 == 0)
      spans.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s1 + l1 == s2)
        case _ => ()
      }
    }
  }

  test("packTokens: the relational back half packs a pre-tokenized " +
      "corpus identically to packSequences on the same symbol streams") {
    import org.apache.spark.sql.functions._
    val corpus = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(corpus, numMerges = 10)
    val d2 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 40)
    val m2 = Bpe.train(d2, numMerges = 20)
    val split = when(pmod(col("doc_id"), lit(2)) === 0, "train")
      .otherwise("val")
    // hand the BPE symbol streams in as plain token arrays
    val pre = Bpe.encodeTokens(d2, m2)
      .join(d2.select(col("doc_id"), split.as("sp")), "doc_id")
    val viaTokens = Bpe.packTokens(pre, seqLen = 64, col("sp"),
        col("syms")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3))).toSet
    val viaBpe = Bpe.packSequences(d2, m2, seqLen = 64, split).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3))).toSet
    assert(viaTokens == viaBpe)
  }

  test("packSequencesPadded: one doc per sequence, real length kept, " +
      "truncation and padding exact, dense per-split seq ids") {
    import org.apache.spark.sql.functions._
    val corpus = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(corpus, numMerges = 10) // "ab" → 1 token, id 0
    val docs = Seq((1L, "ab ab"), (2L, "ab ab ab ab ab"), (3L, "ab"))
      .toDF("doc_id", "text")
    val out = Bpe.packSequencesPadded(docs, model, seqLen = 4, lit("train"))
      .collect().map { r =>
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3),
          r.getSeq[org.apache.spark.sql.Row](4)
            .map(s => (s.getLong(0), s.getInt(1), s.getInt(2))))
      }.sortBy(_._1)
    assert(out.length == 3)
    // doc 1: 2 real tokens + 2 pads; doc 2: truncated to 4; doc 3: 1 + 3
    assert(out(0) == (0L, 2L, Seq(0L, 0L, -1L, -1L), Seq((1L, 0, 2))))
    assert(out(1) == (1L, 4L, Seq(0L, 0L, 0L, 0L), Seq((2L, 0, 4))))
    assert(out(2) == (2L, 1L, Seq(0L, -1L, -1L, -1L), Seq((3L, 0, 1))))
    assert(out.forall(_._3.length == 4), "every row is exactly seqLen")
  }

  test("vocab.json / model.json round-trip: load ∘ save = identity and " +
      "a loaded model encodes identically to the original") {
    import org.apache.spark.sql.functions._
    val d2 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 40)
    val model = Bpe.train(d2, numMerges = 25)
    val dir = java.nio.file.Files.createTempDirectory("bpeart").toString
    Bpe.saveModel(spark, model, s"$dir/model.json")
    val loaded = Bpe.loadModel(spark, s"$dir/model.json")
    assert(loaded.endMark == model.endMark)
    assert(loaded.merges.toSeq == model.merges.toSeq)
    val orig = Bpe.encodeTokens(d2, model).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toSet
    val again = Bpe.encodeTokens(d2, loaded).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toSet
    assert(again == orig)
    val vocab = Bpe.vocabTable(Bpe.encodeTokens(d2, model))
    Bpe.saveVocab(vocab, s"$dir/vocab.json")
    val vLoaded = Bpe.loadVocab(spark, s"$dir/vocab.json").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val vOrig = vocab.select("token", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(vLoaded == vOrig)
    // tokens with JSON-hostile characters survive the round trip
    val weird = Seq(("a\"b\\c", 0L), ("d\ne", 1L), ("ü</w>", 2L))
      .toDF("token", "id")
    Bpe.saveVocab(weird, s"$dir/weird.json")
    assert(Bpe.loadVocab(spark, s"$dir/weird.json").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a\"b\\c", 0L), ("d\ne", 1L), ("ü</w>", 2L)))
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
