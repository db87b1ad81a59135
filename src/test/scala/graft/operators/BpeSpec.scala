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
}
