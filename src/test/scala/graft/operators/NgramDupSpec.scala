package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class NgramDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def stats(rows: Seq[(Long, String)], w: Int) =
    NgramDup.dupNgramStats(rows.toDF("doc_id", "text"), w = w)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap

  test("hand-checked geometry: shared span counted once per position, " +
      "union coverage not double-counted on overlap") {
    // docs 1 and 2 share the 4-token run "a b c d e" → two 3-windows each
    // ("a b c", "b c d", "c d e"); doc 3 is all-unique
    val got = stats(Seq(
      1L -> "a b c d e x y z",
      2L -> "q a b c d e r",
      3L -> "u v w t s"), w = 3)
    // doc 1: 8 tokens, 6 windows; dup windows at pos 1,2,3 cover tokens 1..5
    assert(got(1L) == ((8L, 6L, 3L, 5L, 0.625)))
    // doc 2: 7 tokens, 5 windows; dup windows at pos 2,3,4 cover tokens 2..6
    assert(got(2L) == ((7L, 5L, 3L, 5L, math.floor(5.0 / 7.0 * 1e6 + 0.5) / 1e6)))
    // doc 3: nothing duplicated
    assert(got(3L) == ((5L, 3L, 0L, 0L, 0.0)))
  }

  test("within-doc repetition alone counts as duplication") {
    val got = stats(Seq(1L -> "p q r s p q r t", 2L -> "m n o"), w = 3)
    // "p q r" occurs twice inside doc 1 (pos 1 and 5) → both positions dup;
    // spans 1..3 and 5..7 → 6 covered tokens of 8
    assert(got(1L) == ((8L, 6L, 2L, 6L, 0.75)))
    assert(got(2L)._3 == 0L)
  }

  test("short docs get a zero-window row, never dropped") {
    val got = stats(Seq(1L -> "a b", 2L -> "a b c d"), w = 3)
    assert(got(1L) == ((2L, 0L, 0L, 0L, 0.0)))
    assert(got(2L)._2 == 2L)
  }

  test("hashKey=true (the 8-byte-shuffle scale path) matches exact strings") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = NgramDup.dupNgramStats(docs, w = 8)
      .collect().map(_.toSeq).toSet
    val hashed = NgramDup.dupNgramStats(docs, w = 8, hashKey = true)
      .collect().map(_.toSeq).toSet
    assert(exact == hashed)
    assert(exact.nonEmpty)
  }

  test("no cartesian/broadcast-nested-loop anywhere in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = NgramDup.dupNgramStats(docs, w = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  private def trim(rows: Seq[(Long, String)], w: Int) =
    NgramDup.trimDuplicates(rows.toDF("doc_id", "text"), w = w)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toMap

  test("trim: hand-checked keep-first geometry (cross-doc, whole-doc " +
      "drop, within-doc repeat, untouched docs)") {
    val got = trim(Seq(
      0L -> "a b c d",   // canonical "a b" occurrence — untouched
      1L -> "x a b y",   // non-canonical "a b" at p2 → drop p2,p3
      2L -> "a b a b",   // both "a b" occs non-canonical → everything dropped
      3L -> "q r",       // no duplicated window — untouched
      4L -> "t t t"      // within-doc repeat: keep first "t t", drop p2,p3
    ), w = 2)
    assert(got == Map(
      0L -> (4L, 4L, 0.0, "a b c d"),
      1L -> (4L, 2L, 0.5, "x y"),
      2L -> (4L, 0L, 1.0, ""),
      3L -> (2L, 2L, 0.0, "q r"),
      4L -> (3L, 1L, 0.666667, "t")), s"got $got")
  }

  test("trim agrees with dupNgramStats coverage on real docs: dropped " +
      "tokens never exceed duplicated coverage; exactly one canonical " +
      "copy of every duplicated window survives corpus-wide") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val w = 8
    val st = NgramDup.dupNgramStats(docs, w = w).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    val tr = NgramDup.trimDuplicates(docs, w = w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    assert(tr.map(_._1).toSet == st.keySet)
    tr.foreach { case (id, nTok, nKept, clean) =>
      val (nTokS, dupTok) = st(id)
      assert(nTok == nTokS)
      assert(nTok - nKept <= dupTok,
        s"doc $id dropped ${nTok - nKept} > coverage $dupTok")
      val cleanToks = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(cleanToks == nKept, s"doc $id clean token count mismatch")
      if (dupTok == 0)
        assert(nKept == nTok, s"doc $id trimmed without duplicated coverage")
    }
    // something actually trims at sf0.001 (the fixture has planted dups)
    assert(tr.exists(t => t._3 < t._2), "fixture should trim something")
  }

  test("trim hashKey=true (token-hash windows, no strings built) " +
      "matches exact strings") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val exact = NgramDup.trimDuplicates(docs, w = 8)
      .collect().map(_.toSeq).toSet
    val hashed = NgramDup.trimDuplicates(docs, w = 8, hashKey = true)
      .collect().map(_.toSeq).toSet
    assert(exact == hashed)
  }

  test("keepToks: clean_toks is the authoritative kept sequence — joins " +
      "back to clean_text, empty-doc sentinel, default schema unchanged") {
    import org.apache.spark.sql.functions._
    // doc 10/11 share the whole 8-token text → doc 11 fully trimmed;
    // doc 12 is untouched
    val rows = Seq(
      10L -> "a b c d e f g h",
      11L -> "a b c d e f g h",
      12L -> "u v w x y z q r").toDF("doc_id", "text")
    val out = NgramDup.trimDuplicates(rows, w = 8, keepToks = true)
    // carried array re-joined with single spaces IS clean_text
    assert(out.filter(
      array_join(col("clean_toks"), " ") =!= col("clean_text")).count() == 0)
    val byId = out.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("clean_toks")))
      .toMap
    assert(byId(12L) == Seq("u", "v", "w", "x", "y", "z", "q", "r"))
    // fully trimmed doc carries array("") — exactly split(trim(''))
    assert(byId(11L) == Seq(""))
    // default call keeps the pre-handoff schema (oracle compatibility)
    assert(!NgramDup.trimDuplicates(rows, w = 8).columns
      .contains("clean_toks"))
  }
}
