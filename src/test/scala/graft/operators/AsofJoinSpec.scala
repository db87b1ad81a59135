package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("backward as-of: latest at-or-before per key, equal-ts matches, " +
      "no prior row -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),
      (4L, "b", 100L), (5L, "b", 99L))
      .toDF("lid", "k", "t")
    val right = Seq(
      ("a", 10L, "r@10"), ("a", 15L, "r@15"), ("b", 100L, "r@100"))
      .toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t",
        payload = Seq("v", "t"))
      .select("lid", "r_v", "r_t").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some("r@10"), Some(10L))) // equal ts matches (>=)
    assert(out(2L) == (Some("r@15"), Some(15L))) // latest before, not first
    assert(out(3L) == (None, None))              // nothing at-or-before
    assert(out(4L) == (Some("r@100"), Some(100L)))
    assert(out(5L) == (None, None))              // right row is AFTER
  }

  test("payload struct is atomic: a null field in the matching right row " +
      "does not fall back to an older row") {
    import spark.implicits._
    val left = Seq((1L, "a", 30L)).toDF("lid", "k", "t")
    val right = Seq(("a", 10L, Some("old")), ("a", 20L, None))
      .toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t",
        payload = Seq("v", "t")).select("r_v", "r_t").collect().head
    // the row at t=20 matches; its null v must NOT be replaced by "old"
    assert(out.isNullAt(0) && out.getLong(1) == 20L)
  }

  test("NULL right timestamps never match (DuckDB ASOF semantics) — " +
      "they must not ride the NULLS FIRST sort as spurious matches") {
    import spark.implicits._
    val left = Seq((1L, "a", 5L)).toDF("lid", "k", "t")
    val right = Seq(("a", None: Option[Long], "phantom"),
        ("a", Some(10L), "late"))
      .toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("r_v").collect().head
    // no right row at-or-before t=5: the NULL-ts row must NOT match
    assert(out.isNullAt(0), "NULL-ts right row leaked as a match")
  }

  test("plans as exchange+sort+window — no join operator, no cartesian") {
    import spark.implicits._
    val left = spark.range(100).select(col("id").as("lid"),
      (col("id") % 5).as("k"), col("id").as("t"))
    val right = spark.range(50).select((col("id") % 5).as("k"),
      (col("id") * 2).as("t"), col("id").as("v"))
    val p = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), s"expected the running window:\n$p")
  }

  test("matches a brute-force range join + rank on random data") {
    import spark.implicits._
    val left = spark.range(200).select(col("id").as("lid"),
      (col("id") % 7).as("k"),
      pmod(xxhash64(col("id")), lit(1000)).as("t"))
    val right = spark.range(300).select((col("id") % 7).as("k"),
      pmod(xxhash64(col("id") + 5000), lit(1000)).as("t"),
      col("id").as("v"))
      // as-of needs unique (k, ts) on the right for determinism
      .groupBy("k", "t").agg(max("v").as("v"))
    val got = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("lid", "r_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("l.t") >= col("r.t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy(col("r.t").desc)))
      .filter(col("rn") === 1)
      .select("lid", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == brute)
  }
}
