package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, s"dom${i % 3}", 10L + i % 7))
    .toDF("doc_id", "domain", "n_tokens")

  test("greedy prefix under the seeded order: a doc is selected iff " +
      "its domain's budget is not exhausted when it starts") {
    val df = corpus(300)
    val budgets = Map("dom0" -> 200L, "dom1" -> 55L, "dom2" -> 100000L)
    val got = Mixing.tokenBudget(df, "domain", col("n_tokens"), budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toList

    // brute-force reference: same hash, same order, same greedy rule
    val hashed = df.select(col("doc_id"), col("domain"), col("n_tokens"),
        graft.Qutil.md5Long60(concat(lit("mixbudget:"), col("doc_id")))
          .as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val want = hashed.groupBy(_._2).toList.flatMap { case (dom, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).flatMap { case (id, d, n, _) =>
        val start = cum; cum += n
        if (start < budgets(d)) Some((id, d, n, cum)) else None
      }
    }
    assert(got.toSet == want.toSet)

    // selected token totals land in [budget, budget + max_doc) for
    // domains with enough supply; undersized budgets keep the whole
    // domain (dom2 here)
    val byDom = got.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._3).sum }
    assert(byDom("dom0") >= 200L && byDom("dom0") < 200L + 17L)
    assert(byDom("dom1") >= 55L && byDom("dom1") < 55L + 17L)
    assert(byDom("dom2") ==
      hashed.filter(_._2 == "dom2").map(_._3).sum) // whole domain
  }

  test("domains absent from the budget map are dropped; a zero budget " +
      "selects nothing; selection is partition-layout invariant") {
    val df = corpus(200)
    val budgets = Map("dom0" -> 120L, "dom1" -> 0L)
    val a = Mixing.tokenBudget(df, "domain", col("n_tokens"), budgets)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(Mixing.tokenBudget(df, "domain", col("n_tokens"), budgets)
      .filter(col("domain") =!= "dom0").count() == 0L)
    val b = Mixing.tokenBudget(df.repartition(7), "domain",
        col("n_tokens"), budgets)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b, "the mix must be a pure function of (salt, data)")
    assert(a.nonEmpty)
  }

  test("duplicate ids throw (total-order guard) and negative budgets " +
      "are rejected") {
    val dup = Seq((1L, "dom0", 5L), (1L, "dom0", 5L))
      .toDF("doc_id", "domain", "n_tokens")
    val e = intercept[Exception] {
      Mixing.tokenBudget(dup, "domain", col("n_tokens"),
        Map("dom0" -> 10L)).collect()
    }
    assert(e.getMessage.contains("total order"))
    intercept[IllegalArgumentException] {
      Mixing.tokenBudget(dup, "domain", col("n_tokens"),
        Map("dom0" -> -1L))
    }
    // negative token counts (e.g. size(split(null)) = -1 under legacy
    // sizeOfNull) would re-admit documents after exhaustion — throw
    val neg = Seq((1L, "dom0", 5L), (2L, "dom0", -1L))
      .toDF("doc_id", "domain", "n_tokens")
    val e2 = intercept[Exception] {
      Mixing.tokenBudget(neg, "domain", col("n_tokens"),
        Map("dom0" -> 10L)).collect()
    }
    assert(e2.getMessage.contains("negative token count"))
  }

  test("streamingTokenBudget: the budget drains across micro-batches — " +
      "stream-long selection equals the per-batch greedy reference, " +
      "exhausted domains stop selecting, and a batch replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("mixstream").toString
    val budgets = Map("dom0" -> 260L, "dom1" -> 40L)
    def rows(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"dom${i % 3}", 10L + i % 7))
    val source = MemoryStream[(Long, String, Long)]
    val q = Mixing.streamingTokenBudget(
      source.toDF().toDF("doc_id", "domain", "n_tokens"),
      path, s"$path-ckpt", "domain", col("n_tokens"), budgets)
    source.addData(rows(0, 40): _*); q.processAllAvailable()
    source.addData(rows(40, 80): _*); q.processAllAvailable()
    source.addData(rows(80, 120): _*); q.processAllAvailable()
    q.stop()

    // reference: apply the BATCH operator batch-by-batch, draining
    var remaining = budgets
    val want = Seq((0, 40), (40, 80), (80, 120)).flatMap { case (lo, hi) =>
      val sel = Mixing.tokenBudget(rows(lo, hi).toDF("doc_id", "domain",
          "n_tokens"), "domain", col("n_tokens"), remaining)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      remaining = remaining.map { case (d, b) =>
        d -> math.max(0L, b - sel.filter(_._2 == d).map(_._3).sum)
      }
      sel
    }.toSet
    def got() = Mixing.selected(spark, path)
      .select("doc_id", "domain", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got() == want)

    // drain state: dom1's 40-token budget exhausts inside batch 1
    val d = Mixing.describe(spark, path, budgets, "domain")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(d("dom1")._4, "dom1 must be exhausted")
    assert(d("dom1")._2 >= 40L && d("dom1")._3 == 0L)
    // exhausted domain selects nothing in later epochs
    assert(Mixing.selected(spark, path)
      .filter(col("domain") === "dom1" && col("epoch") > 0).count() == 0L)

    // the drain summaries (what the policy reads — O(epochs x domains))
    // agree exactly with the selected data they summarize
    val fromDrain = spark.read.parquet(s"$path/drain")
      .groupBy("domain").agg(sum("consumed_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromData = Mixing.selected(spark, path)
      .groupBy("domain").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromDrain == fromData)

    // replay idempotence: re-running the LAST batch's mixBatch with the
    // same batchId recomputes identical state and overwrites itself
    val before = got()
    Mixing.mixBatch(rows(80, 120).toDF("doc_id", "domain", "n_tokens"),
      batchId = 2L, path, "domain", col("n_tokens"), budgets)
    assert(got() == before)
  }

  test("withGroupedOrdinal: dense 0-based per group, equals the " +
      "window row_number()-1, invariant to partitioning") {
    val df = corpus(150).withColumn("k",
      graft.Qutil.md5Long60(concat(lit("o:"), col("doc_id"))))
    val got = Ordinal.withGroupedOrdinal(df, "ord", Seq("domain"),
      Seq(col("k"), col("doc_id")),
      uniqueKeyCols = Seq("domain", "doc_id"))
    val want = df.withColumn("ord",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("domain").orderBy(col("k"), col("doc_id"))) - 1)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "ord").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(got) == m(want.withColumn("ord", col("ord").cast("long"))))
    val re = Ordinal.withGroupedOrdinal(df.repartition(11), "ord",
      Seq("domain"), Seq(col("k"), col("doc_id")),
      uniqueKeyCols = Seq("domain", "doc_id"))
    assert(m(re) == m(got))
    // per-group density: sorted ordinals are exactly 0..n-1
    got.groupBy("domain").agg(count(lit(1)).as("n"), max("ord").as("mx"),
        min("ord").as("mn"), countDistinct("ord").as("nd"))
      .collect().foreach { r =>
        val (n, mx, mn, nd) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(nd === n) // distinct = count
        assert(mn === 0L)
        assert(mx === n - 1)
      }
  }
}
