package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards: the properties that make these operators
  * scale (pushdown, broadcast choice, partial aggregation, exchange reuse)
  * must survive refactors — a correct-but-shuffle-heavy plan is a
  * regression even when results still match.
  *
  * AQE is disabled here so the compile-time plan is deterministic and the
  * assertions stable (prod/bench runs keep AQE on; it only improves on
  * these shapes at runtime).
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1_agg: shipdate filter pushed to the parquet scan, two-phase agg") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters:") && p.contains("LessThanOrEqual(l_shipdate"),
      s"filter not pushed to scan:\n$p")
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2,
      "expected partial + final HashAggregate (map-side combine)")
  }

  test("q1_agg: scan reads only referenced columns (column pruning)") {
    val p = plan("q1_agg")
    assert(!p.contains("l_comment"), "scan should prune unreferenced columns")
  }

  test("q3_topk_join: dimension join broadcast, global top-k as TakeOrdered") {
    val p = plan("q3_topk_join")
    assert(p.contains("BroadcastHashJoin"), "customer side should broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "orderBy+limit should compile to TakeOrderedAndProject, not a full sort")
  }

  test("knn_exact_cosine: base never shuffles — probe side broadcast") {
    val p = plan("knn_exact_cosine")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "exact kNN must broadcast the probe side against a streaming base scan")
  }

  test("per-query top-k plans as WindowGroupLimit (bounded heaps, no full sort)") {
    // rank-window + filter(rank <= k) must trigger Spark's partial+final
    // WindowGroupLimit so only k rows per query survive each side of the
    // exchange — a full per-partition sort would be the scale regression
    val p = plan("knn_exact_cosine")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter should plan bounded group limits:\n$p")
  }

  test("projected-candidate paths (PCA, MRL) keep BOTH rank cuts as " +
      "WindowGroupLimit — the candidate stage scores n·q rows, so a full " +
      "sort there is the 10M regression") {
    Seq("knn_pca_cosine", "knn_mrl_cosine").foreach { q =>
      val p = plan(q)
      // candidate cut (crank <= rerank, partial+final around the
      // exchange) AND final cut (rank <= k; final-only — the rerank
      // join's output is already query-partitioned)
      assert(p.sliding("WindowGroupLimit".length)
        .count(_ == "WindowGroupLimit") >= 3,
        s"$q: candidate/final rank cuts should plan bounded group limits:\n$p")
      assert(p.contains("Partial"),
        s"$q: the n·q-row candidate side needs a PARTIAL group limit " +
          s"before the exchange:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: unexpected cartesian")
    }
  }

  test("simhash_near_dup: band self-join computes the simhash stage once") {
    val p = plan("simhash_near_dup")
    assert(p.contains("ReusedExchange"),
      "both join inputs must reuse one simhash+band exchange")
    assert(p.contains("ShuffledHashJoin"),
      "band join must not broadcast the (mis-estimated) Generate output")
  }

  test("TextIndex build: linear single-pass plan — one tokenize, no joins") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.operators.TextIndex.postingsFor(docs)
      .queryExecution.executedPlan.toString
    // exactly one regex tokenize of the corpus (the second Generate is
    // the explode over the already-bound token array — the
    // materialization barrier, not a re-split)
    assert("split\\(trim\\(".r.findAllMatchIn(p).size == 1,
      s"the corpus must be tokenized exactly once per build:\n$p")
    assert(!p.contains("Join"),
      s"build must not join (df is serve-time, dl rides in-row):\n$p")
    // OPTIMIZATION r14: dl is size(tokens) carried through the groupBy —
    // ONE exchange total; the old doc_id-window's second exchange is gone
    assert(!p.contains("Window"),
      s"dl must ride in-row, not a doc window:\n$p")
    // anchor to SHUFFLE exchanges: a bare "Exchange" count would also
    // match BroadcastExchange/ReusedExchange nodes (ADVICE r14)
    assert("Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllMatchIn(p).size == 1,
      s"build is one groupBy exchange, nothing else:\n$p")
  }

  test("ngram_jaccard_topk: shingle self-join reuses one exchange") {
    val p = plan("ngram_jaccard_topk")
    assert(p.contains("ReusedExchange"),
      "scan+shingle+shuffle stage must be computed once for both sides")
  }

  test("tfidf_top_terms: document-frequency side is broadcast") {
    val p = plan("tfidf_top_terms")
    assert(p.contains("BroadcastHashJoin"), "df-side join should broadcast")
  }

  test("bucketed tables join and aggregate with zero exchanges") {
    // clean any leftover table/location from an aborted previous run
    for (t <- Seq("lineitem_b", "orders_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    graft.operators.Bucketing.writeBucketed(l, "lineitem_b", "l_orderkey", 8)
    graft.operators.Bucketing.writeBucketed(o, "orders_b", "l_orderkey", 8)
    // at sf0.001 both sides fit the broadcast threshold, which would hide
    // the bucketed path; at real scale neither side broadcasts — simulate
    // that planner state
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.operators.Bucketing.cogroupJoin(spark, "lineitem_b", "orders_b", "l_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange"),
        s"same-bucket join must be shuffle-free:\n$p")
      // aggregation on the bucket key also skips its exchange
      val agg = spark.table("lineitem_b").groupBy("l_orderkey").count()
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"),
        s"groupBy on bucket key must be shuffle-free:\n$ap")
      // results match the unbucketed join
      assert(joined.count() ==
        l.join(o, "l_orderkey").count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
  }

  test("near_dup_embeddings_lsh: bucket-join prefilter, no cartesian anywhere") {
    val p = plan("near_dup_embeddings_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup scale path must stay a bucket equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected an equi-join on the signature key:\n$p")
  }

  test("media_phash_pairs: banded candidates are equi-joins, no cartesian") {
    val p = plan("media_phash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"perceptual-hash dedup must stay a band equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected an equi-join on (band, val):\n$p")
  }

  test("media_phash_pairs_mp: multiprobe stays an equi-join, no cartesian") {
    val p = plan("media_phash_pairs_mp")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"multiprobe banding must stay a band equi-join:\n$p")
  }

  test("media_audio_dup_pairs: exact-fingerprint join, no cartesian") {
    val p = plan("media_audio_dup_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fingerprint dedup must stay an equi-join:\n$p")
  }

  test("knn_filtered_guarantee: predicate pushed to the filtered-base scan; " +
      "probe side broadcast in the exact fallback") {
    val p = plan("knn_filtered_guarantee")
    // the battery predicate (vec_id < 15) forces the exact-fallback branch;
    // its scan must be predicate-pruned, not filter-after-read
    assert(p.contains("PushedFilters") && p.contains("LessThan(vec_id,15)"),
      s"filter not pushed to the filtered-base scan:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"exact fallback must broadcast the probe side against the filtered base:\n$p")
  }

  test("knn_lsh_cosine: signature probe is an equi-join, no cartesian") {
    val p = plan("knn_lsh_cosine")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH kNN must never cross-join base with probes:\n$p")
  }

  test("rrf_fusion: lexical side is an inverted-index equi-join; the only " +
      "non-equi join is the bounded exact-kNN probe broadcast") {
    val p = plan("rrf_fusion")
    assert(!p.contains("CartesianProduct"), s"cartesian in fusion plan:\n$p")
    // exactly one BNLJ: the |Q|-row probe side against the base scan (the
    // exact-kNN kernel); a second one would mean the doc×doc lexical pair
    // generation regressed to a cross join
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size == 1,
      s"expected exactly the exact-kNN probe BNLJ:\n$p")
  }

  test("maxsim_multivec_ivf: cell-gated late-interaction is equi-joins only") {
    val p = plan("maxsim_multivec_ivf")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cell-gated MaxSim must gate docs through the cell equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast equi-joins (cell gate + query bag):\n$p")
  }

  test("maxsim_multivec_lsh: pruned late-interaction is equi-joins only") {
    val p = plan("maxsim_multivec_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pruned MaxSim must gate docs through the signature equi-join:\n$p")
    // the exact rerank broadcasts the (tiny) query bag
    assert(p.contains("BroadcastHashJoin"),
      s"expected the query bag broadcast into the candidate rerank:\n$p")
  }

  test("q_sessions_batch: both windows and the agg share one shuffle") {
    val p = plan("q_sessions_batch")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(p).size
    assert(exchanges == 1,
      s"lag window, running sum and groupBy must share the user_id exchange, got $exchanges:\n$p")
  }

  test("decontaminate: eval shingle set broadcasts — corpus side never shuffles against eval") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"eval shingles must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "decontamination must stay an equi-join on the shingle key")
  }

  test("dataset_mix: pure projection + filter, zero exchanges") {
    val p = plan("dataset_mix")
    assert(!p.contains("Exchange"),
      s"mix sampling must scale with the scan, no shuffle:\n$p")
  }

  test("seq_packing / corpus_pipeline: NO split-partitioned window — the " +
      "running prefix sum is the two-phase GroupedPrefixSum kernel") {
    // `sum OVER (PARTITION BY split ORDER BY doc_id)` has 2-3 window
    // partitions TOTAL: one task sorts and scans ~80% of the corpus at
    // scale (VERDICT r10 #1). A revert to the window formulation puts a
    // Window node (windowspecdefinition on the split key) back into the
    // executed plan — pin its absence.
    Seq("seq_packing", "corpus_pipeline").foreach { q =>
      val p = plan(q)
      assert(!p.matches("(?s).*windowspecdefinition\\((is_train|split)#.*"),
        s"$q: packing regressed to a PARTITION BY split window:\n$p")
    }
    // seq_packing has no other window: its plan must be window-free
    assert(!plan("seq_packing").contains("Window"),
      "seq_packing must carry no window operator at all")
  }

  test("mix_token_budget / train_order_split: window-free — the grouped " +
      "running sum / ordinal is the two-phase kernel, and budgets travel " +
      "as literals (no join)") {
    Seq("mix_token_budget", "train_order_split").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q regressed to a PARTITION BY domain/split window:\n$p")
    }
    val p = plan("mix_token_budget")
    assert(!p.contains("Join"),
      s"budget lookup must be a literal CASE column, not a join:\n$p")
  }

  test("q_qualify_topk_suppliers: partial agg, broadcast dim, bounded rank") {
    val p = plan("q_qualify_topk_suppliers")
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2,
      "revenue agg must map-side combine before the suppkey shuffle")
    assert(p.contains("BroadcastHashJoin"), "supplier dim should broadcast")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=3 filter should plan bounded group limits:\n$p")
  }

  test("q_distinct_on_latest: row_number<=1 prunes before the window sort") {
    val p = plan("q_distinct_on_latest")
    assert(p.contains("WindowGroupLimit"),
      s"DISTINCT ON should keep one row per key pre-exchange:\n$p")
  }

  test("sample_per_source: per-slice sample plans as WindowGroupLimit") {
    val p = plan("sample_per_source")
    assert(p.contains("WindowGroupLimit"),
      s"rk<=25 must bound each group before the exchange:\n$p")
  }

  test("decontaminate_bloom: map-side bloom probe, no broadcast of the big side") {
    val p = plan("decontaminate_bloom")
    assert(p.contains("bloom_might_contain"),
      s"phase-1 bloom prefilter missing from the plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "confirm join must stay an equi-join on the shingle key")
  }

  test("bpe_pack_sequences: vocab join broadcast, no cartesian, no " +
      "single-partition window anywhere in the pack plan") {
    val p = plan("bpe_pack_sequences")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded vocab dictionary must broadcast:\n$p")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), "no all-pairs shapes")
    // the global offsets come from the two-phase GroupedPrefixSum; a
    // `Window` whose partition spec is the split column would be the
    // one-task funnel the operator exists to avoid
    assert(!p.contains("Window [sum"),
      s"running sum must be the two-phase kernel, not a window:\n$p")
  }

  test("pack_from_tokens: UNBOUNDED dictionary must NOT carry a " +
      "broadcast hint — and no split-window regression") {
    val p = plan("pack_from_tokens")
    // at sf scale AQE may still CHOOSE to broadcast the tiny dict; what
    // is pinned is the absence of the all-pairs shapes and the window
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), "no all-pairs shapes")
    assert(!p.contains("Window [sum"),
      s"running sum must be the two-phase kernel, not a window:\n$p")
    // the logical plan must carry NO broadcast hint on the dictionary:
    // the hint would be a 100x-scale OOM for a corpus-sized vocabulary
    val lp = graft.SparkEntry.queries("pack_from_tokens")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!lp.contains("ResolvedHint"),
      s"unbounded dictionary join must be left to size-based planning:\n$lp")
  }

  test("bridge_knn: probe side broadcasts, base never shuffles before " +
      "scoring; per-query top-k plans bounded group limits") {
    val p = plan("bridge_knn")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the probe set must broadcast against the streamed base:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k should plan bounded heaps, not a full per-query sort:\n$p")
  }

  test("cell-clustered store serving: the rerank VECTORS scan carries " +
      "pushed cell filters (row-group pruning), and candidates broadcast") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("planprune").toString + "/idx"
    graft.streaming.IncrementalBqIndex.build(emb, path, numCells = 8)
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("query_vec"))
    val p = graft.streaming.IncrementalBqIndex
      .knnJoin(spark, path, probes, k = 5, nprobe = 1, rerank = 20)
      .queryExecution.executedPlan.toString
    val vecScan = p.linesIterator.find(l =>
      l.contains("/vectors") && l.contains("PushedFilters")).getOrElse("")
    assert(vecScan.contains("In(cell") || vecScan.contains("EqualTo(cell"),
      s"rerank vectors scan must push the probed-cell filter:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"rerank candidates must broadcast (base never shuffles):\n$p")
    graft.streaming.IncrementalBqIndex.drop(spark, path)
  }
}
