package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Qutil.rnd

/** Advanced relational operators: as-of join, range join, statistical
  * aggregates, ranking-function family, array aggregation, correlated
  * scalar subquery, CUBE, argmin/argmax.
  *
  * The as-of join is the scale-interesting one: instead of a per-row
  * subquery or a range join, tag both sides, union, and carry the latest
  * right-side row forward with a window — ONE shuffle on (key), linear
  * work, no quadratic blow-up; this is the standard distributed as-of
  * shape (same plan Flink/kdb-style engines use). DuckDB's native
  * ASOF JOIN is the oracle.
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    RelationalQueries.events(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // as-of join: for each purchase, the most recent prior-or-equal click
    // of the same user — the REUSABLE operators.AsofJoin (round-1's
    // inline union-tag formulation promoted to a general operator: one
    // shuffle + sort + running window, no range explosion, atomic
    // struct payload; spec-pinned against a brute-force range join)
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      // dedupe clicks on (user, ts): keep max event_id — makes the as-of
      // pick deterministic in both engines when click times tie
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      graft.operators.AsofJoin.backward(purchases, clicks,
          keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          payload = Seq("click_id"))
        .select(col("purchase_id"), col("user_id"), col("ts"),
          col("r_click_id").as("prev_click_id"))
    }),

    // batch gap-sessionization (the batch twin of the streaming
    // EventPipeline.sessionize): lag → new-session flag → running sum as
    // session ordinal → one groupBy. Two window passes + one agg, all on
    // the same (user_id) partitioning — a single shuffle at any scale.
    "q_sessions_batch" -> ((s, dir) => {
      val gapMin = 30
      val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(wo))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMin * 60000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_seq", sum("new_sess").over(wrun))
        .groupBy("user_id", "sess_seq")
        .agg(count(lit(1)).as("n_events"),
          rnd(sum("value"), 4).as("total_value"),
          min("ts").as("session_start"), max("ts").as("session_end"))
    }),

    // explicit GROUPING SETS (finer than cube/rollup): order totals by
    // (status, priority), by status alone, and grand total, one pass
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS st,
          |  coalesce(o_orderpriority, 'ALL') AS pr,
          |  count(*) AS n,
          |  floor(sum(o_totalprice)*1e2 + 0.5)/1e2 AS total
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          |                        (o_orderstatus), ())""".stripMargin)
    }),

    // RANGE frame windows: per customer, rolling 30-day order count and
    // spend ending at each order date (event-time frame, not row frame)
    "q_window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30L * 86400 * 1000000L, 0)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          count(lit(1)).over(w).as("n_30d"),
          rnd(sum("o_totalprice").over(w), 2).as("spend_30d"))
    }),

    // per-group z-score outlier flagging (anomaly detection shape: one
    // agg + one broadcast join back, both partial-agg friendly)
    "q_zscore_outliers" -> ((s, dir) => {
      val ev = events(s, dir)
      val stats = ev.groupBy(col("event_type").as("et"))
        .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
      ev.join(broadcast(stats), col("event_type") === col("et"))
        .select(col("event_id"), col("event_type"),
          rnd((col("value") - col("mu")) / col("sd"), 6).as("z"))
        .filter(abs(col("z")) > 2.5)
    }),

    // correlated EXISTS subquery (decorrelates to a left-semi join):
    // customers having at least one urgent open order
    "q_exists_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_ex")
      t(s, dir, "orders").createOrReplaceTempView("orders_ex")
      s.sql(
        """SELECT c_custkey, c_name, c_mktsegment
          |FROM customer_ex c
          |WHERE EXISTS (SELECT 1 FROM orders_ex o
          |  WHERE o.o_custkey = c.c_custkey
          |    AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')""".stripMargin)
    }),

    // NOT IN subquery with guaranteed non-null keys (anti-join plan)
    "q_not_in_subquery" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part_ni")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_ni")
      s.sql(
        """SELECT p_partkey, p_brand
          |FROM part_ni
          |WHERE p_partkey NOT IN
          |  (SELECT l_partkey FROM lineitem_ni WHERE l_quantity >= 45)""".stripMargin)
    }),

    // window navigation family: first/last/nth value over a running frame
    "q_window_nav" -> ((s, dir) => {
      val wRun = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        first("o_orderkey").over(wRun).as("first_key"),
        last("o_orderkey").over(wAll).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(wAll).as("second_key"))
    }),

    // range join: lineitems shipped within 30 days of their order date
    "q_range_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_fast_items"),
          rnd(sum("l_quantity"), 2).as("fast_qty"))
    }),

    // statistical aggregates incl. cross-column correlation with the
    // regex-extracted numeric from the JSON-ish props column
    "q_stats_agg" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("double"))
        .groupBy("event_type")
        .agg(rnd(stddev_samp(col("value")), 6).as("sd_value"),
          rnd(var_samp(col("value")), 6).as("var_value"),
          rnd(covar_samp(col("value"), col("k")), 6).as("cov_vk"),
          rnd(corr(col("value"), col("k")), 6).as("corr_vk"),
          rnd(min("value"), 6).as("min_v"), rnd(max("value"), 6).as("max_v"))
    }),

    // ranking-function family over a tie-free ordering
    "q_rank_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        rnd(percent_rank().over(w), 6).as("prnk"),
        rnd(cume_dist().over(w), 6).as("cdist"))
    }),

    // array aggregation: sorted distinct set folded to a string
    "q_array_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
          count(lit(1)).as("n_orders"))),

    // correlated scalar subquery shape: parts priced above their brand mean
    "q_scalar_subquery" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val brandAvg = p.groupBy(col("p_brand").as("b"))
        .agg(avg("p_retailprice").as("brand_avg"))
      p.join(broadcast(brandAvg), col("p_brand") === col("b"))
        .filter(col("p_retailprice") > col("brand_avg"))
        .select(col("p_partkey"), col("p_brand"),
          rnd(col("p_retailprice") - col("brand_avg"), 4).as("above_by"))
    }),

    // grouping sets via CUBE
    "q_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), rnd(sum("o_totalprice"), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
          col("n"), col("total"))),

    // UNION ALL with tags + post-union aggregation
    "q_union_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val high = o.filter(col("o_totalprice") > 150000)
        .select(lit("high_value").as("bucket"), col("o_orderkey"))
      val fin = o.filter(col("o_orderstatus") === "F")
        .select(lit("finished").as("bucket"), col("o_orderkey"))
      high.unionByName(fin)
        .groupBy("bucket").agg(count(lit(1)).as("n"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),

    // sketch aggregates (HLL++ / GK-quantile): implementations differ
    // across engines by design, so the gate is the rows-only check plus an
    // in-query sanity bound against the exact values
    "q_approx_sketch" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey").as("approx_parts"),
          countDistinct("l_partkey").as("exact_parts"),
          rnd(expr("approx_percentile(l_extendedprice, 0.5, 1000)"), 2).as("approx_p50"))
        .withColumn("approx_ok",
          abs(col("approx_parts") - col("exact_parts"))
            < col("exact_parts") * 0.1 + 10)),

    // argmin/argmax aggregates (min_by/max_by) over a unique ordering key
    "q_minmax_by" -> ((s, dir) =>
      events(s, dir)
        .groupBy("user_id")
        .agg(min_by(col("event_type"), col("event_id")).as("first_type"),
          max_by(col("event_type"), col("event_id")).as("last_type"),
          rnd(max_by(col("value"), col("event_id")), 6).as("last_value"))),

    // QUALIFY semantics (window-function filter after agg+join): top-3
    // suppliers by lineitem revenue per nation. Partial agg on l_suppkey,
    // broadcast the supplier dim, WindowGroupLimit prunes per-partition —
    // one shuffle for the agg, one for the window, at any scale.
    "q_qualify_topk_suppliers" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      rev.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey"), col("l_suppkey").as("supp_key"), col("revenue"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("s_nationkey")
            .orderBy(col("revenue").desc, col("supp_key"))))
        .filter(col("rnk") <= 3)
    }),

    // batch twin of the streaming stream-stream interval join (click
    // attribution): purchases x same-user clicks in the prior 30 minutes.
    // The SAME clickAttribution plan serves readStream in production;
    // here the oracle gate hash-checks it on the batch events table.
    "q_click_attrib" -> ((s, dir) =>
      graft.streaming.EventPipeline.clickAttribution(events(s, dir))),

    // last-touch attribution over the LEFT-OUTER streaming twin: every
    // purchase keeps exactly one row — its most recent in-window click,
    // or null columns when none qualifies (the marketing-standard
    // contract). WindowGroupLimit bounds the per-purchase pick.
    "q_click_attrib_last" -> ((s, dir) => {
      val joined = graft.streaming.EventPipeline
        .clickAttributionOuter(events(s, dir))
      val w = Window.partitionBy("purchase_id")
        .orderBy(col("c_ts").desc_nulls_last, col("click_id").desc_nulls_last)
      joined.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }),

    // DISTINCT ON semantics: each customer's latest order (ties broken by
    // highest orderkey — a total order, required for cross-engine parity).
    // row_number + filter = the distributed DISTINCT ON; WindowGroupLimit
    // keeps only one row per key before the final sort.
    "q_distinct_on_latest" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sessions_batch" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |   CASE WHEN lag(ts) OVER w IS NULL
        |     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | seq AS (
        |  SELECT user_id, ts, value,
        |   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
        |  FROM flagged)
        |SELECT user_id, sess_seq, count(*) AS n_events,
        | floor((sum(value))*1e4 + 0.5)/1e4 AS total_value,
        | min(ts) AS session_start, max(ts) AS session_end
        |FROM seq GROUP BY user_id, sess_seq""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        | coalesce(o_orderpriority, 'ALL') AS pr,
        | count(*) AS n,
        | floor(sum(o_totalprice)*1e2 + 0.5)/1e2 AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())""".stripMargin,
    "q_window_range_frame" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        | count(*) OVER w AS n_30d,
        | floor((sum(o_totalprice) OVER w)*1e2 + 0.5)/1e2 AS spend_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |  RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_zscore_outliers" ->
      """WITH st AS (SELECT event_type AS et, avg(value) AS mu,
        |   stddev_samp(value) AS sd FROM events GROUP BY 1)
        |SELECT event_id, event_type,
        | floor(((value - mu)/sd)*1e6 + 0.5)/1e6 AS z
        |FROM events JOIN st ON event_type = et
        |WHERE abs(floor(((value - mu)/sd)*1e6 + 0.5)/1e6) > 2.5""".stripMargin,
    "q_exists_subquery" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')""".stripMargin,
    "q_not_in_subquery" ->
      """SELECT p_partkey, p_brand
        |FROM part
        |WHERE p_partkey NOT IN
        |  (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)""".stripMargin,
    "q_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER wr AS first_key,
        | last_value(o_orderkey) OVER wa AS last_key,
        | nth_value(o_orderkey, 2) OVER wa AS second_key
        |FROM orders
        |WINDOW wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        | wa AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type='click' GROUP BY user_id, ts),
        | purchases AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type='purchase')
        |SELECT p.purchase_id, p.user_id, p.ts, c.click_id AS prev_click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin,
    "q_range_join" ->
      """SELECT o_orderkey, count(*) AS n_fast_items,
        | floor((sum(l_quantity))*1e2 + 0.5)/1e2 AS fast_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey""".stripMargin,
    "q_stats_agg" ->
      """WITH e AS (SELECT event_type, value,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS DOUBLE) AS k
        | FROM events)
        |SELECT event_type,
        | floor((stddev_samp(value))*1e6 + 0.5)/1e6 AS sd_value,
        | floor((var_samp(value))*1e6 + 0.5)/1e6 AS var_value,
        | floor((covar_samp(value, k))*1e6 + 0.5)/1e6 AS cov_vk,
        | floor((corr(value, k))*1e6 + 0.5)/1e6 AS corr_vk,
        | floor((min(value))*1e6 + 0.5)/1e6 AS min_v,
        | floor((max(value))*1e6 + 0.5)/1e6 AS max_v
        |FROM e GROUP BY event_type""".stripMargin,
    "q_rank_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | dense_rank() OVER w AS drnk,
        | ntile(4) OVER w AS quartile,
        | floor((percent_rank() OVER w)*1e6 + 0.5)/1e6 AS prnk,
        | floor((cume_dist() OVER w)*1e6 + 0.5)/1e6 AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "q_array_agg" ->
      """SELECT o_custkey,
        | array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT p_partkey, p_brand,
        | floor((p_retailprice - (SELECT avg(p2.p_retailprice) FROM part p2
        |   WHERE p2.p_brand = part.p_brand))*1e4 + 0.5)/1e4 AS above_by
        |FROM part
        |WHERE p_retailprice > (SELECT avg(p3.p_retailprice) FROM part p3
        |  WHERE p3.p_brand = part.p_brand)""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st,
        | coalesce(o_orderpriority,'ALL') AS pr,
        | count(*) AS n, floor((sum(o_totalprice))*1e2 + 0.5)/1e2 AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_union_all" ->
      """SELECT bucket, count(*) AS n, min(o_orderkey) AS min_key,
        | max(o_orderkey) AS max_key
        |FROM (
        |  SELECT 'high_value' AS bucket, o_orderkey FROM orders
        |  WHERE o_totalprice > 150000
        |  UNION ALL
        |  SELECT 'finished' AS bucket, o_orderkey FROM orders
        |  WHERE o_orderstatus='F')
        |GROUP BY bucket""".stripMargin,
    "q_minmax_by" ->
      """SELECT user_id,
        | min_by(event_type, event_id) AS first_type,
        | max_by(event_type, event_id) AS last_type,
        | floor((max_by(value, event_id))*1e6 + 0.5)/1e6 AS last_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q_qualify_topk_suppliers" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |   floor((sum(l_extendedprice*(1-l_discount)))*1e2 + 0.5)/1e2 AS revenue
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_nationkey, l_suppkey AS supp_key, revenue,
        | row_number() OVER (PARTITION BY s_nationkey
        |   ORDER BY revenue DESC, l_suppkey) AS rnk
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |QUALIFY rnk <= 3""".stripMargin,
    "q_click_attrib" ->
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
        | c.event_id AS click_id, c.ts AS c_ts, p.value
        |FROM events p JOIN events c
        | ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 30*60*1000000""".stripMargin,
    "q_click_attrib_last" ->
      """WITH j AS (
        | SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
        |  c.event_id AS click_id, c.ts AS c_ts, p.value
        | FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        | LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        |  AND epoch_us(c.ts) <= epoch_us(p.ts)
        |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 30*60*1000000)
        |SELECT purchase_id, user_id, p_ts, click_id, c_ts, value FROM (
        | SELECT *, row_number() OVER (PARTITION BY purchase_id
        |   ORDER BY c_ts DESC NULLS LAST, click_id DESC NULLS LAST) AS rn
        | FROM j) WHERE rn = 1""".stripMargin,
    "q_distinct_on_latest" ->
      """SELECT DISTINCT ON (o_custkey)
        | o_custkey, o_orderkey, o_orderdate, o_totalprice
        |FROM orders
        |ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC""".stripMargin
  )
}
