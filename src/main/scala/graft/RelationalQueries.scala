package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Qutil.rnd

/** Relational operator battery over the TPC-H-ish tables.
  *
  * Covers the dataflow operators of SURVEY.md §2.2/§2.3: hash aggregation
  * (B7/B13), keyed joins incl. full-outer with null-side splits (B12),
  * semi/anti joins, window ranking & running aggregates (top-k shapes of
  * O12/B5), set ops, rollup, exact floor-index percentiles (B8), temporal
  * bucketing (streaming analog of B4), and scalar string/regex functions.
  *
  * Determinism rules for the DuckDB hash-match gate:
  *  - every floating aggregate is `round`ed (2dp money, 4-6dp ratios) so
  *    summation-order ulp noise between engines cannot flip the hash;
  *  - every rank/limit orders by the *rounded* value with an id tie-break.
  *
  * Scale notes (100 TB): all aggregates here are partial-agg friendly
  * (map-side combine), dimension joins are broadcast, and fact-fact joins
  * shuffle on their join key only. No driver-side loops, no collects.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events table with `ts` normalized to TimestampType regardless of the
    * on-disk layout: older generations stored int64 nanoseconds (read as
    * long under the legacy nanosAsLong conf), newer ones a native
    * timestamp[us]. Downstream queries always see a timestamp. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ->LTZ relabel below is exact only under UTC; pin it here
    // rather than relying on every caller's session config
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet timestamp[us] without tz metadata; sessions run UTC so
        // the NTZ -> LTZ cast is an exact relabel, and downstream
        // unix_micros/window arithmetic needs the LTZ type
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B7/B13-style hash aggregation with partial aggregation (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          rnd(sum("l_quantity"), 2).as("sum_qty"),
          rnd(sum("l_extendedprice"), 2).as("sum_base_price"),
          rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          rnd(avg("l_quantity"), 4).as("avg_qty"),
          rnd(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // multi-way join + agg + deterministic top-k (TPC-H Q3 shape);
    // customer side broadcast, fact join shuffles on the order key.
    "q3_topk_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1999-03-15").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1999-03-15").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg(rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // 5-way star join through region→nation→(customer,supplier) (TPC-H Q5 shape)
    "q5_nation_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    // window ranking: top-3 orders per customer (O12/B5 per-group top-k shape)
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    }),

    // running aggregate (frame-spec window)
    "q_running_sum" -> ((s, dir) => {
      // l_quantity tie-break: the synthetic data has rows that collide on
      // (suppkey, shipdate, orderkey, linenumber) — without it the cumsum
      // at the tie is engine-order-dependent (bit us at sf0.1); with it,
      // any remaining ties are full-row duplicates whose cumsum is
      // order-invariant
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          rnd(sum("l_quantity").over(w), 2).as("running_qty"))
    }),

    // lag/lead analytics
    "q_lag_delta" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          rnd(col("o_totalprice") - lag("o_totalprice", 1).over(w), 2).as("delta"))
    }),

    // semi join (EXISTS)
    "q_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // anti join (NOT EXISTS) — also B12's missing-key side-output shape
    "q_anti_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // full-outer keyed comparison join (B12: bench report join shape)
    "q_fullouter_compare" -> ((s, dir) => {
      val cc = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("c_cnt"))
      val sc = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("s_cnt"))
      cc.join(sc, col("nk_c") === col("nk_s"), "full_outer")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nk"),
          col("c_cnt"), col("s_cnt"))
    }),

    // set ops: INTERSECT (customers with both open and finished orders)
    "q_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    }),

    // set ops: EXCEPT
    "q_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    }),

    // grouping sets via ROLLUP
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(rnd(sum("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_price"), col("n"))
    }),

    // exact floor-index nearest-rank percentiles (B8 semantics:
    // sorted[floor(p/100*(n-1))] — reference src/bench/metrics.ts:51-57),
    // via the custom FloorPercentiles Aggregator (Spark's percentile()
    // interpolates and can never hash-match the reference summary)
    "q_percentile_floor" -> ((s, dir) => {
      import graft.functions.FloorPercentiles.floor_percentiles
      events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          floor_percentiles(col("value"), Seq(0.50, 0.90, 0.95, 0.99)).as("pcts"))
        .select(col("event_type"), col("n"),
          rnd(element_at(col("pcts"), 1), 6).as("p50"),
          rnd(element_at(col("pcts"), 2), 6).as("p90"),
          rnd(element_at(col("pcts"), 3), 6).as("p95"),
          rnd(element_at(col("pcts"), 4), 6).as("p99"))
    }),

    // temporal bucketing: monthly order rollup
    "q_orders_by_month" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          rnd(sum("o_totalprice"), 2).as("total"))
    }),

    // hourly tumbling-window event aggregation (batch form of the
    // Structured Streaming pipeline in graft.streaming)
    "q_events_hourly" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"), rnd(sum("value"), 4).as("sum_value"))
    }),

    // global top-k (TakeOrderedAndProject physical op)
    "q_topk_global" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    }),

    // exact distinct aggregation
    "q_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(countDistinct("l_partkey").as("n_parts"),
          count(lit(1)).as("n_items"))
    }),

    // HAVING filter over aggregate
    "q_having" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(rnd(avg("p_retailprice"), 4).as("avg_price"), count(lit(1)).as("n"))
        .filter(col("n") > 5)
    }),

    // conditional aggregation (manual pivot)
    "q_case_pivot" -> ((s, dir) => {
      def flagSum(f: String) =
        rnd(sum(when(col("l_returnflag") === f, col("l_extendedprice")).otherwise(0.0)), 2)
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(flagSum("R").as("r_price"), flagSum("A").as("a_price"),
          flagSum("N").as("n_price"))
    }),

    // scalar string functions + LIKE pushdown
    "q_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_name").like("%a%"))
        .select(col("p_partkey"), upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 10).as("name10"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("bt"))
    }),

    // regex extraction from semi-structured JSON-ish strings
    "q_json_extract" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
    }),

    // calendar/date scalar family (engines agree on these fields; weekday
    // numbering deliberately avoided — Spark and DuckDB disagree on it)
    "q_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        date_add(col("o_orderdate").cast("date"), 90).as("due_date"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week_start"))),

    // higher-order array functions over grouped order keys: transform,
    // filter, aggregate (lambda forms) — all inside whole-stage codegen
    "q_array_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sort_array(collect_list(col("o_orderkey"))).as("keys"))
        .select(col("o_custkey"),
          size(col("keys")).as("n"),
          element_at(col("keys"), 1).as("first_key"),
          expr("size(filter(keys, x -> x % 2 = 0))").as("n_even"),
          expr("aggregate(transform(keys, x -> x * 2L), 0L, (a, x) -> a + x)")
            .as("double_sum"),
          expr("size(array_distinct(transform(keys, x -> x % 10)))")
            .as("n_mod_groups"))),

    // Morton (z-order) key arithmetic — the data-skipping layout key
    // (operators.ZOrder): unrolled shift/mask interleave of two key
    // columns, whole-stage codegen, exact integer arithmetic mirrored in
    // the oracle. The layout itself (repartitionByRange + in-file sort +
    // measured row-group skipping) is spec- and BASELINE-gated; this
    // entry pins the key arithmetic cross-engine.
    "zorder_key" -> ((s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          graft.operators.ZOrder.zvalue(col("l_partkey"), col("l_suppkey"),
            bits = 16).as("zkey")))
  )

  val oracle: Map[String, String] = Map(
    "zorder_key" -> {
      val z = graft.operators.ZOrder.duckdbZExpr(
        "CAST(l_partkey AS BIGINT)", "CAST(l_suppkey AS BIGINT)", bits = 16)
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         | $z AS zkey
         |FROM lineitem WHERE l_orderkey < 300""".stripMargin
    },
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | floor((sum(l_quantity))*1e2 + 0.5)/1e2 AS sum_qty,
        | floor((sum(l_extendedprice))*1e2 + 0.5)/1e2 AS sum_base_price,
        | floor((sum(l_extendedprice*(1-l_discount)))*1e2 + 0.5)/1e2 AS sum_disc_price,
        | floor((avg(l_quantity))*1e4 + 0.5)/1e4 AS avg_qty,
        | floor((avg(l_discount))*1e4 + 0.5)/1e4 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_join" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        | floor((sum(l_extendedprice*(1-l_discount)))*1e2 + 0.5)/1e2 AS revenue
        |FROM customer JOIN orders ON c_custkey=o_custkey
        | JOIN lineitem ON l_orderkey=o_orderkey
        |WHERE c_mktsegment='BUILDING'
        | AND o_orderdate < TIMESTAMP '1999-03-15'
        | AND l_shipdate > TIMESTAMP '1999-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        | floor((sum(l_extendedprice*(1-l_discount)))*1e2 + 0.5)/1e2 AS revenue
        |FROM customer JOIN orders ON c_custkey=o_custkey
        | JOIN lineitem ON l_orderkey=o_orderkey
        | JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        | JOIN nation ON s_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3""".stripMargin,
    "q_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | floor((sum(l_quantity) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))*1e2 + 0.5)/1e2 AS running_qty
        |FROM lineitem""".stripMargin,
    "q_lag_delta" ->
      """SELECT o_custkey, o_orderkey,
        | floor((o_totalprice - lag(o_totalprice,1) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))*1e2 + 0.5)/1e2 AS delta
        |FROM orders""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,
    "q_fullouter_compare" ->
      """WITH cc AS (SELECT c_nationkey AS nk_c, count(*) AS c_cnt
        |            FROM customer GROUP BY 1),
        |     sc AS (SELECT s_nationkey AS nk_s, count(*) AS s_cnt
        |            FROM supplier GROUP BY 1)
        |SELECT coalesce(nk_c, nk_s) AS nk, c_cnt, s_cnt
        |FROM cc FULL OUTER JOIN sc ON nk_c=nk_s""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus='O'""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus='O'""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf,
        | coalesce(l_linestatus,'ALL') AS ls,
        | floor((sum(l_extendedprice))*1e2 + 0.5)/1e2 AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_percentile_floor" ->
      """WITH g AS (SELECT event_type, list_sort(list(value)) AS vs, count(*) AS n
        |           FROM events GROUP BY event_type)
        |SELECT event_type, n,
        | floor((vs[CAST(floor(0.50*(n-1)) AS INT)+1])*1e6 + 0.5)/1e6 AS p50,
        | floor((vs[CAST(floor(0.90*(n-1)) AS INT)+1])*1e6 + 0.5)/1e6 AS p90,
        | floor((vs[CAST(floor(0.95*(n-1)) AS INT)+1])*1e6 + 0.5)/1e6 AS p95,
        | floor((vs[CAST(floor(0.99*(n-1)) AS INT)+1])*1e6 + 0.5)/1e6 AS p99
        |FROM g""".stripMargin,
    "q_orders_by_month" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        | count(*) AS n_orders, floor((sum(o_totalprice))*1e2 + 0.5)/1e2 AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
        | count(*) AS n, floor((sum(value))*1e4 + 0.5)/1e4 AS sum_value
        |FROM events GROUP BY 1,2""".stripMargin,
    "q_topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "q_having" ->
      """SELECT p_brand, floor((avg(p_retailprice))*1e4 + 0.5)/1e4 AS avg_price, count(*) AS n
        |FROM part GROUP BY p_brand HAVING count(*) > 5""".stripMargin,
    "q_case_pivot" ->
      """SELECT l_suppkey,
        | floor((sum(CASE WHEN l_returnflag='R' THEN l_extendedprice ELSE 0 END))*1e2 + 0.5)/1e2 AS r_price,
        | floor((sum(CASE WHEN l_returnflag='A' THEN l_extendedprice ELSE 0 END))*1e2 + 0.5)/1e2 AS a_price,
        | floor((sum(CASE WHEN l_returnflag='N' THEN l_extendedprice ELSE 0 END))*1e2 + 0.5)/1e2 AS n_price
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        | substr(p_name,1,10) AS name10, length(p_name) AS name_len,
        | p_brand || '#' || p_type AS bt
        |FROM part WHERE p_name LIKE '%a%'""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS y,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | CAST(month(o_orderdate) AS INT) AS m,
        | CAST(day(o_orderdate) AS INT) AS d,
        | datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        | CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS due_date,
        | CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start
        |FROM orders""".stripMargin,
    "q_array_funcs" ->
      """WITH g AS (SELECT o_custkey,
        |   list_sort(list(o_orderkey)) AS keys
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey,
        | CAST(len(keys) AS INT) AS n,
        | keys[1] AS first_key,
        | CAST(len(list_filter(keys, x -> x % 2 = 0)) AS INT) AS n_even,
        | CAST(list_aggregate(list_transform(keys, x -> x * 2), 'sum') AS BIGINT)
        |   AS double_sum,
        | CAST(len(list_distinct(list_transform(keys, x -> x % 10))) AS INT)
        |   AS n_mod_groups
        |FROM g""".stripMargin
  )
}
