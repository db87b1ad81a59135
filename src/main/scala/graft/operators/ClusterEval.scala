package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-quality evaluation of a trained coarse quantizer against
  * ground-truth labels: PURITY (fraction of points whose cell's majority
  * label is their own) and NMI (mutual information between the cell and
  * label partitions, normalized by sqrt(H(cells)·H(labels)) — the
  * standard external clustering metrics a curation pipeline reports
  * before trusting cluster-keyed operators (SemDeDup cells, prototype
  * pruning, IVF routing) on labeled data.
  *
  * Scale shape: one corpus join + one (cell,label) aggregation — the
  * contingency table is C×L rows (tiny by construction), and every
  * downstream aggregate runs over it, so the whole metric costs one
  * corpus pass. Counts are exact integers; the log arithmetic runs in
  * double with identical per-term expressions cross-engine and a final
  * 1e-6 fixed-point rounding (summation-order noise ~1e-14 against a
  * 1e-6 grain — the unigram_surprisal regime), so the metric
  * oracle-checks from the same trained centroid literals as knn_ivf.
  */
object ClusterEval {

  /** One row: (n_points, n_cells, n_labels, purity, nmi). `labels` must
    * carry (idCol, labelCol); points without a label row are excluded
    * (inner join — both engines agree). NMI is NULL when either
    * partition has a single block (zero entropy). */
  def eval(model: IvfFlat.Model, labels: DataFrame,
      idCol: String = "vec_id", labelCol: String = "label",
      digits: Int = 6): DataFrame = {
    // OPTIMIZATION r14 (guide §2.4): the first cut materialized seven
    // separate aggregates over `cont` (cellTot/labTot/tot/mi/hc/hl/pur)
    // and cross-joined them — Catalyst duplicated the whole
    // assigned-join-groupBy subtree into every branch (113 Exchanges,
    // 28 BroadcastHashJoins, a 1415-line physical plan; the corpus was
    // assigned and joined 7×). The contingency table is C×L rows (tiny
    // by construction), so the marginals ride WINDOWS over it instead:
    // one corpus pass, one (cell,label) aggregation, three window
    // passes over the tiny table, one final global aggregate — 6
    // Exchanges total, every term arithmetically identical (same
    // per-row expressions, same double sums at the same 1e-6 grain).
    // The whole-table window moves the C×L rows to one partition —
    // bounded by construction (≤ cells × labels).
    import org.apache.spark.sql.expressions.Window
    val assigned = model.assigned.select(col("id").as("vec_id"), col("cell"))
    val joined = assigned.join(
      labels.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).cast("long").as("label")), Seq("vec_id"))
    val cont = joined.groupBy("cell", "label").agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy("cell")
    val wl = Window.partitionBy("label")
    val enriched = cont
      .withColumn("a", sum("c").over(wc))
      .withColumn("mxc", max("c").over(wc))
      .withColumn("rc", row_number().over(wc.orderBy(col("label"))))
      .withColumn("b", sum("c").over(wl))
      .withColumn("rl", row_number().over(wl.orderBy(col("cell"))))
      .withColumn("n", sum("c").over(Window.partitionBy()))
    val miTerm = (col("c").cast("double") / col("n")) *
      log((col("c").cast("double") * col("n")) /
        (col("a").cast("double") * col("b")))
    // per-cell / per-label terms counted once via the rank-1 row of each
    // window (cont has exactly one row per (cell,label), so rc/rl are
    // deterministic); counts coalesce to 0 on empty input exactly as the
    // old count(*)-over-empty aggregates did
    val agg = enriched.agg(
      sum("c").as("n_points"),
      coalesce(sum(when(col("rc") === 1, 1L)), lit(0L)).as("n_cells"),
      coalesce(sum(when(col("rl") === 1, 1L)), lit(0L)).as("n_labels"),
      sum(when(col("rc") === 1, col("mxc"))).as("pure_n"),
      sum(miTerm).as("mi"),
      sum(when(col("rc") === 1,
        -(col("a").cast("double") / col("n")) *
          log(col("a").cast("double") / col("n")))).as("hc"),
      sum(when(col("rl") === 1,
        -(col("b").cast("double") / col("n")) *
          log(col("b").cast("double") / col("n")))).as("hl"))
    agg.select(col("n_points"), col("n_cells"), col("n_labels"),
      graft.Qutil.rnd(col("pure_n").cast("double") / col("n_points"), digits)
        .as("purity"),
      when(col("hc") > 0.0 && col("hl") > 0.0,
        graft.Qutil.rnd(col("mi") / sqrt(col("hc") * col("hl")), digits))
        .as("nmi"))
  }

  /** DuckDB twin from trained-centroid literals: the [[SemDedup]]
    * assignment CTE, then the identical contingency/entropy expressions
    * and the same 1e-6 rounding. */
  def duckdbSql(centroids: Array[(Int, Array[Float])],
      digits: Int = 6): String = {
    val p = s"1e$digits"
    s"""${IvfFlat.duckdbAssignCte("ce_", centroids,
            extraSim = Seq(("CAST(e.label AS BIGINT)", "label")))},
       | cont AS (SELECT cell, label, count(*) AS c FROM ce_assigned
       |          GROUP BY 1, 2),
       | a AS (SELECT cell, CAST(sum(c) AS BIGINT) AS a FROM cont GROUP BY 1),
       | b AS (SELECT label, CAST(sum(c) AS BIGINT) AS b FROM cont GROUP BY 1),
       | t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cont),
       | mi AS (SELECT sum((CAST(c.c AS DOUBLE)/t.n) *
       |     ln((CAST(c.c AS DOUBLE)*t.n)/(CAST(a.a AS DOUBLE)*b.b))) AS mi
       |   FROM cont c JOIN a USING (cell) JOIN b USING (label) CROSS JOIN t),
       | hc AS (SELECT sum(-(CAST(a AS DOUBLE)/t.n) *
       |     ln(CAST(a AS DOUBLE)/t.n)) AS hc FROM a CROSS JOIN t),
       | hl AS (SELECT sum(-(CAST(b AS DOUBLE)/t.n) *
       |     ln(CAST(b AS DOUBLE)/t.n)) AS hl FROM b CROSS JOIN t),
       | pur AS (SELECT CAST(sum(mx) AS BIGINT) AS pure_n FROM
       |   (SELECT cell, max(c) AS mx FROM cont GROUP BY 1)),
       | nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cells FROM a),
       | nl AS (SELECT CAST(count(*) AS BIGINT) AS n_labels FROM b)
       |SELECT t.n AS n_points, nc.n_cells, nl.n_labels,
       | floor((CAST(pur.pure_n AS DOUBLE)/t.n)*$p + 0.5)/$p AS purity,
       | CASE WHEN hc.hc > 0 AND hl.hl > 0
       |      THEN floor((mi.mi/sqrt(hc.hc*hl.hl))*$p + 0.5)/$p END AS nmi
       |FROM t CROSS JOIN nc CROSS JOIN nl CROSS JOIN pur
       | CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl""".stripMargin
  }
}
