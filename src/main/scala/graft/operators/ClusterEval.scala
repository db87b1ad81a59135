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
    val assigned = model.assigned.select(col("id").as("vec_id"), col("cell"))
    val joined = assigned.join(
      labels.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).cast("long").as("label")), Seq("vec_id"))
    val cont = joined.groupBy("cell", "label").agg(count(lit(1)).as("c"))
    val cellTot = cont.groupBy("cell").agg(sum("c").as("a"))
    val labTot = cont.groupBy("label").agg(sum("c").as("b"))
    val tot = cont.agg(sum("c").as("n"))

    val joined2 = cont
      .join(broadcast(cellTot), Seq("cell"))
      .join(broadcast(labTot), Seq("label"))
      .crossJoin(broadcast(tot))
    val miTerm = (col("c").cast("double") / col("n")) *
      log((col("c").cast("double") * col("n")) /
        (col("a").cast("double") * col("b")))
    val mi = joined2.agg(sum(miTerm).as("mi"))

    val hc = cellTot.crossJoin(broadcast(tot))
      .agg(sum(-(col("a").cast("double") / col("n")) *
        log(col("a").cast("double") / col("n"))).as("hc"))
    val hl = labTot.crossJoin(broadcast(tot))
      .agg(sum(-(col("b").cast("double") / col("n")) *
        log(col("b").cast("double") / col("n"))).as("hl"))
    val pur = cont.groupBy("cell").agg(max("c").as("mx"))
      .agg(sum("mx").as("pure_n"))
    val nCells = cellTot.agg(count(lit(1)).as("n_cells"))
    val nLabs = labTot.agg(count(lit(1)).as("n_labels"))

    tot.crossJoin(broadcast(nCells)).crossJoin(broadcast(nLabs))
      .crossJoin(broadcast(pur)).crossJoin(broadcast(mi))
      .crossJoin(broadcast(hc)).crossJoin(broadcast(hl))
      .select(col("n").as("n_points"), col("n_cells"), col("n_labels"),
        graft.Qutil.rnd(col("pure_n").cast("double") / col("n"), digits)
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
