package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Distributed grouped running sum — the sequence-packing kernel
  * (`cum = sum(value) OVER (PARTITION BY group ORDER BY key)`) without the
  * single-partition-per-group window.
  *
  * The window formulation funnels EVERY row of a group through one task;
  * with 2-3 split groups ("train"/"val"/"test") one task sorts and scans
  * ~80% of the corpus — the canonical scale-killer (VERDICT r10 #1). This
  * operator is the grouped generalization of [[Ordinal]]'s two-phase
  * zipWithIndex:
  *
  *  1. range-sort on (groupCols ++ orderCols) — Spark's ordinary
  *     distributed ORDER BY (sampled range exchange + local sort), so
  *     every group's rows are globally contiguous and in order while the
  *     DATA stays spread over all partitions;
  *  2. one pass computing per-(partition, group) value totals — driver
  *     state is P x G longs (P partitions, G groups), never rows;
  *  3. driver prefix-sums the totals into per-(partition, group) base
  *     offsets, broadcasts them, and a narrow second pass emits
  *     offset + local running sum.
  *
  * Both passes run over the SAME sorted RDD instance, so pass 2 reuses the
  * sort's shuffle output (skipped stages) rather than re-sorting. Like
  * `RDD.zipWithIndex`, the totals job runs when the operator is applied.
  *
  * Determinism: with a total order (groupCols ++ orderCols must be unique
  * per row — append a unique id as tie-break) the running sum is a pure
  * function of the data regardless of partition boundaries, so any cluster
  * layout reproduces byte-identical sums and a SQL oracle checks it with
  * the plain window.
  *
  * Intended for LOW-CARDINALITY group keys (splits, shards): driver state
  * and broadcast are O(P x G). For high-cardinality groups the plain
  * window already parallelizes and should be used instead.
  */
object GroupedPrefixSum {

  /** `df` plus a long `outCol` = running sum of `valueCol` within each
    * `groupCols` group following `orderCols` order. `valueCol` must be
    * LongType.
    *
    * `uniqueKeyCols` (optional): NAMED columns that together must form a
    * unique key per row (normally the group + order columns). When
    * provided, the totals pass verifies the total-order precondition
    * EXACTLY and for free: after the range sort duplicates are globally
    * adjacent, so a per-partition adjacency check plus a driver-side
    * partition-boundary check catches every duplicate without an extra
    * job — and the operator throws instead of silently producing
    * layout-dependent sums. Scalar key columns only. */
  def runningSum(df: DataFrame, outCol: String, valueCol: String,
      groupCols: Seq[String], orderCols: Seq[Column],
      uniqueKeyCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "grouped running sum needs group keys")
    require(orderCols.nonEmpty, "grouped running sum needs an order key")
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (cast upstream), got ${df.schema(valueCol).dataType}")
    val sorted = df.orderBy(groupCols.map(col) ++ orderCols: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val gIdx = groupCols.map(sorted.schema.fieldIndex).toArray
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val uIdx = uniqueKeyCols.map(sorted.schema.fieldIndex).toArray
    val rdd = sorted.rdd // ONE RDD instance: both jobs share the sort shuffle
    // pass 1: per-(partition, group) totals — G longs per partition —
    // plus, when a unique key is declared, the adjacency duplicate flag
    // and the partition's first/last key for the boundary check
    val collected = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        var dup = false
        var firstKey: Seq[Any] = null
        var prevKey: Seq[Any] = null
        it.foreach { row =>
          val k = gIdx.map(row.get).toSeq
          m.update(k, m.getOrElse(k, 0L) + row.getLong(vIdx))
          if (uIdx.nonEmpty) {
            val u = uIdx.map(row.get).toSeq
            if (firstKey == null) firstKey = u
            else if (u == prevKey) dup = true
            prevKey = u
          }
        }
        Iterator.single((pid, m.toSeq, dup, Option(firstKey), Option(prevKey)))
      }.collect().sortBy(_._1)
    if (uIdx.nonEmpty) {
      require(!collected.exists(_._3),
        s"runningSum: duplicate (${uniqueKeyCols.mkString(", ")}) key — " +
          "the grouped prefix sum requires a total order; results would " +
          "be partition-layout-dependent")
      // boundary check: last key of partition p vs first key of the next
      // non-empty partition
      val bounds = collected.flatMap(p => p._4.map(f => (f, p._5.get)))
      bounds.sliding(2).foreach {
        case Array((_, last), (first, _)) =>
          require(last != first,
            s"runningSum: duplicate (${uniqueKeyCols.mkString(", ")}) key " +
              "across a partition boundary — the grouped prefix sum " +
              "requires a total order")
        case _ => ()
      }
    }
    val partials: Array[Seq[(Seq[Any], Long)]] = collected.map(_._2)
    // driver: base offset for (partition p, group g) = sum of g's totals in
    // partitions < p
    val running = scala.collection.mutable.Map.empty[Seq[Any], Long]
    val offsets: Array[Map[Seq[Any], Long]] = partials.map { groups =>
      val base = groups.map { case (k, _) => k -> running.getOrElse(k, 0L) }.toMap
      groups.foreach { case (k, tot) =>
        running.update(k, running.getOrElse(k, 0L) + tot)
      }
      base
    }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: narrow — emit offset + local running sum
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = scala.collection.mutable.Map(bc.value(pid).toSeq: _*)
      it.map { row =>
        val k = gIdx.map(row.get).toSeq
        val cum = acc.getOrElse(k, 0L) + row.getLong(vIdx)
        acc.update(k, cum)
        Row.fromSeq(row.toSeq :+ cum)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
