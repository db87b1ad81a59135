package graft.bench

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.NgramDup

/** The round-8 verdict's one open scale question for exact-substring
  * dedup: on REAL (Zipfian) text a stop-phrase window appears in nearly
  * every document, and the dup-window equi-join (`wins JOIN dupKeys ON
  * win`) funnels every occurrence of that one key through a single
  * reducer — the xxhash64 shuffle key spreads hash SPACE, not key
  * FREQUENCY. (The count group-by itself does NOT skew: partial
  * aggregation caps a hot key at one row per map task.)
  *
  * This main measures that join under a planted stop-phrase corpus —
  * every doc carries the SAME w-token phrase `reps` times — with AQE
  * skew-join splitting ON vs OFF, reporting wall plus the max/median
  * task-duration ratio of each run (the straggler signature). Broadcast
  * is disabled on both sides of the comparison: at 100 TB the dup-key
  * set is far beyond broadcast range, and a broadcast join would have
  * no shuffle-side skew to study. AQE thresholds are lowered so the
  * splitter can trigger at local scale; at 100 TB the default 256 MB
  * threshold triggers naturally.
  *
  * `sbt "runMain graft.bench.NgramSkewMain 100000 200 8 16"`
  */
object NgramSkewMain {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 100000L
    val avgTok = if (args.length > 1) args(1).toInt else 200
    val w = if (args.length > 2) args(2).toInt else 8
    val reps = if (args.length > 3) args(3).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // more reducers than cores exaggerates relative key-frequency skew
      // (each balanced partition shrinks; the hot key's partition does
      // not) — the cluster shape, where reducers >> one box's cores
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      // no broadcast on either planner: the 100 TB dup-key set is not
      // broadcastable, and a broadcast join has no shuffle skew at all
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // let the skew splitter trigger at local data sizes
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskMs = new ConcurrentLinkedQueue[Long]()
    // per-stage attribution: (tasks, sumMs, maxMs, shuffleReadMB) — the
    // straggler has to be PLACED before it can be blamed on the join
    val stage = new ConcurrentHashMap[Int, (Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          val ms = t.taskMetrics.executorRunTime
          taskMs.add(ms)
          val rd = t.taskMetrics.shuffleReadMetrics.totalBytesRead
          stage.merge(t.stageId, (1L, ms, ms, rd), (a, b) =>
            (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3), a._4 + b._4))
        }
    })

    // stop-phrase corpus: `reps` copies of ONE w-token phrase per doc,
    // interleaved with Zipf-ish random tokens (same generator as
    // NgramDupScaleMain) — hot-key occurrences = reps * nDocs
    val hot = (0 until w).map(i => s"the$i").mkString(" ")
    val segLen = math.max(avgTok / reps, 1)
    val docs = spark.range(nDocs).toDF("doc_id")
      .withColumn("toks", expr(
        s"""transform(sequence(1, $avgTok), i ->
           |  concat('t', CAST(pmod(xxhash64(doc_id * 1000003 + i), 2000) *
           |                   pmod(xxhash64(doc_id + i * 7919), 2500) AS STRING)))"""
          .stripMargin))
      .withColumn("text", expr(
        s"""array_join(transform(sequence(0, ${reps - 1}), s ->
           |  concat(array_join(slice(toks, s * $segLen + 1, $segLen), ' '),
           |         ' ', '$hot')), ' ')"""
          .stripMargin))
      .select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    docs.count()

    def pct(sorted: Array[Long], p: Double): Long =
      if (sorted.isEmpty) 0L
      else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))

    def run(skewJoin: Boolean): (Double, Long, Long, Long, Long) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin)
      taskMs.clear(); stage.clear()
      val t0 = System.nanoTime()
      val res = NgramDup.dupNgramStats(docs, w = w, hashKey = true)
        .agg(sum("dup_windows"), sum("dup_tokens")).first()
      val wall = (System.nanoTime() - t0) / 1e9
      val ts = taskMs.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted
      import scala.jdk.CollectionConverters._
      stage.asScala.toSeq.sortBy(-_._2._3).take(5).foreach {
        case (id, (n, sum, max, rd)) =>
          println(f"NGSKEW   stage=$id%4d tasks=$n%4d sum=${sum / 1000.0}%7.1fs " +
            f"max=${max}ms avg=${sum / math.max(n, 1)}ms " +
            f"shufRead=${rd / 1e6}%.0fMB")
      }
      (wall, pct(ts, 0.5), pct(ts, 0.95), ts.lastOption.getOrElse(0L),
        res.getLong(0))
    }

    // interleave A/B/A/B to cancel cache warm-up drift
    val labels = Seq(("skewJoin=off", false), ("skewJoin=on", true),
      ("skewJoin=off2", false), ("skewJoin=on2", true))
    val rows = labels.map { case (label, on) =>
      val (wall, p50, p95, max, dup) = run(on)
      println(f"NGSKEW $label%14s n=$nDocs reps=$reps wall=$wall%6.1fs " +
        f"task_p50=${p50}ms p95=${p95}ms max=${max}ms " +
        f"straggle=${max.toDouble / math.max(p50, 1)}%5.1fx dup_windows=$dup")
      (label, wall, max, dup)
    }
    val offW = (rows(0)._2 + rows(2)._2) / 2
    val onW = (rows(1)._2 + rows(3)._2) / 2
    require(rows.map(_._4).distinct.size == 1,
      "skew handling must not change results")
    println(f"NGSKEW summary off=${offW}%.1fs on=${onW}%.1fs " +
      f"speedup=${offW / onW}%.2fx " +
      f"max_task off=${(rows(0)._3 + rows(2)._3) / 2}ms " +
      f"on=${(rows(1)._3 + rows(3)._3) / 2}ms")
    spark.stop()
  }
}
