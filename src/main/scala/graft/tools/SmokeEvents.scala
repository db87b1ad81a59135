package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch smoke runner: executes a comma-separated list of SparkEntry
  * queries (args(1)) against a testdata dir (args(0)) and prints row
  * counts — fast feedback for schema-drift regressions without a full
  * Verify pass. */
object SmokeEvents {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_asof_join", "q_sessions_batch", "q_events_hourly",
        "q_json_extract", "q_minmax_by", "q_percentile_floor",
        "q_stats_agg", "q_zscore_outliers", "q_click_attrib",
        "q_click_attrib_last")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("smoke-events")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = 0
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        println(s"OK   $n rows=${df.count()}")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"FAIL $n ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
