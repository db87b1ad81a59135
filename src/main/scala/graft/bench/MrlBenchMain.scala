package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Mrl
import graft.sources.VectorSources

/** Bytes-touched measurement for the MRL prefix-column layout: the
  * candidate stage over [[Mrl.writePrefixLayout]] reads ONLY the
  * (vec_id, prefix) columns (plain parquet column pruning — the spec
  * asserts the stage-1 `ReadSchema`), vs slicing the prefix out of the
  * full vector column in flight, which must read every vector byte.
  *
  * Bytes come from the parquet FOOTERS — per-column-chunk
  * totalCompressedSize summed over the files — which is exactly what a
  * column-pruned scan reads (task `inputMetrics` are blind here: the
  * array-typed schema uses the row-based parquet reader, which does not
  * report them). Walls for the full two-stage query on each layout are
  * reported from the same run.
  *
  * `sbt "runMain graft.bench.MrlBenchMain 1000000 64 16 100"`
  */
object MrlBenchMain {

  /** Σ totalCompressedSize of the column chunks whose path root is in
    * `cols`, over every parquet file under `dir`. */
  private def columnBytes(spark: SparkSession, dir: String,
      cols: Set[String]): Long = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
            .filter(c => cols.contains(c.getPath.toArray.head))
            .map(_.getTotalSize).sum
        } finally reader.close()
      }.sum
  }
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val p = if (args.length > 2) args(2).toInt else 16
    val nq = if (args.length > 3) args(3).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("mrlbench").toString
    val base = VectorSources.synthetic(spark, n, dim, seed = 42)
    Mrl.writePrefixLayout(base, s"$tmp/prefix", prefixDims = p)
    base.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/plain")
    val queries = spark.read.parquet(s"$tmp/plain")
      .filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    queries.count()

    // stage-1 bytes: the pruned (vec_id, prefix) chunks vs the full
    // (vec_id, embedding) chunks the slice-in-flight plan must read
    val prefixMB = columnBytes(spark, s"$tmp/prefix",
      Set("vec_id", "prefix")) / 1e6
    val fullMB = columnBytes(spark, s"$tmp/plain",
      Set("vec_id", "embedding")) / 1e6
    println(f"MRL stage1-bytes n=$n d=$dim p=$p pruned=$prefixMB%.0fMB " +
      f"full=$fullMB%.0fMB ratio=${fullMB / prefixMB}%.2fx")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"MRL $label n=$n d=$dim p=$p nq=$nq wall=$wall%.1fs rows=$rows")
    }

    timed("prefix-layout") {
      Mrl.knnJoinPrefixLayout(spark, s"$tmp/prefix", queries, k = 10,
        rerank = 100, scoreDigits = 6).count()
    }
    timed("slice-in-flight") {
      Mrl.knnJoinTruncated(spark.read.parquet(s"$tmp/plain"), queries,
        k = 10, prefixDims = p, rerank = 100, scoreDigits = 6).count()
    }
    // result identity across layouts, checked in-run
    val a = Mrl.knnJoinPrefixLayout(spark, s"$tmp/prefix", queries, k = 10,
        rerank = 100, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val b = Mrl.knnJoinTruncated(spark.read.parquet(s"$tmp/plain"), queries,
        k = 10, prefixDims = p, rerank = 100, scoreDigits = 6)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    println(s"MRL layouts-agree=${a == b}")
    spark.stop()
  }
}
