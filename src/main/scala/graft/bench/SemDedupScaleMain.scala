package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfFlat, SemDedup}
import graft.sources.VectorSources

/** SemDeDup scale measurement (round 8): the operator's cost model is
  * pairs = n²/C (within-cell self-join), so C must scale with the corpus
  * to hold cell size — this main measures exactly that knob at ≥500k
  * vectors on a clustered corpus (the data shape semantic dedup serves).
  *
  * Reports per C: fit wall, dedup wall, kept fraction, and the realized
  * max cell size (the straggler bound — balanced cells keep the
  * quadratic term per-task-bounded). Correctness at this scale rides the
  * keep-first invariant: the count of kept rows must be stable across C
  * only in the trivial-threshold regimes, so we report rather than
  * assert; exactness is SemDedupSpec + the oracle gate at battery scale.
  *
  * `sbt "runMain graft.bench.SemDedupScaleMain [n] [dim] [t] [C...]"`
  */
object SemDedupScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val t = if (args.length > 2) args(2).toDouble else 0.9
    val cs = if (args.length > 3) args.drop(3).map(_.toInt).toSeq
             else Seq(256, 512)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = VectorSources.syntheticClustered(spark, n, dim,
        numClusters = 128, spread = 0.15)
      .select("vec_id", "embedding").persist()
    println(s"[semdedup-scale] corpus n=${base.count()} dim=$dim t=$t")

    println(f"${"C"}%6s ${"fit_s"}%8s ${"dedup_s"}%9s ${"kept"}%12s ${"kept_frac"}%10s ${"max_cell"}%9s")
    cs.foreach { c =>
      val t0 = System.nanoTime()
      val model = IvfFlat.fit(base, numCells = c)
      val maxCell = model.assigned.groupBy("cell").count()
        .agg(max("count")).first().getLong(0)
      val t1 = System.nanoTime()
      val verdicts = SemDedup.dedup(model, threshold = t).persist()
      val kept = verdicts.filter(col("kept")).count()
      val total = verdicts.count()
      val t2 = System.nanoTime()
      verdicts.unpersist()
      model.release() // one fit per C — drop each round's assignment cache
      require(total == n, s"verdict rows $total != corpus $n")
      println(f"$c%6d ${(t1 - t0) / 1e9}%8.1f ${(t2 - t1) / 1e9}%9.1f " +
        f"$kept%12d ${kept.toDouble / n}%10.4f $maxCell%9d")
    }
    spark.stop()
  }
}
