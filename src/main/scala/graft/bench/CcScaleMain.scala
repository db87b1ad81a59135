package graft.bench

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Distributed connected-components SCALE measurement (VERDICT-r5 next #6):
  * the pointer-jumping path in [[Dedup.connectedComponents]] engages above
  * `driverEdgeLimit` (5M) edges but had only toy-scale specs. This main
  * builds a ≥10M-edge near-dup-shaped graph with CLOSED-FORM ground truth,
  * runs the iterative path, and reports rounds + wall + an exact label
  * check over every vertex (plus a union-find cross-check on the disjoint
  * chain/tree strata, which fit the driver path).
  *
  * Graph shape mirrors what LSH banding emits on a real corpus: millions
  * of tiny duplicate clusters plus a few large, deep components that
  * stress the O(log diameter) convergence claim —
  *  - stratum A: `aComps` rings of 4 (the bulk: small dup clusters)
  *  - stratum B: `nChains` chains of `chainLen` (worst-case diameter)
  *  - stratum C: one `treeV`-vertex binary tree + `treeV` pseudo-random
  *    intra-component extra edges (one giant near-dup blob)
  * Every stratum's component minimum is a closed-form function of the
  * vertex id, so correctness is checked exactly at full scale, not sampled.
  *
  * `sbt "runMain graft.bench.CcScaleMain"` — defaults give 11M edges /
  * 10M vertices. Run alone (VM timing + memory notes in BASELINE.md).
  */
object CcScaleMain {
  def main(args: Array[String]): Unit = {
    val aComps = if (args.length > 0) args(0).toLong else 2000000L
    val nChains = if (args.length > 1) args(1).toLong else 1000L
    val chainLen = if (args.length > 2) args(2).toLong else 1000L
    val treeV = if (args.length > 3) args(3).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val aV = aComps * 4          // [0, aV): rings of 4
    val bBase = aV               // [bBase, bBase + nChains*chainLen): chains
    val bV = nChains * chainLen
    val cBase = bBase + bV       // [cBase, cBase + treeV): tree + extras
    val nV = cBase + treeV

    // ring-of-4 edges: (v, comp*4 + (local+1)%4) — each unordered edge once
    val ringE = spark.range(0, aV).select(col("id").as("id1"),
      ((col("id") - pmod(col("id"), lit(4))) + pmod(pmod(col("id"), lit(4)) + 1, lit(4))).as("id2"))
    // chain edges: (v, v+1) within each chain
    val chainE = spark.range(bBase, bBase + bV)
      .filter(pmod(col("id") - bBase, lit(chainLen)) < chainLen - 1)
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    // binary-tree edges: (parent, v); deterministic pseudo-random extras
    val treeE = spark.range(cBase + 1, cBase + treeV)
      .select((lit(cBase) + floor((col("id") - cBase) / 2)).cast("long").as("id1"),
        col("id").as("id2"))
    val extraE = spark.range(cBase, cBase + treeV)
      .select((lit(cBase) + pmod(xxhash64(col("id"), lit(1)), lit(treeV))).as("u"),
        (lit(cBase) + pmod(xxhash64(col("id"), lit(2)), lit(treeV))).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("id1"), greatest(col("u"), col("v")).as("id2"))
    val pairs = ringE.union(chainE).union(treeE).union(extraE).persist()
    val nE = pairs.count()
    val docs = spark.range(0, nV).select(col("id").as("doc_id"))
    println(s"CC-SCALE graph: vertices=$nV edges=$nE " +
      s"(rings=$aComps chains=${nChains}x$chainLen tree=$treeV)")

    val rounds = new AtomicInteger(-1)
    val t0 = System.nanoTime()
    val cc = Dedup.connectedComponents(docs, pairs, maxRounds = 25,
      roundsOut = Some(rounds)).persist()
    val nOut = cc.count()
    val wall = (System.nanoTime() - t0) / 1e9

    // closed-form ground truth: component minimum per stratum
    val truth = when(col("doc_id") < aV, col("doc_id") - pmod(col("doc_id"), lit(4)))
      .when(col("doc_id") < cBase,
        col("doc_id") - pmod(col("doc_id") - bBase, lit(chainLen)))
      .otherwise(lit(cBase))
    val mismatches = cc.filter(col("cluster_id") =!= truth).count()
    println(f"CC-SCALE pointer-jumping: rounds=${rounds.get} wall=$wall%.1fs " +
      s"labeled=$nOut mismatches=$mismatches")

    // union-find cross-check on the disjoint chain+tree strata (fits the
    // driver path): labels must agree exactly with the full-scale run
    val sliceDocs = spark.range(bBase, nV).select(col("id").as("doc_id"))
    val slicePairs = pairs.filter(col("id1") >= bBase)
    val uf = Dedup.connectedComponents(sliceDocs, slicePairs,
      driverEdgeLimit = 5000000L)
    val sliceDiff = uf.select(col("doc_id"), col("cluster_id").as("uf_cluster"))
      .join(cc, Seq("doc_id"))
      .filter(col("uf_cluster") =!= col("cluster_id")).count()
    println(s"CC-SCALE union-find slice cross-check: vertices=${bV + treeV} " +
      s"diff=$sliceDiff")
    val ok = mismatches == 0 && sliceDiff == 0 && nOut == nV
    println(s"CC-SCALE ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
