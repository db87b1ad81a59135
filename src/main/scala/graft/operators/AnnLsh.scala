package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.similarity

/** Random-hyperplane LSH approximate k-NN — the bucket-join scale path for
  * cosine similarity search (complements the graph-based
  * [[graft.hnsw.HnswIndexer]]; same role as the reference's ANN surface
  * O12 but expressed entirely as declarative DataFrame ops).
  *
  * sig(v) = bit-packed signs of ⟨v, h_i⟩ for H seeded pseudo-random
  * hyperplanes. Candidates = equi-join on signature (plus optional
  * 1-bit-flip multiprobe of the query side), re-ranked by true cosine.
  *
  * Scale shape: the base side is scanned once, signatures are a plain
  * projection (whole-stage codegen'd custom expressions), and the join is
  * a hash shuffle on a single long key — no cross join anywhere. Probing
  * more buckets trades recall for cost exactly like efSearch.
  */
object AnnLsh {

  /** Deterministic gaussian hyperplanes keyed on (seed, plane, dim). */
  private def planes(numPlanes: Int, d: Int, seed: Long): Array[Array[Float]] =
    Array.tabulate(numPlanes) { h =>
      Array.tabulate(d) { j =>
        var z = seed ^ (h.toLong * 0x9E3779B97F4A7C15L) ^ (j.toLong * 0xC2B2AE3D27D4EB4FL)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        val u1 = math.max((z >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
        val u2 = ((z * 0x9E3779B97F4A7C15L) >>> 11).toDouble / (1L << 53).toDouble
        (math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)).toFloat
      }
    }

  /** Bit-packed signature column for a vector column. */
  def signature(vec: Column, numPlanes: Int, d: Int, seed: Long): Column = {
    val ps = planes(numPlanes, d, seed)
    ps.zipWithIndex.map { case (p, i) =>
      when(similarity.dot_product(vec, typedlit(p)) >= 0d, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** @param multiProbe 0 → exact-bucket only; 1 → also probe every 1-bit
    *                   flip of the query signature (H+1 buckets/query).
    * @param numTables  L independent hash tables unioned (standard LSH
    *                   amplification: recall grows with L at linear cost). */
  def lshKnnJoin(
      base: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 8, d: Int = 64, seed: Long = 42L, multiProbe: Int = 1,
      numTables: Int = 4,
      baseId: String = "vec_id", baseVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    require(k > 0 && numPlanes > 0 && numPlanes <= 56 && numTables > 0)
    // one signature column per table; bucket key = (table << 56) | sig so
    // all tables share a single long-keyed equi-join
    def sigs(vec: Column): Seq[Column] = (0 until numTables).map { t =>
      signature(vec, numPlanes, d, seed + 0x5DEECE66DL * (t + 1)) +
        lit(t.toLong << 56)
    }
    val sigB = base.select(col(baseId).as("neighbor_id"), col(baseVec).as("bvec"),
        explode(array(sigs(col(baseVec)): _*)).as("sig"))
    val sigQ0 = queries.select(col(queryId), col(queryVec).as("qvec"),
      posexplode(array(sigs(col(queryVec)): _*)).as(Seq("tbl", "qsig")))
    val probeSigs: Column =
      if (multiProbe <= 0) array(col("qsig"))
      else array(col("qsig") +: (0 until numPlanes).map(i =>
        GraftBitwise.xor(col("qsig"), lit(1L << i))): _*)
    val probes = sigQ0.select(col(queryId), col("qvec"),
      explode(probeSigs).as("sig"))
    val cands = sigB.join(probes, Seq("sig"))
      .select(col(queryId), col("neighbor_id"),
        similarity.cosine_sim(col("bvec"), col("qvec")).as("score"))
      .dropDuplicates(queryId, "neighbor_id")
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}

private[operators] object GraftBitwise {
  def xor(a: Column, b: Column): Column = a.bitwiseXOR(b)
}
