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
  private[graft] def planes(numPlanes: Int, d: Int, seed: Long): Array[Array[Float]] =
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
  /** Per-table seed (tables are independent hash families). */
  private[graft] def tableSeed(seed: Long, t: Int): Long =
    seed + 0x5DEECE66DL * (t + 1)

  /** @param multiProbe 0 → exact-bucket only; 1 → also probe every 1-bit
    *                   flip of the query signature (H+1 buckets/query).
    * @param numTables  L independent hash tables unioned (standard LSH
    *                   amplification: recall grows with L at linear cost).
    * @param scoreDigits ≥0 → fixed-point-round the cosine BEFORE ranking
    *                   (with the id tie-break this makes the top-k set
    *                   identical across engines — the oracle-checked path). */
  def lshKnnJoin(
      base: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 8, d: Int = 64, seed: Long = 42L, multiProbe: Int = 1,
      numTables: Int = 4,
      baseId: String = "vec_id", baseVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec",
      scoreDigits: Int = -1): DataFrame = {
    require(k > 0 && numPlanes > 0 && numPlanes <= 56 && numTables > 0)
    // one signature column per table; bucket key = (table << 56) | sig so
    // all tables share a single long-keyed equi-join
    def sigs(vec: Column): Seq[Column] = (0 until numTables).map { t =>
      signature(vec, numPlanes, d, tableSeed(seed, t)) + lit(t.toLong << 56)
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
    val simRaw = similarity.cosine_sim(col("bvec"), col("qvec"))
    val simCol = if (scoreDigits >= 0) graft.Qutil.rnd(simRaw, scoreDigits) else simRaw
    val cands = sigB.join(probes, Seq("sig"))
      .select(col(queryId), col("neighbor_id"), simCol.as("score"))
      .dropDuplicates(queryId, "neighbor_id")
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Near-duplicate pair mining with the LSH prefilter — the scale-safe
    * replacement for the all-pairs cosine self-join: candidates are bucket
    * collisions (exact bucket, plus every 1-bit flip of one side when
    * `multiProbe`=1), re-ranked by exact cosine and thresholded. Output
    * contract matches the brute-force baseline: (id1 < id2, cos_sim).
    *
    * Scale shape: signatures are a projection; the only join is a hash
    * shuffle on the long bucket key — no cartesian anywhere. Collision
    * probability per table is p^H with p = 1 − θ/π, amplified across
    * tables/probes; misses vs brute force are exactly the pairs whose
    * signatures differ by ≥2 bits in every table. */
  def lshNearDupPairs(
      df: DataFrame, threshold: Double,
      numPlanes: Int = 6, d: Int = 64, seed: Long = 42L, multiProbe: Int = 1,
      numTables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scoreDigits: Int = 6): DataFrame = {
    require(numPlanes > 0 && numPlanes <= 56 && numTables > 0)
    def sigs(vec: Column): Seq[Column] = (0 until numTables).map { t =>
      signature(vec, numPlanes, d, tableSeed(seed, t)) + lit(t.toLong << 56)
    }
    val left = df.select(col(idCol).as("id1"), col(vecCol).as("e1"),
      explode(array(sigs(col(vecCol)): _*)).as("sig"))
    val rightSig = df.select(col(idCol).as("id2"), col(vecCol).as("e2"),
      explode(array(sigs(col(vecCol)): _*)).as("sig0"))
    val probeSigs: Column =
      if (multiProbe <= 0) array(col("sig0"))
      else array(col("sig0") +: (0 until numPlanes).map(i =>
        GraftBitwise.xor(col("sig0"), lit(1L << i))): _*)
    val right = rightSig.select(col("id2"), col("e2"),
      explode(probeSigs).as("sig"))
    left.join(right, Seq("sig"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        graft.Qutil.rnd(similarity.cosine_sim(col("e1"), col("e2")), scoreDigits)
          .as("cos_sim"))
      .dropDuplicates("id1", "id2")
      .filter(col("cos_sim") >= threshold)
  }

  /** DuckDB SQL expression computing the same bit-packed signature as
    * [[signature]] for table `t` — hyperplanes are pure (seed, plane, dim)
    * functions, so they can be emitted as double literals (each the exact
    * widening of the float plane component Spark uses), making the LSH path
    * cross-engine oracle-checkable. `vecSql` must be a float-list column;
    * products/accumulation happen in double on both engines. */
  def duckdbSigSql(vecSql: String, numPlanes: Int, d: Int, seed: Long): String = {
    val ps = planes(numPlanes, d, seed)
    ps.zipWithIndex.map { case (p, i) =>
      val lits = p.map(f => java.lang.Double.toString(f.toDouble)).mkString(",")
      s"(CASE WHEN list_inner_product(CAST($vecSql AS DOUBLE[]), [$lits]) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** DuckDB CTE body `SELECT vec_id, embedding, sig FROM <table>` unioned
    * over all hash tables (bucket key = (t<<56) + sig, as in the join). */
  def duckdbAllSigsSql(table: String, idCol: String, vecCol: String,
      numPlanes: Int, d: Int, seed: Long, numTables: Int): String =
    (0 until numTables).map { t =>
      val sig = duckdbSigSql(vecCol, numPlanes, d, tableSeed(seed, t))
      s"SELECT $idCol, $vecCol, (CAST(${t.toLong << 56} AS BIGINT) + $sig) AS sig FROM $table"
    }.mkString("\n UNION ALL\n ")
}

private[operators] object GraftBitwise {
  def xor(a: Column, b: Column): Column = a.bitwiseXOR(b)
}
