package graft

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.hnsw.{HnswIndex, Metric}
import graft.sources.VectorSources

/** ScalaCheck property suite — the invariants SURVEY §5 adds beyond the
  * reference's example-based Jest tests. */
class PropertiesSpec extends AnyFunSuite {

  /** Drive a Gen manually (no scalatest-scalacheck bridge in the offline
    * dependency set): n successful samples per property. */
  def forAll[A](g: Gen[A], n: Int = 50)(f: A => Unit): Unit = {
    var done = 0; var attempts = 0
    while (done < n && attempts < n * 20) {
      g.sample.foreach { a => f(a); done += 1 }
      attempts += 1
    }
    assert(done == n, s"only $done/$n samples generated")
  }
  def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 50)(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 12).flatMap(d =>
      Gen.containerOfN[Array, Float](d, Gen.chooseNum(-100f, 100f)))

  val nonZeroVec: Gen[Array[Float]] = vecGen.suchThat(v => v.exists(_ != 0f))

  test("property: cosine(a,a) ≈ 1 and cosine is symmetric") {
    forAll(nonZeroVec) { a =>
      assert(math.abs(Metric.Cosine.sim(a, a) - 1.0) < 1e-9)
    }
    forAll2(nonZeroVec, nonZeroVec) { (a, b) =>
      val n = math.min(a.length, b.length)
      val (x, y) = (a.take(n), b.take(n))
      if (x.exists(_ != 0f) && y.exists(_ != 0f)) {
        assert(math.abs(Metric.Cosine.sim(x, y) - Metric.Cosine.sim(y, x)) < 1e-12)
        assert(Metric.Cosine.sim(x, y) <= 1.0 + 1e-9)
        assert(Metric.Cosine.sim(x, y) >= -1.0 - 1e-9)
      }
    }
  }

  test("property: euclidean similarity ∈ (0, 1], =1 iff identical") {
    forAll2(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val s = Metric.Euclidean.sim(a.take(n), b.take(n))
      assert(s > 0.0 && s <= 1.0)
    }
    forAll(vecGen) { a => assert(Metric.Euclidean.sim(a, a) == 1.0) }
  }

  test("property: HNSW search returns distinct known ids, near-full coverage at k ≥ n; degree ≤ M") {
    // NOTE: exact "k ≥ n ⇒ all ids" is NOT an HNSW invariant — diversity
    // pruning can disconnect layer 0, so search covers only the entry
    // point's component (the reference asserts exactness only on its
    // 5-vector fixture, tests/HNSW.test.ts:134-138 — mirrored in
    // HnswIndexSpec). The guaranteed properties: distinct ids from the
    // corpus, results sorted by descending score, degree bound ≤ M.
    // All-zero vectors score NaN against everything, which silently
    // disconnects the graph during insert and makes the coverage bound
    // meaningless (observed flake: coverage 12/34 on a zero-heavy draw).
    // The NaN-score ordering below stays tolerant, but the COVERAGE
    // property only holds for real geometry — so replace the degenerate
    // all-zero draw with a unit vector instead of weakening the bound.
    // chooseNum biases toward bounds/special values (±10, 0, 1), so exact
    // DUPLICATE vectors are likely draws — and duplicates are the other
    // degenerate geometry: cosine-1.0 ties make diversity pruning reject
    // all-but-one twin, legitimately fragmenting layer 0 (observed flake:
    // coverage 1/22 on a duplicate-heavy draw). Perturb duplicates to
    // distinct points instead of weakening the coverage bound.
    val dataGen = Gen.chooseNum(2, 40).flatMap { n =>
      Gen.containerOfN[Vector, Array[Float]](n,
        Gen.containerOfN[Array, Float](4, Gen.chooseNum(-10f, 10f))
          .map(v => if (v.forall(_ == 0f)) Array(1f, 0f, 0f, 0f) else v))
        .map { vs =>
          val seen = scala.collection.mutable.Set.empty[List[Float]]
          vs.map { v =>
            val w = v.clone()
            while (seen(w.toList)) w(0) += 0.25f
            seen += w.toList
            w
          }
        }
    }
    forAll(dataGen) { vecs =>
      val data = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val idx = new HnswIndex(M = 4, efConstruction = 32)
      idx.buildIndex(data.iterator)
      val res = idx.searchKNN(vecs.head, vecs.length + 5, Some(vecs.length * 2))
      val ids = res.map(_._1)
      assert(ids.distinct.length == ids.length)
      assert(ids.toSet.subsetOf(data.map(_._1).toSet))
      assert(ids.length >= math.max(1, (vecs.length * 3) / 4),
        s"coverage ${ids.length}/${vecs.length}")
      // descending-score order, NaN-tolerant: ScalaCheck's zero bias can
      // generate the all-zero vector, whose cosine scores are all NaN —
      // and NaN != NaN made the plain seq-equality form flake. The
      // meaningful property is that the comparable scores never increase.
      val scores = res.map(_._2).filterNot(_.isNaN)
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
      idx.nodes.foreach { case (_, node) =>
        node.neighbors.foreach(nbrs => assert(nbrs.length <= idx.M))
      }
    }
  }

  test("property: serialization round-trip preserves every search result") {
    val dataGen = Gen.chooseNum(3, 25).flatMap { n =>
      Gen.containerOfN[Vector, Array[Float]](n,
        Gen.containerOfN[Array, Float](3, Gen.chooseNum(-5f, 5f)))
    }
    forAll(dataGen) { vecs =>
      val data = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val idx = new HnswIndex(M = 6, efConstruction = 20)
      idx.buildIndex(data.iterator)
      val restored = graft.hnsw.HnswSerde.fromRows(idx.toRows, idx.M,
        idx.efConstruction, idx.metric, Some(idx.efSearch), idx.seed,
        idx.levelMax, idx.entryPointId)
      vecs.take(5).foreach { q =>
        // compare score BIT patterns: chooseNum generates zero vectors
        // (special-value bias), whose cosine is NaN — and NaN != NaN would
        // fail plain tuple equality on genuinely identical results
        def canon(r: Array[(Long, Double)]) =
          r.toSeq.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) }
        assert(canon(idx.searchKNN(q, 3)) == canon(restored.searchKNN(q, 3)))
      }
    }
  }

  test("property: Qutil.rnd is within 10^-d of its input") {
    lazy val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val xs = Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6)).sample.get
    val got = xs.toDF("x").select(Qutil.rnd(col("x"), 4)).collect().map(_.getDouble(0))
    xs.zip(got).foreach { case (x, r) =>
      assert(math.abs(r - x) <= 1e-4 + math.abs(x) * 1e-12, s"$x -> $r")
    }
  }

  test("property: fvecs encode/decode round-trips arbitrary vector sets") {
    lazy val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val dataGen = Gen.chooseNum(1, 30).flatMap { n =>
      Gen.chooseNum(1, 16).flatMap { d =>
        Gen.containerOfN[Vector, Array[Float]](n,
          Gen.containerOfN[Array, Float](d, Gen.chooseNum(-1e6f, 1e6f)))
      }
    }
    forAll(dataGen, n = 8) { vecs =>
      val tmp = java.nio.file.Files.createTempDirectory("fvprop").toString
      val path = s"$tmp/p.fvecs"
      val out = new DataOutputStream(new FileOutputStream(path))
      vecs.foreach { v =>
        val bb = ByteBuffer.allocate(4 + v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(v.length); v.foreach(bb.putFloat)
        out.write(bb.array())
      }
      out.close()
      val back = VectorSources.readFvecs(spark, path).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
      assert(back.length == vecs.length)
      back.zip(vecs).foreach { case ((_, got), exp) => assert(got == exp.toSeq) }
    }
  }

  test("property: connected components match brute-force closure on random graphs") {
    lazy val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val graphGen = for {
      n <- Gen.chooseNum(1, 24)
      m <- Gen.chooseNum(0, 30)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield (n, edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }.distinct)
    forAll(graphGen, n = 12) { case (n, edges) =>
      // brute-force: repeated relaxation over an adjacency map
      val lbl = Array.tabulate(n)(_.toLong)
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(lbl(a.toInt), lbl(b.toInt))
          if (lbl(a.toInt) != m) { lbl(a.toInt) = m; changed = true }
          if (lbl(b.toInt) != m) { lbl(b.toInt) = m; changed = true }
        }
      }
      val docs = (0 until n).map(_.toLong).toDF("doc_id")
      val pairs = edges.toDF("id1", "id2")
      for (limit <- Seq(Long.MaxValue, 0L)) { // union-find path, then iterative
        val got = graft.operators.Dedup.connectedComponents(docs, pairs,
            driverEdgeLimit = limit)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        (0 until n).foreach(i => assert(got(i.toLong) == lbl(i),
          s"n=$n edges=$edges limit=$limit node=$i"))
      }
    }
  }

  test("property: salted join equals plain join on random key distributions") {
    lazy val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val gen = for {
      bigKeys <- Gen.listOfN(200, Gen.chooseNum(0L, 5L))
      smallKeys <- Gen.someOf(0L to 5L)
      buckets <- Gen.chooseNum(2, 6)
    } yield (bigKeys, smallKeys.toList, buckets)
    forAll(gen, n = 8) { case (bigKeys, smallKeys, buckets) =>
      val big = bigKeys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
      val small = smallKeys.map(k => (k, s"n$k")).toDF("k", "name")
      val expected = big.join(small, "k")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val got = graft.operators.Skew.saltedJoin(big, small, "k", buckets)
        .select("k", "v", "name")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(got == expected)
    }
  }
}
