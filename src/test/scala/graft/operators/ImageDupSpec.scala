package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash image dedup: hand-computed aHash bits, banding
  * guarantees, Hamming confirm, and robustness to re-encoding — the
  * property that makes aHash a dedup signal at all. */
class ImageDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def mediaOf(rows: Seq[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    rows.toDF("media_id", "content")
  }

  private def bandsOf(rows: Seq[(Long, Array[Byte])]): DataFrame =
    ImageDup.aHashBands(
      Multimodal.decodeImagePooledRaw(mediaOf(rows), grid = 8))

  private def hashOf(rows: Seq[(Long, Array[Byte])]): Map[Long, Seq[Long]] =
    bandsOf(rows).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }

  // an 8x8 image whose left half is dark (0) and right half bright (200):
  // mean = 100, so bit(y,x) = x >= 4 — each 16-bit band (2 pixel rows)
  // is 0xF0F0
  private def halfBright(): Array[Byte] =
    Multimodal.encodeGray(
      Array.tabulate(64)(i => if (i % 8 >= 4) 200 else 0), 8, 8)

  test("aHash bits match the hand-computed mean threshold") {
    val h = hashOf(Seq((1L, halfBright())))(1L)
    assert(h == Seq(0xF0F0L, 0xF0F0L, 0xF0F0L, 0xF0F0L))
  }

  test("constant image hashes to all-zero (no cell exceeds the mean)") {
    val h = hashOf(Seq((1L, Multimodal.encodeGray(Array.fill(64)(99), 8, 8))))(1L)
    assert(h == Seq(0L, 0L, 0L, 0L))
  }

  test("identical content under different codecs: Hamming 0 pair found") {
    val px = Array.tabulate(64)(i => (i * 7) % 256)
    val rows = Seq(
      (1L, Multimodal.encodeGray(px, 8, 8, "bmp")),
      (2L, Multimodal.encodeGray(px, 8, 8, "png")))
    val pairs = ImageDup.nearDupPairs(bandsOf(rows), maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("small perturbation survives banding; unrelated image does not pair") {
    val base = Array.tabulate(64)(i => if (i % 8 >= 4) 200 else 0)
    // flip 2 cells hard: from dark to far above the mean — <= 2 hash bits
    // move, at least one band untouched (pigeonhole), pair must survive
    val near = base.clone(); near(0) = 255; near(63 - 8) = 0
    val far = Array.tabulate(64)(i => if ((i / 8) % 2 == 0) 220 else 0)
    val rows = Seq(
      (1L, Multimodal.encodeGray(base, 8, 8)),
      (2L, Multimodal.encodeGray(near, 8, 8)),
      (3L, Multimodal.encodeGray(far, 8, 8)))
    val pairs = ImageDup.nearDupPairs(bandsOf(rows), maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("resized copy keeps a low Hamming distance (the aHash invariance)") {
    // a smooth 16x16 gradient downscaled to 8x8 by the REAL resizer
    // still hashes close to the original's hash
    val px = Array.tabulate(256)(i => ((i % 16) * 16) % 256)
    val big = Multimodal.encodeGray(px, 16, 16)
    val small = Multimodal.resizeImage(mediaOf(Seq((9L, big))), maxSide = 8)
      .collect().head.getAs[Array[Byte]]("content")
    val pairs = ImageDup.nearDupPairs(
        bandsOf(Seq((1L, big), (2L, small))), maxHamming = 10)
      .collect()
    assert(pairs.length == 1, "resized copy must be caught as a near-dup")
    assert(pairs.head.getLong(2) <= 4)
  }

  test("1-bit multiprobe: a Hamming-5 pair with no equal band is missed " +
      "by exact banding and guaranteed by probeBits = 1") {
    import spark.implicits._
    // bands differ by (2,1,1,1) bits -> total d=5, no band equal, every
    // band within 1 bit except band 0
    val bands = Seq(
      (1L, 0, 0L),          (1L, 1, 0L),  (1L, 2, 0L),  (1L, 3, 0L),
      (2L, 0, 3L /*2 bits*/),(2L, 1, 4L), (2L, 2, 8L),  (2L, 3, 16L))
      .toDF("media_id", "band", "val")
    assert(ImageDup.nearDupPairs(bands, maxHamming = 10).count() == 0,
      "no band matches exactly -> exact banding must miss")
    val mp = ImageDup.nearDupPairs(bands, maxHamming = 10, probeBits = 1)
      .collect()
    assert(mp.length == 1 && mp.head.getLong(2) == 5L)
    // ...but a pair beyond the guarantee with every band 2 bits off
    // (d=8) stays invisible even to 1-bit probes
    val far = Seq(
      (1L, 0, 0L), (1L, 1, 0L), (1L, 2, 0L), (1L, 3, 0L),
      (2L, 0, 3L), (2L, 1, 3L), (2L, 2, 3L), (2L, 3, 3L))
      .toDF("media_id", "band", "val")
    assert(ImageDup.nearDupPairs(far, maxHamming = 10, probeBits = 1)
      .count() == 0)
  }

  test("collapsed edges: same connected components as the pairwise " +
      "graph, linear edges inside exact-hash groups") {
    import spark.implicits._
    // three exact copies (codec-varied), one near image, one far image
    val px = Array.tabulate(64)(i => if (i % 8 >= 4) 200 else 0)
    val near = px.clone(); near(0) = 255
    val far = Array.tabulate(64)(i => if ((i / 8) % 2 == 0) 220 else 0)
    val rows = Seq(
      (1L, Multimodal.encodeGray(px, 8, 8, "bmp")),
      (2L, Multimodal.encodeGray(px, 8, 8, "png")),
      (3L, Multimodal.encodeGray(px, 8, 8, "gif")),
      (4L, Multimodal.encodeGray(near, 8, 8)),
      (5L, Multimodal.encodeGray(far, 8, 8)))
    val bands = bandsOf(rows)
    def components(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.connectedComponents(
          Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id"),
          edges.select("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPairs = components(ImageDup.nearDupPairs(bands, maxHamming = 10))
    val viaEdges = components(ImageDup.nearDupEdges(bands, maxHamming = 10))
    assert(viaEdges == viaPairs)
    assert(viaEdges(1L) == viaEdges(2L) && viaEdges(2L) == viaEdges(3L))
    assert(viaEdges(5L) == 5L) // far stays its own cluster
    // edge counts: pairwise has the 3-clique (3 edges) inside the exact
    // group; collapsed has the 2-edge star
    val cliqueEdges = ImageDup.nearDupPairs(bands, maxHamming = 10)
      .filter(col("id1").isin(1L, 2L, 3L) && col("id2").isin(1L, 2L, 3L))
      .count()
    val starEdges = ImageDup.nearDupEdges(bands, maxHamming = 10)
      .filter(col("id1").isin(1L, 2L, 3L) && col("id2").isin(1L, 2L, 3L))
      .count()
    assert(cliqueEdges == 3 && starEdges == 2)
  }

  test("cluster-aware split: a planted cross-split twin pair is flagged " +
      "leaky and both members land in ONE split (no image leaks to eval)") {
    import spark.implicits._
    // find two ids the NAIVE per-item split would separate
    val buckets = spark.range(0, 200)
      .select(col("id"), (graft.Qutil.md5Long60(
        concat(lit("split:"), col("id").cast("string"))) % 10).as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 8 => id }.get
    val evalId = buckets.collectFirst { case (id, b) if b >= 8 => id }.get
    val lone = buckets.keys.find(i => i != trainId && i != evalId).get
    // twin pair = one cluster (canonical = min id); lone = singleton
    val cl = Seq(
      (trainId, math.min(trainId, evalId)),
      (evalId, math.min(trainId, evalId)),
      (lone, lone)).toDF("media_id", "cluster_id")
    val out = Dedup.clusterAwareSplit(cl, idCol = "media_id")
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("split"), r.getAs[String]("naive_split"),
          r.getAs[Boolean]("cluster_leaky")))).toMap
    // the naive split severs the twins — flagged
    assert(out(trainId)._2 == "train" && out(evalId)._2 != "train")
    assert(out(trainId)._3 && out(evalId)._3,
      "cross-split twin cluster must be flagged leaky")
    // the cluster-aware split keeps them together
    assert(out(trainId)._1 == out(evalId)._1)
    // a singleton is never leaky, and its split = its cluster hash
    assert(!out(lone)._3)
  }

  test("hamming arithmetic: a one-band difference is counted exactly") {
    import spark.implicits._
    // synthetic band rows: ids share band 0 value (candidate), differ in
    // band 3 by bits 0 and 5 -> hamming 2
    val bands = Seq(
      (1L, 0, 7L), (1L, 1, 0L), (1L, 2, 1L), (1L, 3, 32L),
      (2L, 0, 7L), (2L, 1, 0L), (2L, 2, 1L), (2L, 3, 1L))
      .toDF("media_id", "band", "val")
    val out = ImageDup.nearDupPairs(bands, maxHamming = 10).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L)
    // ...and a tight threshold rejects it
    assert(ImageDup.nearDupPairs(bands, maxHamming = 1).count() == 0)
  }

  private def dctHashOf(rows: Seq[(Long, Array[Byte])]): Map[Long, Seq[Long]] =
    ImageDup.dctHashBands(
        Multimodal.decodeImagePooledRaw(mediaOf(rows), grid = 8))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }

  test("dctHash: basis table is the exact fixed-point DCT-II; bits " +
      "match a reference computation from the raw pixels") {
    // table spot values: u=0 row all 2^14; C[1][0]=round(cos(pi/16)*2^14)
    assert(ImageDup.dctTable.take(8).forall(_ == 16384L))
    assert(ImageDup.dctTable(8) ==
      math.round(math.cos(math.Pi / 16) * 16384.0))
    val px = Array.tabulate(64)(i => (i * 37 + 11) % 251)
    val got = dctHashOf(Seq((1L, Multimodal.encodeGray(px, 8, 8))))(1L)
    // reference: same integer math in plain Scala
    val t = ImageDup.dctTable
    val coeffs = Array.tabulate(64) { uv =>
      var s = 0L
      var xy = 0
      while (xy < 64) {
        s += px(xy).toLong * t((uv / 8) * 8 + xy / 8) * t((uv % 8) * 8 + xy % 8)
        xy += 1
      }
      s
    }
    val med = coeffs.drop(1).sorted.apply(31)
    val want = (0 until 4).map { k =>
      (0 until 16).foldLeft(0L) { (acc, j) =>
        val b = k * 16 + j
        if (b <= 62 && coeffs(b + 1) > med) acc | (1L << j) else acc
      }
    }
    assert(got == want)
    // band 3 carries only 15 live bits (63 AC coefficients)
    assert(got(3) < (1L << 15))
  }

  test("dctHash: global brightness shift moves only the discarded DC " +
      "term — every band identical; and lossless re-encode pairs at 0") {
    val px = Array.tabulate(64)(i => (i * 13) % 200)
    val shifted = px.map(_ + 40)
    val h = dctHashOf(Seq(
      (1L, Multimodal.encodeGray(px, 8, 8)),
      (2L, Multimodal.encodeGray(shifted, 8, 8))))
    assert(h(1L) == h(2L), "pHash must be brightness-shift invariant")
    val rows = Seq(
      (1L, Multimodal.encodeGray(px, 8, 8, "bmp")),
      (2L, Multimodal.encodeGray(px, 8, 8, "png")))
    val pairs = ImageDup.nearDupPairs(
        ImageDup.dctHashBands(
          Multimodal.decodeImagePooledRaw(mediaOf(rows), grid = 8)),
        maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }
}
