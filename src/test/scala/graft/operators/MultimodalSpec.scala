package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec multimodal kernels: JDK ImageIO image decode (BMP/PNG),
  * hand-parsed RIFF/WAVE PCM16 audio — pinned against hand-computed
  * fixtures, plus codec-agnosticism and corrupt-payload behavior. */
class MultimodalSpec extends AnyFunSuite {

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

  // ---- image ------------------------------------------------------------

  test("BMP round-trip is lossless: solid-gray image pools to exactly p/255") {
    val p = 77
    val bmp = Multimodal.encodeGray(Array.fill(64)(p), 8, 8)
    val out = Multimodal.decodeImagePooled(mediaOf(Seq((1L, bmp))), grid = 4)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Int]("img_w") == 8 && r.getAs[Int]("img_h") == 8)
    val feat = r.getAs[scala.collection.Seq[Double]]("feature")
    assert(feat.length == 16)
    // gray pixel => integer BT.601 luma == p exactly; pooled mean of a
    // constant block = p/255, then 1e-6 fixed point
    val expect = math.floor(p / 255.0 * 1e6 + 0.5) / 1e6
    assert(feat.forall(_ == expect), s"$feat vs $expect")
  }

  test("gradient image pools to hand-computed block means") {
    // pixel(y,x) = y*8 + x (0..63): block (by,bx) covers 2x2 pixels
    // {(2by,2bx),(2by,2bx+1),(2by+1,2bx),(2by+1,2bx+1)}
    val px = Array.tabulate(64)(identity)
    val bmp = Multimodal.encodeGray(px, 8, 8)
    val feat = Multimodal.decodeImagePooled(mediaOf(Seq((1L, bmp))), grid = 4)
      .collect().head.getAs[scala.collection.Seq[Double]]("feature")
    for (by <- 0 until 4; bx <- 0 until 4) {
      val vals = for (dy <- 0 to 1; dx <- 0 to 1)
        yield (2 * by + dy) * 8 + (2 * bx + dx)
      val sum = vals.sum.toLong
      val expect = math.floor(sum.toDouble / (4 * 255.0) * 1e6 + 0.5) / 1e6
      assert(feat(by * 4 + bx) == expect, s"block ($by,$bx)")
    }
  }

  test("decoder is codec-agnostic: PNG bytes give identical features to BMP") {
    val px = Array.tabulate(64)(i => (i * 4) % 256)
    val bmp = Multimodal.encodeGray(px, 8, 8, "bmp")
    val png = Multimodal.encodeGray(px, 8, 8, "png")
    assert(!java.util.Arrays.equals(bmp, png)) // genuinely different codecs
    val out = Multimodal.decodeImagePooled(
        mediaOf(Seq((1L, bmp), (2L, png))), grid = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("feature")).toMap
    assert(out(1L) == out(2L))
  }

  test("undecodable payloads are skipped, not fatal") {
    val good = Multimodal.encodeGray(Array.fill(64)(10), 8, 8)
    val out = Multimodal.decodeImagePooled(
      mediaOf(Seq((1L, good), (2L, Array[Byte](1, 2, 3)),
        (3L, Array.empty[Byte]))), grid = 4)
    assert(out.select("media_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("adaptive pooling handles non-divisible sizes (5x3 image, grid 4)") {
    val px = Array.tabulate(15)(i => i * 17 % 256) // w=5, h=3
    val bmp = Multimodal.encodeGray(px, 5, 3)
    val r = Multimodal.decodeImagePooled(mediaOf(Seq((1L, bmp))), grid = 4)
      .collect().head
    assert(r.getAs[Int]("img_w") == 5 && r.getAs[Int]("img_h") == 3)
    val feat = r.getAs[scala.collection.Seq[Double]]("feature")
    assert(feat.length == 16)
    // every pixel lands in exactly one block: weighted mean of features
    // recovers the global mean
    val sum = new Array[Long](16)
    val cnt = new Array[Long](16)
    for (y <- 0 until 3; x <- 0 until 5) {
      val b = (y * 4 / 3) * 4 + (x * 4 / 5)
      sum(b) += px(y * 5 + x); cnt(b) += 1
    }
    for (b <- 0 until 16) {
      val expect =
        if (cnt(b) == 0) 0.0
        else math.floor(sum(b).toDouble / (cnt(b) * 255.0) * 1e6 + 0.5) / 1e6
      assert(feat(b) == expect, s"block $b")
    }
  }

  test("real resize: dims follow resizeMeta geometry, output decodable, " +
      "constant image stays constant") {
    val bmp = Multimodal.encodeGray(Array.fill(64)(200), 8, 8)
    val out = Multimodal.resizeImage(mediaOf(Seq((1L, bmp))), maxSide = 4)
      .collect().head
    assert(out.getAs[Int]("out_width") == 4 && out.getAs[Int]("out_height") == 4)
    val resized = out.getAs[Array[Byte]]("content")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 4 && img.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(((img.getRGB(x, y) >> 16) & 0xFF) == 200)
    // small-enough image is untouched geometrically
    val same = Multimodal.resizeImage(mediaOf(Seq((1L, bmp))), maxSide = 16)
      .collect().head
    assert(same.getAs[Int]("out_width") == 8 && same.getAs[Int]("out_height") == 8)
  }

  test("quantize255: min->0, max->255, constant vector -> zeros") {
    val q = Multimodal.quantize255(Array(1.0f, 3.0f, 2.0f))
    assert(q.toSeq == Seq(0, 255, 128)) // (2-1)/(3-1)*255+0.5 = 128.0 floor
    assert(Multimodal.quantize255(Array(5f, 5f, 5f)).toSeq == Seq(0, 0, 0))
  }

  // ---- video ------------------------------------------------------------

  test("animated GIF round-trip: every frame's features exact, in order") {
    val frames = (0 until 3).map(f => Array.tabulate(16)(i => (i * 16 + f * 40) % 256))
    val gif = Multimodal.encodeGrayGifFrames(frames, 4, 4)
    val rows = Multimodal.decodeVideoFramesPooled(mediaOf(Seq((5L, gif))), grid = 4)
      .collect().sortBy(_.getInt(1))
    assert(rows.length == 3)
    assert(rows.forall(_.getInt(2) == 3))
    rows.zipWithIndex.foreach { case (r, f) =>
      assert(r.getInt(1) == f)
      val feat = r.getAs[scala.collection.Seq[Double]]("feature")
      val expect = frames(f).map(p => math.floor(p / (1 * 255.0) * 1e6 + 0.5) / 1e6)
      assert(feat.toSeq == expect.toSeq, s"frame $f")
    }
  }

  test("frame-stride sampling keeps every stride-th frame") {
    val frames = (0 until 6).map(f => Array.fill(16)(f * 30))
    val gif = Multimodal.encodeGrayGifFrames(frames, 4, 4)
    val got = Multimodal.decodeVideoFramesPooled(
        mediaOf(Seq((1L, gif))), grid = 4, stride = 2)
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(got == Seq(0, 2, 4))
  }

  test("single-frame images decode as 1-frame videos; junk is skipped") {
    val bmp = Multimodal.encodeGray(Array.fill(64)(120), 8, 8)
    val out = Multimodal.decodeVideoFramesPooled(
        mediaOf(Seq((1L, bmp), (2L, Array[Byte](1, 2, 3)))), grid = 4)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getInt(1) == 0 &&
      out.head.getInt(2) == 1)
  }

  // ---- audio ------------------------------------------------------------

  test("WAV encode/parse round-trip: header fields and exact samples") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5)
    val wav = Multimodal.encodePcm16Wav(samples, 8000)
    assert(wav.length == 44 + 12)
    val Some((rate, ch, back)) = Multimodal.parseWav(wav)
    assert(rate == 8000 && ch == 1)
    assert(back.toSeq == samples.toSeq)
  }

  test("parser walks unknown chunks (LIST before data) and rejects junk") {
    val samples = Array[Short](100, -100, 100, -100)
    val wav = Multimodal.encodePcm16Wav(samples, 16000)
    // splice a LIST chunk between fmt and data: real WAVs carry metadata
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.slice(0, 36) ++ listChunk ++ wav.slice(36, wav.length)
    // fix the RIFF size field (bytes 4..7, LE)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val Some((rate, _, back)) = Multimodal.parseWav(spliced)
    assert(rate == 16000 && back.toSeq == samples.toSeq)
    assert(Multimodal.parseWav("RIFFjunk".getBytes).isEmpty)
    assert(Multimodal.parseWav(Array.fill[Byte](100)(7)).isEmpty)
  }

  test("audio features: square wave has rms == amplitude and zcr == n-1") {
    val n = 64
    val amp = 1200
    val samples = Array.tabulate(n)(i =>
      (if (i % 2 == 0) amp else -amp).toShort)
    val wav = Multimodal.encodePcm16Wav(samples, 8000)
    val rows = Multimodal.decodeWavFeatures(mediaOf(Seq((7L, wav))), windows = 8)
      .collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getAs[Long]("n_samples") == 64L))
    assert(rows.forall(_.getAs[Int]("sample_rate") == 8000))
    assert(rows.forall(_.getAs[Long]("zcr") == 63L))
    // constant |s| => rms == amp exactly (integer sqrt of amp^2)
    assert(rows.forall(_.getAs[Double]("rms") == amp.toDouble))
    assert(rows.map(_.getAs[Int]("window")).sorted.toSeq == (0 until 8))
  }

  test("non-WAV payloads are skipped by decodeWavFeatures") {
    val wav = Multimodal.encodePcm16Wav(Array[Short](1, 2, 3, 4), 8000)
    val out = Multimodal.decodeWavFeatures(
      mediaOf(Seq((1L, wav), (2L, Array[Byte](9, 9)))), windows = 2)
    assert(out.select("media_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("audio fingerprint: hand-computed delta bits; metadata-spliced " +
      "twin fingerprints identically; different signal differs") {
    // energies per window (4 windows of 2 samples): |s| = 100,100 |
    // 300,300 | 200,200 | 400,400 -> rms = 100,300,200,400 ->
    // deltas up,down,up -> bits 0b101 = 5
    val samples = Array[Short](100, -100, 300, -300, 200, -200, 400, -400)
    val wav = Multimodal.encodePcm16Wav(samples, 8000)
    val fp = Multimodal.audioFingerprint(mediaOf(Seq((1L, wav))), windows = 4)
      .collect().head
    assert(fp.getLong(1) == 5L, s"fp = ${fp.getLong(1)}")
    assert(fp.getLong(2) == 8L)
    // splice a LIST chunk: byte-different file, identical samples
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.slice(0, 36) ++ listChunk ++ wav.slice(36, wav.length)
    java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, spliced.length - 8)
    assert(!java.util.Arrays.equals(wav, spliced))
    val other = Multimodal.encodePcm16Wav(
      Array[Short](400, -400, 200, -200, 300, -300, 100, -100), 8000)
    val fps = Multimodal.audioFingerprint(
        mediaOf(Seq((1L, wav), (2L, spliced), (3L, other))), windows = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L), "twin must fingerprint identically")
    assert(fps(1L) != fps(3L), "reversed envelope must differ")
  }

  test("audio near-match: a lightly edited signal pairs through the " +
      "banded fingerprint; a different envelope does not") {
    // base: alternating quiet/loud windows; edit: bump ONE sample a bit
    // (changes at most a couple of delta bits); far: reversed envelope
    val base = Array.tabulate(66)(i =>
      (if ((i / 2) % 2 == 0) 200 + i else 4000 + i).toShort)
    val edited = base.clone(); edited(10) = (edited(10) + 300).toShort
    // monotone rising energy: every delta bit 1, vs base's alternating
    // bits — ~4 flipped bits in EVERY band, invisible to exact banding
    val far = Array.tabulate(66)(i => (100 + i * 40).toShort)
    val media = mediaOf(Seq(
      (1L, Multimodal.encodePcm16Wav(base, 8000)),
      (2L, Multimodal.encodePcm16Wav(edited, 8000)),
      (3L, Multimodal.encodePcm16Wav(far, 8000))))
    val pairs = ImageDup.nearDupPairs(
        Multimodal.audioFingerprintBands(media), maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"edited copy must pair: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // band values decompose the fingerprint exactly
    import spark.implicits._
    val fp = Multimodal.audioFingerprint(
        mediaOf(Seq((1L, Multimodal.encodePcm16Wav(base, 8000)))), 33)
      .collect().head.getLong(1)
    val bands = Multimodal.audioFingerprintBands(
        mediaOf(Seq((1L, Multimodal.encodePcm16Wav(base, 8000)))))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert((0 to 3).map(k => bands(k) << (k * 8)).sum == fp)
  }

  test("quantizePcm16: full-scale range, constant vector -> silence") {
    val q = Multimodal.quantizePcm16(Array(-1.0f, 1.0f))
    assert(q.toSeq == Seq(-32768, 32767))
    assert(Multimodal.quantizePcm16(Array(2f, 2f)).forall(_ == 0))
  }
}
