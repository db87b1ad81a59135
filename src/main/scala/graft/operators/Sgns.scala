package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed skip-gram with negative sampling (SGNS word2vec,
  * Mikolov et al. 2013) — the engine TRAINS its own embedding model and
  * serves it through the [[ModelRunner]] bridge contract, so the whole
  * ANN / semantic-dedup / mining stack can run on LEARNED embeddings
  * with zero external dependencies. The reference leaves exactly this
  * seam open as the injected `similarityFunction` extension point
  * (/root/reference/src/main.ts:37-45); at corpus scale the seam is a
  * trained model, and this is its pure-JVM, engine-native form.
  *
  * Training is SYNCHRONOUS full-corpus gradient descent, not Hogwild
  * SGD, because determinism is a gate here, not a nicety:
  *
  *  - Each epoch maps the token corpus once: every (center, context)
  *    pair inside `window` contributes one positive example and
  *    `negatives` unigram^0.75-sampled negatives against the CURRENT
  *    epoch's broadcast weights.
  *  - Per-partition gradients accumulate in FIXED-POINT longs
  *    (scale 2^24); the cross-partition reduce is therefore an exact
  *    integer sum — commutative and associative — so the trained model
  *    is bit-identical under any partitioning or cluster layout (the
  *    same stance as the engine's portable md5 hashes). Per-example
  *    float SGD would be neither (update order = partition layout).
  *  - The driver applies one step per epoch with PER-WORD MEAN
  *    gradients (each word's summed gradient divided by its own touch
  *    count — a diagonal preconditioner), which keeps the effective
  *    step size independent of word frequency and corpus size, then
  *    re-broadcasts. Negative draws are a pure function of
  *    (seed, epoch, doc_id, position, slot) through a splitmix64 mix —
  *    no RNG state anywhere.
  *
  * Scale shape: per epoch, one narrow map over the corpus (no joins)
  * plus one reduceByKey of at most |V| rows of 2×dim longs — the
  * classic parameter-averaging word2vec-on-Spark layout (MLlib's own
  * Word2Vec does the same broadcast-train-aggregate loop). Weights are
  * V×dim×8 bytes broadcast per epoch and V×dim×32 bytes of gradient
  * state per task, so `maxVocab` (default 2^16) bounds executor memory
  * at ~130 MB/task at dim 32; past that, [[trainSharded]] keeps weights
  * and optimizer state hash-sharded by word id (never broadcast, no
  * dense per-task state) and is spec-pinned bit-identical to this path
  * at equal hyperparameters.
  *
  * Fixed-point headroom: one example contributes |grad| ≤ ~2 per
  * component (≤ 2^25 scaled), so a single word overflows a long only
  * past ~2^38 touches per epoch — ~10^11 occurrences of ONE word,
  * beyond any epoch this engine will see at 100 TB with capped vocab.
  */
object Sgns {

  private val GradScale = (1L << 24).toDouble
  private val LossScale = (1L << 20).toDouble

  /** Trained model. `vocab(i)` is word i (ids dense by falling corpus
    * count, ties lexicographic); `vecs(i)` its input embedding;
    * `losses(e)` the mean per-example SGNS loss measured DURING epoch e
    * (against the weights epoch e started from, so a healthy run
    * decreases monotonically). */
  final case class Model(dim: Int, vocab: Array[String],
      vecs: Array[Array[Float]], losses: Array[Double]) extends Serializable {
    @transient lazy val index: Map[String, Int] = vocab.zipWithIndex.toMap

    def vector(word: String): Option[Array[Float]] = index.get(word).map(vecs)

    /** Top-k nearest vocabulary words by cosine (driver-side; vocab is
      * driver-resident by construction). */
    def synonyms(word: String, k: Int): Seq[(String, Double)] =
      vector(word).toSeq.flatMap { q =>
        val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
        vocab.indices.filter(vocab(_) != word)
          .map { i =>
            val v = vecs(i)
            var dot = 0.0; var nn = 0.0; var j = 0
            while (j < dim) { dot += q(j) * v(j); nn += v(j) * v(j); j += 1 }
            val d = qn * math.sqrt(nn)
            (vocab(i), if (d == 0) 0.0 else dot / d)
          }
          .sortBy { case (w, s) => (-s, w) }.take(k)
      }
  }

  /** splitmix64 finalizer — the stateless mixing step behind the
    * deterministic negative draws and the seeded init. */
  private def mix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def hashU01(parts: Long*): Double = {
    val h = parts.foldLeft(0x6c62272e07bb0142L)((acc, p) => mix64(acc ^ p))
    ((h >>> 11).toDouble) / (1L << 53).toDouble
  }

  /** Per-word gradient payload of one reduce key. Key -1 is the LOSS
    * row: `inCnt` carries the fixed-point loss sum, `outCnt` the
    * example count, arrays empty. */
  private final case class Grad(in: Array[Long], out: Array[Long],
      inCnt: Long, outCnt: Long)

  private def mergeGrad(a: Grad, b: Grad): Grad = {
    def add(x: Array[Long], y: Array[Long]): Array[Long] =
      if (x.isEmpty) y else if (y.isEmpty) x
      else { val r = x.clone(); var j = 0
        while (j < r.length) { r(j) += y(j); j += 1 }; r }
    Grad(add(a.in, b.in), add(a.out, b.out), a.inCnt + b.inCnt,
      a.outCnt + b.outCnt)
  }

  /** Train on (idCol, textCol); whitespace tokens (the engine's
    * tokenization convention). Deterministic in (data, hyperparams,
    * seed) — partition layout cannot change a single bit of the
    * result. The driver step is ADAGRAD over per-word mean gradients
    * (accumulator state lives on the driver, so adaptivity costs no
    * determinism): synchronous training takes few large steps where
    * sequential SGD takes millions of small ones, and Adagrad's
    * per-parameter scaling is what makes few steps work from word2vec's
    * tiny ±0.5/dim init — plain GD at any fixed lr either stalls (the
    * epoch-1 gradients are O(1/dim)) or diverges once the weights grow. */
  def train(docs: DataFrame, dim: Int = 32, window: Int = 2,
      negatives: Int = 4, epochs: Int = 8, lr: Double = 0.3,
      minCount: Int = 1, maxVocab: Int = 1 << 16,
      seed: Long = 42L,
      idCol: String = "doc_id", textCol: String = "text"): Model = {
    require(dim >= 1 && window >= 1 && negatives >= 0 && epochs >= 1,
      "dim/window/epochs must be >= 1, negatives >= 0")
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    import spark.implicits._

    // null text is data (the codec stance): it contributes no tokens
    val toks = docs.select(col(idCol).cast("long").as("id"),
      split(trim(coalesce(col(textCol), lit(""))), "\\s+").as("toks"))

    // vocabulary: dense ids by falling count (ties lexicographic) —
    // vocab-sized sort + collect, the one intentionally driver-resident
    // artifact (same budget class as every trained-literal model here)
    val vocabRows = toks.select(explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
    val vocab = vocabRows.map(_.getString(0))
    val vCounts = vocabRows.map(_.getLong(1))
    val v = vocab.length
    require(v >= 2, s"SGNS needs a vocabulary of >= 2 words, got $v")
    val bIndex = sc.broadcast(vocab.zipWithIndex.toMap)

    // unigram^0.75 cumulative table for negative sampling (normalized)
    val pows = vCounts.map(c => math.pow(c.toDouble, 0.75))
    val total = pows.sum
    val cum = new Array[Double](v)
    var acc = 0.0
    var i = 0
    while (i < v) { acc += pows(i) / total; cum(i) = acc; i += 1 }
    cum(v - 1) = 1.0
    val bCum = sc.broadcast(cum)

    // corpus as token-id arrays, one pass, persisted across epochs
    val corpus = toks.as[(Long, Seq[String])]
      .map { case (id, ts) =>
        val idx = bIndex.value
        (id, ts.iterator.flatMap(idx.get).toArray)
      }
      .persist()
    corpus.count()

    // seeded deterministic init: in ~ U(-0.5/dim, 0.5/dim), out = 0
    // (the reference word2vec initialization)
    val inW = new Array[Float](v * dim)
    val outW = new Array[Float](v * dim)
    i = 0
    while (i < v * dim) {
      inW(i) = ((hashU01(seed, 0x1217L, i.toLong) - 0.5) / dim).toFloat
      i += 1
    }

    val losses = new Array[Double](epochs)
    val accIn = new Array[Double](v * dim)
    val accOut = new Array[Double](v * dim)
    val dims = dim
    val win = window
    val negs = negatives
    var e = 0
    while (e < epochs) {
      val bIn = sc.broadcast(inW.clone())
      val bOut = sc.broadcast(outW.clone())
      val epoch = e
      val agg = corpus.rdd.mapPartitions { it =>
        val inV = bIn.value; val outV = bOut.value; val cumV = bCum.value
        val nv = cumV.length
        // flat fixed-point gradient state (the documented v×dim×32B/task
        // envelope) — no per-word boxing in the hot loop
        val gIn = new Array[Long](nv * dims)
        val gOut = new Array[Long](nv * dims)
        val cIn = new Array[Long](nv)
        val cOut = new Array[Long](nv)
        var lossFp = 0L
        var nPairs = 0L
        def sampleNeg(u: Double): Int = {
          var lo = 0; var hi = nv - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cumV(mid) <= u) lo = mid + 1 else hi = mid
          }
          lo
        }
        def trainPair(c: Int, t: Int, label: Double): Unit = {
          val co = c * dims; val to = t * dims
          var dot = 0.0; var j = 0
          while (j < dims) { dot += inV(co + j) * outV(to + j); j += 1 }
          val s = 1.0 / (1.0 + StrictMath.exp(-dot))
          val g = s - label
          val loss =
            if (label > 0.5) -StrictMath.log(math.max(s, 1e-12))
            else -StrictMath.log(math.max(1.0 - s, 1e-12))
          lossFp += math.rint(loss * LossScale).toLong
          nPairs += 1
          j = 0
          while (j < dims) {
            gIn(co + j) += math.rint(g * outV(to + j) * GradScale).toLong
            gOut(to + j) += math.rint(g * inV(co + j) * GradScale).toLong
            j += 1
          }
          cIn(c) += 1L
          cOut(t) += 1L
        }
        it.foreach { case (docId, ids) =>
          var p = 0
          while (p < ids.length) {
            val c = ids(p)
            var off = -win
            while (off <= win) {
              val q = p + off
              if (off != 0 && q >= 0 && q < ids.length) {
                val t = ids(q)
                trainPair(c, t, 1.0)
                var k = 0
                while (k < negs) {
                  val n = sampleNeg(hashU01(seed, 0x4e47L, epoch.toLong,
                    docId, p.toLong, (off + win).toLong, k.toLong))
                  // a draw that hits the true context is skipped, not
                  // redrawn (the standard word2vec shortcut)
                  if (n != t) trainPair(c, n, 0.0)
                  k += 1
                }
              }
              off += 1
            }
            p += 1
          }
        }
        // emit only touched words (sparse on small partitions)
        val out = Iterator((-1, Grad(Array.emptyLongArray,
          Array.emptyLongArray, lossFp, nPairs))) ++
          Iterator.range(0, nv)
            .filter(w => cIn(w) > 0 || cOut(w) > 0)
            .map { w =>
              (w, Grad(
                if (cIn(w) > 0)
                  java.util.Arrays.copyOfRange(gIn, w * dims, (w + 1) * dims)
                else Array.emptyLongArray,
                if (cOut(w) > 0)
                  java.util.Arrays.copyOfRange(gOut, w * dims, (w + 1) * dims)
                else Array.emptyLongArray,
                cIn(w), cOut(w)))
            }
        out
      }.reduceByKey(mergeGrad _).collect()
      bIn.destroy(); bOut.destroy()

      agg.foreach { case (w, gr) =>
        if (w < 0) {
          losses(epoch) =
            if (gr.outCnt == 0) 0.0
            else (gr.inCnt.toDouble / LossScale) / gr.outCnt
        } else {
          var j = 0
          if (gr.inCnt > 0) {
            val o = w * dims
            while (j < dims) {
              val g = (gr.in(j).toDouble / GradScale) / gr.inCnt
              accIn(o + j) += g * g
              inW(o + j) =
                (inW(o + j) - lr * g / (math.sqrt(accIn(o + j)) + 1e-8)).toFloat
              j += 1
            }
          }
          if (gr.outCnt > 0) {
            val o = w * dims; j = 0
            while (j < dims) {
              val g = (gr.out(j).toDouble / GradScale) / gr.outCnt
              accOut(o + j) += g * g
              outW(o + j) =
                (outW(o + j) - lr * g / (math.sqrt(accOut(o + j)) + 1e-8)).toFloat
              j += 1
            }
          }
        }
      }
      e += 1
    }
    corpus.unpersist()
    bIndex.destroy(); bCum.destroy()

    Model(dim, vocab, Array.tabulate(v)(w =>
      java.util.Arrays.copyOfRange(inW, w * dim, (w + 1) * dim)), losses)
  }

  /** Per-word sharded state of [[trainSharded]]: weights + Adagrad
    * accumulators live in an RDD keyed by word id, NEVER broadcast and
    * never driver-resident during training. */
  private final case class WState(in: Array[Float], out: Array[Float],
      accIn: Array[Double], accOut: Array[Double])

  /** VOCAB-SHARDED SGNS — the documented deferral of [[train]]'s
    * broadcast envelope (a 1M-word vocab at d=32 is a 256 MB weight
    * broadcast and 512 MB of DENSE per-task gradient state; capped
    * vocab was the honest bound until now). Same math, different
    * residence:
    *
    *  - weights + Adagrad accumulators live SHARDED by word id in an
    *    RDD (hash-partitioned, persisted across epochs) — nothing
    *    weight-sized ever broadcasts or lands on the driver until the
    *    final model collect;
    *  - each epoch enumerates the SAME (center, target, label) examples
    *    ([[train]]'s loops verbatim, same splitmix negative draws), then
    *    aggregates them to distinct (c, t, label) → n BEFORE touching
    *    weights — within an epoch the weights are fixed, so n identical
    *    examples contribute exactly n × the single-example fixed-point
    *    gradient (rint is per-example in the broadcast path, and n
    *    copies of the same long sum to n·long) — this is what makes the
    *    slim-row aggregation BIT-IDENTICAL, not approximately so;
    *  - distinct pairs join the in-shard on c, then the out-shard on t
    *    (the gradient needs both rows), per-pair gradients scale by n,
    *    and the per-word reduce is [[train]]'s exact integer sum;
    *  - the Adagrad step runs inside a co-partitioned join of the
    *    gradient rows with the weight shard (narrow, no extra shuffle),
    *    per word — update order across words never mattered.
    *
    * Cost shape per epoch: one slim (c, t, label) → n reduce over the
    * example stream, two bounded joins carrying one d-float row per
    * DISTINCT pair, one ≤|V|-row integer reduce, one narrow update
    * join. Vocabulary size now bounds only the SHARDED state
    * (V·d·24 B spread across the cluster), not any single task.
    * Spec-pinned bit-identical to [[train]] at equal hyperparameters. */
  def trainSharded(docs: DataFrame, dim: Int = 32, window: Int = 2,
      negatives: Int = 4, epochs: Int = 8, lr: Double = 0.3,
      minCount: Int = 1, maxVocab: Int = 1 << 20,
      seed: Long = 42L, shards: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Model = {
    require(dim >= 1 && window >= 1 && negatives >= 0 && epochs >= 1,
      "dim/window/epochs must be >= 1, negatives >= 0")
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    import spark.implicits._

    val toks = docs.select(col(idCol).cast("long").as("id"),
      split(trim(coalesce(col(textCol), lit(""))), "\\s+").as("toks"))
    val vocabRows = toks.select(explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
    val vocab = vocabRows.map(_.getString(0))
    val vCounts = vocabRows.map(_.getLong(1))
    val v = vocab.length
    require(v >= 2, s"SGNS needs a vocabulary of >= 2 words, got $v")
    val bIndex = sc.broadcast(vocab.zipWithIndex.toMap)

    // the unigram^0.75 cumulative table still broadcasts — it is
    // V doubles (8 MB at 1M words), not V×d weights
    val pows = vCounts.map(c => math.pow(c.toDouble, 0.75))
    val total = pows.sum
    val cum = new Array[Double](v)
    var acc0 = 0.0
    var i = 0
    while (i < v) { acc0 += pows(i) / total; cum(i) = acc0; i += 1 }
    cum(v - 1) = 1.0
    val bCum = sc.broadcast(cum)

    val corpus = toks.as[(Long, Seq[String])]
      .map { case (id, ts) =>
        val idx = bIndex.value
        (id, ts.iterator.flatMap(idx.get).toArray)
      }
      .persist()
    corpus.count()

    val part = new org.apache.spark.HashPartitioner(shards)
    val dims = dim
    val win = window
    val negs = negatives
    // sharded seeded init: in(w)(j) from the SAME flat-index hash as
    // [[train]]'s driver loop, out = 0, accumulators 0
    var weights: org.apache.spark.rdd.RDD[(Int, WState)] =
      sc.parallelize(0 until v, math.min(shards, v))
        .map { w =>
          val in = new Array[Float](dims)
          var j = 0
          while (j < dims) {
            in(j) = ((hashU01(seed, 0x1217L, (w * dims + j).toLong) - 0.5)
              / dims).toFloat
            j += 1
          }
          (w, WState(in, new Array[Float](dims),
            new Array[Double](dims), new Array[Double](dims)))
        }
        .partitionBy(part).persist()
    weights.count()

    val losses = new Array[Double](epochs)
    var e = 0
    while (e < epochs) {
      val epoch = e
      // 1. example stream — [[train]]'s enumeration verbatim — reduced
      //    to distinct (c, t, label) → n slim rows
      val cnt = corpus.rdd.mapPartitions { it =>
        val cumV = bCum.value
        val nv = cumV.length
        def sampleNeg(u: Double): Int = {
          var lo = 0; var hi = nv - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cumV(mid) <= u) lo = mid + 1 else hi = mid
          }
          lo
        }
        it.flatMap { case (docId, ids) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[((Int, Int, Boolean), Long)]
          var p = 0
          while (p < ids.length) {
            val c = ids(p)
            var off = -win
            while (off <= win) {
              val q = p + off
              if (off != 0 && q >= 0 && q < ids.length) {
                val t = ids(q)
                out += (((c, t, true), 1L))
                var k = 0
                while (k < negs) {
                  val n = sampleNeg(hashU01(seed, 0x4e47L, epoch.toLong,
                    docId, p.toLong, (off + win).toLong, k.toLong))
                  if (n != t) out += (((c, n, false), 1L))
                  k += 1
                }
              }
              off += 1
            }
            p += 1
          }
          out
        }
      }.reduceByKey(_ + _)
      // 2. fetch in[c], then out[t] (projections of the shard — the
      //    joins carry one d-float row per distinct pair, never state)
      val inProj = weights.mapValues(_.in)
      val outProj = weights.mapValues(_.out)
      val gradRows = cnt.map { case ((c, t, l), n) => (c, (t, l, n)) }
        .join(inProj)
        .map { case (c, ((t, l, n), inV)) => (t, (c, l, n, inV)) }
        .join(outProj)
        .mapPartitions { rows =>
          rows.flatMap { case (t, ((c, l, n, inV), outV)) =>
            var dot = 0.0; var j = 0
            while (j < dims) { dot += inV(j) * outV(j); j += 1 }
            val s = 1.0 / (1.0 + StrictMath.exp(-dot))
            val label = if (l) 1.0 else 0.0
            val g = s - label
            val loss =
              if (l) -StrictMath.log(math.max(s, 1e-12))
              else -StrictMath.log(math.max(1.0 - s, 1e-12))
            val gIn = new Array[Long](dims)
            val gOut = new Array[Long](dims)
            j = 0
            while (j < dims) {
              gIn(j) = n * math.rint(g * outV(j) * GradScale).toLong
              gOut(j) = n * math.rint(g * inV(j) * GradScale).toLong
              j += 1
            }
            Iterator(
              (c, Grad(gIn, Array.emptyLongArray, n, 0L)),
              (t, Grad(Array.emptyLongArray, gOut, 0L, n)),
              (-1, Grad(Array.emptyLongArray, Array.emptyLongArray,
                n * math.rint(loss * LossScale).toLong, n)))
          }
        }
      // 3. the exact integer reduce, co-partitioned with the weights
      val grads = gradRows.reduceByKey(part, mergeGrad _).persist()
      val lossRow = grads.lookup(-1)
      losses(epoch) = lossRow.headOption
        .filter(_.outCnt > 0)
        .map(gr => (gr.inCnt.toDouble / LossScale) / gr.outCnt)
        .getOrElse(0.0)
      // 4. Adagrad step inside the narrow co-partitioned join —
      //    [[train]]'s per-word update verbatim, cloned (persisted old
      //    state must not mutate)
      val lrL = lr
      val next = weights.leftOuterJoin(grads)
        .mapValues { case (st, grOpt) =>
          grOpt match {
            case None => st
            case Some(gr) =>
              val in = st.in.clone(); val out = st.out.clone()
              val aIn = st.accIn.clone(); val aOut = st.accOut.clone()
              var j = 0
              if (gr.inCnt > 0) {
                while (j < dims) {
                  val g = (gr.in(j).toDouble / GradScale) / gr.inCnt
                  aIn(j) += g * g
                  in(j) = (in(j) - lrL * g / (math.sqrt(aIn(j)) + 1e-8)).toFloat
                  j += 1
                }
              }
              if (gr.outCnt > 0) {
                j = 0
                while (j < dims) {
                  val g = (gr.out(j).toDouble / GradScale) / gr.outCnt
                  aOut(j) += g * g
                  out(j) = (out(j) - lrL * g / (math.sqrt(aOut(j)) + 1e-8)).toFloat
                  j += 1
                }
              }
              WState(in, out, aIn, aOut)
          }
        }
        .partitionBy(part).persist()
      next.count()
      weights.unpersist()
      grads.unpersist()
      weights = next
      e += 1
    }
    // the one weight-sized driver materialization: the finished model.
    // Collect BEFORE destroying the broadcasts/corpus: the weights RDD
    // is persisted, but an evicted partition would recompute through
    // lineage that closes over bIndex/bCum — destroying first turns a
    // routine eviction at the end of a long run into a crash.
    val vecs = new Array[Array[Float]](v)
    weights.mapValues(_.in).collect().foreach { case (w, in) => vecs(w) = in }
    weights.unpersist()
    corpus.unpersist()
    bIndex.destroy(); bCum.destroy()
    Model(dim, vocab, vecs, losses)
  }

  /** The trained model behind the bridge contract: a document embeds as
    * the MEAN of its in-vocabulary word vectors (the classic word2vec
    * doc representation, and exactly what MLlib `Word2VecModel
    * .transform` computes) — so `EmbeddingBridge.embed(docs, runner)`
    * feeds every downstream ANN/dedup operator with learned vectors.
    * Out-of-vocabulary-only texts embed to the zero vector. */
  final class Runner(model: Model) extends ModelRunner {
    def dim: Int = model.dim
    def embedBatch(texts: Array[String]): Array[Array[Float]] =
      texts.map { t =>
        val acc = new Array[Double](model.dim)
        var n = 0
        Option(t).getOrElse("").trim.split("\\s+").foreach { w =>
          model.index.get(w).foreach { i =>
            val v = model.vecs(i)
            var j = 0
            while (j < model.dim) { acc(j) += v(j); j += 1 }
            n += 1
          }
        }
        if (n == 0) new Array[Float](model.dim)
        else Array.tabulate(model.dim)(j => (acc(j) / n).toFloat)
      }
  }

  /** SUBWORD SGNS — the trained tokenizer composed with the trainer
    * (the fastText shape without n-gram hashing): train SGNS over the
    * corpus' BPE SYMBOL stream ([[Bpe.encodeTokens]] under a trained
    * [[Bpe.BpeModel]]), so the embedding vocabulary is BPE pieces, not
    * whole words. A word — including one never seen in training, or a
    * misspelling — always decomposes to pieces (worst case its
    * characters + end-mark), so nothing embeds to the zero vector the
    * way word-level OOV does ([[Runner]]'s documented hole). Same
    * trainer, same determinism contract; only the token stream
    * changes. */
  def trainSubword(docs: DataFrame, bpe: Bpe.BpeModel, dim: Int = 32,
      window: Int = 2, negatives: Int = 4, epochs: Int = 8,
      lr: Double = 0.3, minCount: Int = 1, maxVocab: Int = 1 << 16,
      seed: Long = 42L,
      idCol: String = "doc_id", textCol: String = "text"): Model = {
    // null text is data (the [[train]] stance): zero tokens, not an NPE
    // inside the encode
    val safe = docs.select(col(idCol),
      coalesce(col(textCol), lit("")).as(textCol))
    val pieceDocs = Bpe.encodeTokens(safe, bpe, idCol, textCol)
      .select(col(idCol), array_join(col("syms"), " ").as(textCol))
    train(pieceDocs, dim, window, negatives, epochs, lr, minCount,
      maxVocab, seed, idCol, textCol)
  }

  /** [[Runner]]'s subword twin: a document embeds as the mean of the
    * PIECE vectors of all its words' BPE decompositions — a typo'd or
    * unseen word contributes through the pieces it shares with its
    * trained neighbors instead of vanishing. Pieces the model has never
    * seen (possible when training capped the piece vocab) are skipped
    * like word-level OOV; only an all-unseen-pieces text embeds to
    * zero. */
  final class SubwordRunner(model: Model, bpe: Bpe.BpeModel)
      extends ModelRunner {
    def dim: Int = model.dim
    // per-executor word → pieces memo (Zipf makes the hit rate the
    // dominant term, the Bpe.encodeTokens precedent); transient so the
    // serialized runner ships only the models
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private def pieces(w: String): Array[String] =
      memo.computeIfAbsent(w, Bpe.encodeWord(_, bpe))
    def embedBatch(texts: Array[String]): Array[Array[Float]] =
      texts.map { t =>
        val acc = new Array[Double](model.dim)
        var n = 0
        Option(t).getOrElse("").trim.split("\\s+")
          .filter(_.nonEmpty).foreach { w =>
            pieces(w).foreach { piece =>
              model.index.get(piece).foreach { i =>
                val v = model.vecs(i)
                var j = 0
                while (j < model.dim) { acc(j) += v(j); j += 1 }
                n += 1
              }
            }
          }
        if (n == 0) new Array[Float](model.dim)
        else Array.tabulate(model.dim)(j => (acc(j) / n).toFloat)
      }
  }

  /** Per-epoch training curve as a DataFrame (epoch, mean_loss) —
    * the battery's observability row for the iterative trainer. */
  def lossCurve(spark: org.apache.spark.sql.SparkSession,
      model: Model): DataFrame = {
    import spark.implicits._
    model.losses.zipWithIndex
      .map { case (l, e) => (e.toLong, math.floor(l * 1e6 + 0.5) / 1e6) }
      .toSeq.toDF("epoch", "mean_loss")
  }
}
