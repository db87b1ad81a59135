package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SgnsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  /** Planted-synonym corpus: `alpha`/`beta` share one context family
    * (topic A), `gamma`/`delta` another (topic B), and the two topics
    * share nothing but the function word `the`. Deterministic, no RNG. */
  private def plantedDocs = {
    val aCtx = Seq(
      "the NOUN river flows north", "cold NOUN water runs clear",
      "the NOUN stream bends east", "deep NOUN current pulls south",
      "the NOUN bank floods spring")
    val bCtx = Seq(
      "the NOUN engine burns fuel", "hot NOUN piston drives fast",
      "the NOUN turbine spins loud", "old NOUN motor leaks oil",
      "the NOUN gearbox grinds hard")
    // the trailing rep token makes every TEXT unique (it appears in
    // both topics equally, so it carries no topic signal) — otherwise
    // the hash stub gets topic retrieval for free off exact-duplicate
    // texts and the beats-the-stub gate tests nothing
    val rows = for {
      rep <- 0 until 12
      (ctx, nouns, topic) <- Seq((aCtx, Seq("alpha", "beta"), "A"),
        (bCtx, Seq("gamma", "delta"), "B"))
      c <- ctx
      n <- nouns
    } yield (topic, c.replace("NOUN", n) + s" rep$rep")
    rows.zipWithIndex
      .map { case ((topic, text), i) => (i.toLong, topic, text) }
      .toDF("doc_id", "topic", "text")
  }

  test("training is a pure function of (data, seed): any partition " +
      "layout reproduces the identical model, bit for bit") {
    val docs = plantedDocs
    def fit(df: org.apache.spark.sql.DataFrame) =
      Sgns.train(df, dim = 16, window = 2, negatives = 3, epochs = 4)
    val m1 = fit(docs.repartition(7))
    val m2 = fit(docs.repartition(2))
    assert(m1.vocab.toSeq == m2.vocab.toSeq)
    assert(m1.losses.toSeq == m2.losses.toSeq)
    assert(m1.vecs.map(_.toSeq).toSeq == m2.vecs.map(_.toSeq).toSeq)
    // and a different seed is a genuinely different model
    val m3 = Sgns.train(docs, dim = 16, window = 2, negatives = 3,
      epochs = 4, seed = 43L)
    assert(m3.vecs.map(_.toSeq).toSeq != m1.vecs.map(_.toSeq).toSeq)
  }

  test("training curve: loss falls hard overall and never regresses " +
      "beyond adagrad jitter") {
    val m = Sgns.train(plantedDocs, dim = 16, window = 2, negatives = 3,
      epochs = 8)
    val l = m.losses.toSeq
    // strong overall decrease (epoch 0 measures the untrained model:
    // sigma(0) everywhere = ln 2)
    assert(math.abs(l.head - math.log(2)) < 1e-3, s"epoch-0 loss: $l")
    assert(l.last < 0.6 * l.head, s"loss barely moved: $l")
    // near-monotone: adagrad steps may overshoot a hair, never regress
    // materially, and never above the untrained baseline
    assert(l.zip(l.tail).forall { case (a, b) => b < a * 1.05 },
      s"loss regressed beyond tolerance: $l")
    assert(l.tail.forall(_ < l.head), s"an epoch exceeded baseline: $l")
  }

  test("planted synonyms are recovered: interchangeable words are each " +
      "other's nearest vocabulary neighbor") {
    val m = Sgns.train(plantedDocs, dim = 16, window = 2, negatives = 3,
      epochs = 8)
    assert(m.synonyms("alpha", 1).headOption.map(_._1).contains("beta"))
    assert(m.synonyms("beta", 1).headOption.map(_._1).contains("alpha"))
    assert(m.synonyms("gamma", 1).headOption.map(_._1).contains("delta"))
    // cross-topic nouns must NOT be closer than the planted pair
    val syn = m.synonyms("alpha", 3).map(_._1)
    assert(!syn.takeWhile(_ != "beta").exists(Set("gamma", "delta")))
  }

  test("learned doc embeddings beat the hash stub on topic retrieval " +
      "through the SAME bridge plumbing") {
    val docs = plantedDocs
    val topics = docs.select("doc_id", "topic").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = Sgns.train(docs, dim = 16, window = 2, negatives = 3,
      epochs = 8)

    def topicRecall(embedded: org.apache.spark.sql.DataFrame): Double = {
      val probes = embedded.filter(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"), col("embedding").as("query_vec"))
      val nn = KnnJoin.exactKnnJoin(embedded, probes, k = 6,
          metric = "cosine", baseId = "doc_id")
        .filter(col("neighbor_id") =!= col("query_id"))
        .select("query_id", "neighbor_id").collect()
      val hits = nn.count(r => topics(r.getLong(0)) == topics(r.getLong(1)))
      hits.toDouble / nn.length
    }

    val learned = topicRecall(
      EmbeddingBridge.embed(docs, new Sgns.Runner(m), batchSize = 16))
    val stub = topicRecall(
      EmbeddingBridge.embed(docs, new HashStubModel(16), batchSize = 16))
    // topics are balanced, so the stub sits near chance (~0.5); the
    // trained model must separate them decisively
    assert(learned > 0.9, s"learned topic recall $learned")
    assert(learned > stub + 0.2, s"learned $learned vs stub $stub")
  }

  test("MLlib Word2Vec parity: both implementations recover the planted " +
      "pair from the same corpus and tokenization") {
    val docs = plantedDocs
    val ours = Sgns.train(docs, dim = 16, window = 2, negatives = 3,
      epochs = 8)
    assert(ours.synonyms("alpha", 2).map(_._1).contains("beta"))

    val toks = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .coalesce(1)
    val ml = new org.apache.spark.ml.feature.Word2Vec()
      .setVectorSize(16).setWindowSize(2).setMinCount(1).setMaxIter(8)
      .setSeed(42L).setNumPartitions(1)
      .setInputCol("toks").setOutputCol("docvec")
      .fit(toks)
    val mlSyn = ml.findSynonyms("alpha", 2).collect().map(_.getString(0))
    assert(mlSyn.contains("beta"),
      s"MLlib synonyms of alpha: ${mlSyn.mkString(",")}")

    // and the doc-vector twin: MLlib's transform is the same
    // mean-of-words representation the bridge Runner computes
    val dv = MlLsh.word2VecDocVecs(docs, dim = 16, window = 2, maxIter = 8)
    assert(dv.count() == docs.count())
    assert(dv.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(16))
  }

  test("Runner: doc embedding is the exact mean of in-vocab word " +
      "vectors; OOV-only text embeds to zero") {
    val m = Sgns.train(plantedDocs, dim = 8, window = 2, negatives = 2,
      epochs = 2)
    val r = new Sgns.Runner(m)
    val Array(got) = r.embedBatch(Array("alpha beta"))
    val a = m.vector("alpha").get; val b = m.vector("beta").get
    val want = Array.tabulate(8)(j => ((a(j).toDouble + b(j)) / 2).toFloat)
    assert(got.toSeq == want.toSeq)
    val Array(oov) = r.embedBatch(Array("zzz qqq"))
    assert(oov.toSeq == Seq.fill(8)(0f))
  }

  test("subword SGNS: an OOV/misspelled word embeds non-zero from its " +
      "BPE pieces and still lands on the right topic, where the " +
      "word-level model gives the zero vector") {
    val docs = plantedDocs
    // FEW merges so topic words stay multi-piece (a fully-merged
    // "alpha</w>" symbol would leave a typo with no shared pieces —
    // the whole point of the subword form is the partial overlap)
    val bpe = Bpe.train(docs, numMerges = 40, minPairCount = 1)
    val word = Sgns.train(docs, dim = 16, window = 2, negatives = 3,
      epochs = 6, seed = 11L)
    val sub = Sgns.trainSubword(docs, bpe, dim = 16, window = 2,
      negatives = 3, epochs = 6, seed = 11L)
    val wr = new Sgns.Runner(word)
    val sr = new Sgns.SubwordRunner(sub, bpe)

    // the misspelled topic word alone: word-level has no entry -> zero;
    // subword decomposes into pieces shared with the trained word
    val typo = "alphaa"
    assert(word.vector(typo).isEmpty)
    val Array(wv) = wr.embedBatch(Array(typo))
    assert(wv.forall(_ == 0f), "word-level OOV must embed to zero")
    val Array(sv) = sr.embedBatch(Array(typo))
    assert(sv.exists(_ != 0f), "subword OOV must embed from pieces")

    // retrieval: the typo'd query must sit closer to topic A's docs
    // than topic B's under the subword model (word-level cannot rank a
    // zero vector at all)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) { d += a(j) * b(j); na += a(j) * a(j)
        nb += b(j) * b(j); j += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val byTopic = docs.select("topic", "text").collect()
      .groupBy(_.getString(0)).map { case (t, rows) =>
        val embs = sr.embedBatch(rows.map(_.getString(1)))
        t -> Array.tabulate(16)(j => embs.map(_(j)).sum / embs.length)
      }
    val simA = cos(sv, byTopic("A"))
    val simB = cos(sv, byTopic("B"))
    assert(simA > simB,
      f"typo query must rank topic A over B (simA=$simA%.3f simB=$simB%.3f)")
  }

  test("vocab-sharded training is BIT-IDENTICAL to the broadcast path " +
      "at equal hyperparameters, under any partitioning") {
    val docs = plantedDocs
    val broad = Sgns.train(docs, dim = 8, window = 2, negatives = 3,
      epochs = 3, seed = 7L)
    val shard = Sgns.trainSharded(docs.repartition(5), dim = 8, window = 2,
      negatives = 3, epochs = 3, seed = 7L, shards = 3)
    assert(shard.vocab.toSeq == broad.vocab.toSeq)
    assert(shard.losses.toSeq == broad.losses.toSeq,
      "per-epoch losses must match exactly")
    // float-bit equality, word by word
    assert(shard.vecs.map(_.toSeq).toSeq == broad.vecs.map(_.toSeq).toSeq,
      "sharded weights must equal the broadcast weights bit for bit")
    // and the sharded path is itself partition-invariant
    val shard2 = Sgns.trainSharded(docs.repartition(2), dim = 8, window = 2,
      negatives = 3, epochs = 3, seed = 7L, shards = 6)
    assert(shard2.vecs.map(_.toSeq).toSeq == shard.vecs.map(_.toSeq).toSeq)
  }
}
