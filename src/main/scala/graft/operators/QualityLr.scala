package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier (the GPT-3/LLaMA-style curation stage):
  * logistic regression from cheap content features to "looks like the
  * curated sources", used to keep high-quality documents from a crawled
  * corpus. Heuristic scores (`text_quality`) rank; this LEARNS the
  * feature weighting from labeled examples — the published recipe is a
  * linear classifier over bag-of-features with curated corpora as
  * positives.
  *
  * Portability: every feature is fixed-point rounded (1e-6) BEFORE use,
  * with the identical expression in the DuckDB oracle, so the training
  * rows are engine-identical by construction; training itself is a
  * bounded-sample driver-side IRLS (deterministic: md5-ordered sample,
  * fixed iterations, ridge-regularized normal equations solved by
  * Gaussian elimination with partial pivoting); scoring emits the LOGIT
  * (pure left-associative double arithmetic over literal weights —
  * exactly reproducible cross-engine; no transcendental in the compared
  * output) and `kept` = logit > 0 ⇔ p > 0.5.
  *
  * Scale shape: features are one in-row projection; fit touches a
  * `sampleN`-bounded sample; scoring is another pure projection with
  * the weights inlined — zero shuffle at any corpus size,
  * stream-capable like [[Dsir.score]].
  */
object QualityLr {

  /** weights = (bias, w_len, w_punct, w_stop, w_wlen). */
  case class Model(weights: Array[Double])

  private val featNames = Seq("f_len", "f_punct", "f_stop", "f_wlen")

  /** The four rounded feature Columns over `textCol` — ONE definition
    * shared by [[features]] (training) and [[withScore]] (serving), so
    * the train and serve expressions can never drift apart (the 1e-6
    * rounding and operand order must stay bit-identical in both —
    * ADVICE r14). */
  private def featureCols(textCol: Column): Seq[(String, Column)] = {
    val nTok = size(split(trim(textCol), "\\s+")).cast("double")
    val nCh = length(textCol).cast("double")
    val punct = length(regexp_replace(textCol, "[a-z0-9\\s]", ""))
      .cast("double")
    val stops = regexp_count(textCol,
      lit("\\b(the|a|of|and|in|to|is)\\b")).cast("double")
    Seq(
      "f_len" -> graft.Qutil.rnd(least(lit(1.0), nTok / 100.0), 6),
      "f_punct" -> graft.Qutil.rnd(punct / nCh, 6),
      "f_stop" -> graft.Qutil.rnd(stops / nTok, 6),
      "f_wlen" -> graft.Qutil.rnd(nCh / nTok, 6))
  }

  /** The portable feature projection: length saturation, punctuation
    * ratio, stopword rate, mean token length — each 1e-6 fixed-point
    * (the `text_quality` expressions). Null-text docs are dropped. */
  def features(docs: DataFrame): DataFrame =
    // empty text makes f_punct a 0/0 NULL that would NPE the training
    // collect — no features to learn from either way, so drop the row
    docs.filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id") +:
        featureCols(col("text")).map { case (n, c) => c.as(n) }: _*)

  /** TRAIN on a bounded md5-ordered sample labeled by `isPositive`
    * (evaluated over the doc columns, e.g. curated-source membership).
    * IRLS with ridge `lambda`, `iters` fixed Newton steps. */
  def fit(docs: DataFrame, isPositive: Column, sampleN: Int = 500,
      iters: Int = 25, lambda: Double = 1e-3): Model = {
    val h = graft.Qutil.md5Long60(
      concat(lit("qlr:"), col("doc_id").cast("string")))
    val sample = features(docs)
      .join(docs.select(col("doc_id"), isPositive.cast("int").as("y")),
        Seq("doc_id"))
      .withColumn("h", h)
      .orderBy(col("h").asc, col("doc_id").asc).limit(sampleN)
      .select((Seq(col("y").cast("double")) ++
        featNames.map(col)): _*)
      .collect()
      .map(r => (r.getDouble(0),
        Array(1.0) ++ (1 to featNames.length).map(r.getDouble)))
    require(sample.nonEmpty, "quality-classifier training sample is empty")
    require(sample.exists(_._1 > 0.5) && sample.exists(_._1 < 0.5),
      "quality-classifier training sample needs both classes")

    val d = featNames.length + 1
    val w = new Array[Double](d)
    var it = 0
    while (it < iters) {
      // ridge-IRLS normal equations: (X'WX + λI) Δ = X'(y − p) − λw
      val a = Array.ofDim[Double](d, d + 1)
      sample.foreach { case (y, x) =>
        var z = 0.0
        var i = 0
        while (i < d) { z += w(i) * x(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val wt = math.max(p * (1.0 - p), 1e-6)
        i = 0
        while (i < d) {
          var j = 0
          while (j < d) { a(i)(j) += wt * x(i) * x(j); j += 1 }
          a(i)(d) += (y - p) * x(i)
          i += 1
        }
      }
      var i = 0
      while (i < d) {
        a(i)(i) += lambda
        a(i)(d) -= lambda * w(i)
        i += 1
      }
      // gaussian elimination, partial pivoting
      var c = 0
      while (c < d) {
        var piv = c
        var r = c + 1
        while (r < d) {
          if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
          r += 1
        }
        val t = a(c); a(c) = a(piv); a(piv) = t
        require(math.abs(a(c)(c)) > 1e-12, "singular IRLS system")
        r = c + 1
        while (r < d) {
          val f = a(r)(c) / a(c)(c)
          var j = c
          while (j <= d) { a(r)(j) -= f * a(c)(j); j += 1 }
          r += 1
        }
        c += 1
      }
      val delta = new Array[Double](d)
      c = d - 1
      while (c >= 0) {
        var s = a(c)(d)
        var j = c + 1
        while (j < d) { s -= a(c)(j) * delta(j); j += 1 }
        delta(c) = s / a(c)(c)
        c -= 1
      }
      i = 0
      while (i < d) { w(i) += delta(i); i += 1 }
      it += 1
    }
    Model(w)
  }

  /** SCORE: (doc_id, features, logit, kept) — a pure projection; the
    * logit is the left-associative literal-weight dot product rounded
    * 1e-6 (no transcendental in the output — p > 0.5 ⇔ logit > 0). */
  def score(docs: DataFrame, model: Model): DataFrame =
    withScore(docs, model, col("text"))
      .select(col("doc_id"), col("f_len"), col("f_punct"), col("f_stop"),
        col("f_wlen"), col("logit"), col("kept"))

  /** [[score]] as a COLUMN-APPEND over `docs` (same empty-text filter,
    * same rounded-feature and logit arithmetic): callers that need the
    * score NEXT TO their own columns append it here instead of joining
    * [[score]]'s projection back by doc_id — that join duplicated the
    * caller's whole upstream subtree into both join inputs
    * (OPTIMIZATION r14: corpus_pipeline re-ran its trim stage twice and
    * paid an extra doc_id exchange for the join; at 100 TB the join
    * would shuffle the corpus once more for columns already in hand). */
  def withScore(docs: DataFrame, model: Model, textCol: Column): DataFrame = {
    val Array(b, wl, wp, ws, ww) = model.weights
    val z = lit(b) + lit(wl) * col("f_len") + lit(wp) * col("f_punct") +
      lit(ws) * col("f_stop") + lit(ww) * col("f_wlen")
    featureCols(textCol)
      .foldLeft(docs.filter(textCol.isNotNull && length(textCol) > 0)) {
        case (df, (n, c)) => df.withColumn(n, c)
      }
      .withColumn("logit", graft.Qutil.rnd(z, 6))
      .withColumn("kept", z > lit(0.0))
  }

  /** CTE chain of the score twin, composable into a larger WITH list:
    * reads (doc_id, text) from `src`, prefixes CTE names with `p`, ends
    * in CTE `<p>qlr` with schema (doc_id, f_len, f_punct, f_stop,
    * f_wlen, logit, kept). */
  def duckdbCtes(model: Model, src: String = "documents",
      p: String = ""): String = {
    val Array(b, wl, wp, ws, ww) = model.weights
    s"""${p}qf AS (SELECT doc_id,
       |  floor(least(1.0, len(string_split_regex(trim(text),'\\s+'))/100.0)*1e6 + 0.5)/1e6 AS f_len,
       |  floor((length(regexp_replace(text,'[a-z0-9\\s]','','g'))*1.0/length(text))*1e6 + 0.5)/1e6 AS f_punct,
       |  floor((len(regexp_extract_all(text,'\\b(the|a|of|and|in|to|is)\\b'))*1.0
       |    / len(string_split_regex(trim(text),'\\s+')))*1e6 + 0.5)/1e6 AS f_stop,
       |  floor((length(text)*1.0/len(string_split_regex(trim(text),'\\s+')))*1e6 + 0.5)/1e6 AS f_wlen
       | FROM $src WHERE text IS NOT NULL AND length(text) > 0),
       | ${p}qz AS (SELECT doc_id, f_len, f_punct, f_stop, f_wlen,
       |   ($b) + ($wl)*f_len + ($wp)*f_punct + ($ws)*f_stop + ($ww)*f_wlen AS z
       |  FROM ${p}qf),
       | ${p}qlr AS (SELECT doc_id, f_len, f_punct, f_stop, f_wlen,
       | floor(z*1e6 + 0.5)/1e6 AS logit, (z > 0.0) AS kept
       |FROM ${p}qz)""".stripMargin
  }

  /** DuckDB twin from literal weights — identical feature expressions
    * and the same left-associative logit arithmetic. */
  def duckdbSql(model: Model): String =
    s"""WITH ${duckdbCtes(model)}
       |SELECT doc_id, f_len, f_punct, f_stop, f_wlen, logit, kept
       |FROM qlr""".stripMargin
}
