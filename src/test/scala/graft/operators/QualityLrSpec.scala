package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityLrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

  lazy val model: QualityLr.Model =
    QualityLr.fit(docs, col("lang") === "en")

  test("score matches a driver-side recompute of the literal-weight " +
      "logit over the engine's own features") {
    val feats = QualityLr.features(docs).collect()
      .map(r => r.getLong(0) ->
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toMap
    val got = QualityLr.score(docs, model).collect()
      .map(r => r.getLong(0) -> (r.getDouble(5), r.getBoolean(6))).toMap
    assert(got.keySet == feats.keySet)
    val w = model.weights
    feats.foreach { case (id, f) =>
      val z = w(0) + w(1) * f(0) + w(2) * f(1) + w(3) * f(2) + w(4) * f(3)
      val logit = math.floor(z * 1e6 + 0.5) / 1e6
      assert(got(id) == ((logit, z > 0.0)), s"doc $id")
    }
  }

  test("separable fixture: long clean prose scores positive, short " +
      "symbol soup negative") {
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0)
        (i, ("the quick brown fox is a friend of the lazy dog and " * 5).trim,
          true)
      else (i, "@#$ %% !! ~~ ^^", false)
    }
    val df = rows.toDF("doc_id", "text", "good")
    val m = QualityLr.fit(df, col("good"), sampleN = 40)
    val scored = QualityLr.score(df, m).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    rows.foreach { case (id, _, good) =>
      assert(scored(id) == good, s"doc $id misclassified")
    }
  }

  test("fit is deterministic across input partitionings") {
    val m2 = QualityLr.fit(docs.repartition(7), col("lang") === "en")
    assert(m2.weights.sameElements(model.weights))
  }

  test("fit fails loudly without both classes in the sample") {
    intercept[IllegalArgumentException] {
      QualityLr.fit(docs, lit(true))
    }
    ()
  }

  test("battery corpus: finite weights, one verdict per doc (the corpus " +
      "text is label-free by construction — separation is the fixture " +
      "test's job; the oracle gates the trained pipeline)") {
    assert(model.weights.forall(w => !w.isNaN && !w.isInfinite))
    val scored = QualityLr.score(docs, model).collect()
    assert(scored.length ==
      docs.filter(col("text").isNotNull && length(col("text")) > 0).count())
    assert(scored.map(_.getLong(0)).distinct.length == scored.length)
    scored.foreach { r =>
      assert(!r.getDouble(5).isNaN, s"NaN logit at doc ${r.getLong(0)}")
    }
  }
}
