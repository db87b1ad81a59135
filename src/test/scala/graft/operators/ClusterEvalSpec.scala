package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusterEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  def emb: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  /** A fake model whose `assigned` is exactly the given (id, cell) rows —
    * eval only reads assignments, never the centroids. */
  private def fakeModel(rows: Seq[(Long, Int)]): IvfFlat.Model =
    IvfFlat.Model(Array.empty[(Int, Array[Float])],
      rows.toDF("id", "cell").withColumn("vec", lit(null)))

  test("perfect agreement: purity 1, NMI 1") {
    val assigned = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1), (4L, 2), (5L, 2))
    val labels = Seq((0L, 10L), (1L, 10L), (2L, 20L), (3L, 20L),
      (4L, 30L), (5L, 30L)).toDF("vec_id", "label")
    val r = ClusterEval.eval(fakeModel(assigned), labels).collect().head
    assert(r.getAs[Long]("n_points") == 6)
    assert(r.getAs[Long]("n_cells") == 3 && r.getAs[Long]("n_labels") == 3)
    assert(r.getAs[Double]("purity") == 1.0)
    assert(math.abs(r.getAs[Double]("nmi") - 1.0) < 1e-9)
  }

  test("single cell: purity = majority fraction, NMI null (zero entropy)") {
    val assigned = Seq((0L, 0), (1L, 0), (2L, 0), (3L, 0))
    val labels = Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("vec_id", "label")
    val r = ClusterEval.eval(fakeModel(assigned), labels).collect().head
    assert(r.getAs[Double]("purity") == 0.75)
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }

  test("hand-computed 2x2 contingency: purity and NMI match the formula") {
    // cells {0:(a,a,b), 1:(b,b,a)} — purity = 4/6; symmetric MI
    val assigned = Seq((0L, 0), (1L, 0), (2L, 0), (3L, 1), (4L, 1), (5L, 1))
    val labels = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 2L), (4L, 2L),
      (5L, 1L)).toDF("vec_id", "label")
    val r = ClusterEval.eval(fakeModel(assigned), labels).collect().head
    assert(math.abs(r.getAs[Double]("purity") - 4.0 / 6) < 1e-6)
    val n = 6.0
    val mi = Seq((2.0, 3.0, 3.0), (1.0, 3.0, 3.0), (1.0, 3.0, 3.0),
      (2.0, 3.0, 3.0)).map { case (c, a, b) =>
      (c / n) * math.log(c * n / (a * b))
    }.sum
    val h = -2 * (0.5 * math.log(0.5)) // both partitions are 3/3
    val want = mi / math.sqrt(h * h)
    assert(math.abs(r.getAs[Double]("nmi") - want) < 1e-6)
  }

  test("battery shape: fitted quantizer vs labels on real embeddings " +
      "yields sane bounded metrics") {
    val model = IvfFlat.fit(emb, numCells = 4)
    val r = ClusterEval.eval(model, emb.select("vec_id", "label"))
      .collect().head
    assert(r.getAs[Long]("n_points") == emb.count())
    val purity = r.getAs[Double]("purity")
    val nmi = r.getAs[Double]("nmi")
    assert(purity > 0.0 && purity <= 1.0)
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
  }

  test("metrics are invariant to input partitioning") {
    val model = IvfFlat.fit(emb, numCells = 4)
    val a = ClusterEval.eval(model, emb.select("vec_id", "label"))
      .collect().head.toSeq
    val b = ClusterEval.eval(model,
      emb.select("vec_id", "label").repartition(7)).collect().head.toSeq
    assert(a == b)
  }
}
