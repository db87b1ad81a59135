package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  val prefix = "graft_tix_spec"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private lazy val built: TextIndex.Stats =
    TextIndex.build(docs, prefix, numBuckets = 8)

  test("index-served BM25 is bit-identical to the from-scratch pipeline") {
    built
    val queryTerms = spark.table(s"${prefix}_postings")
      .filter(col("doc_id") < 20)
      .select(col("doc_id").as("qid"), col("term"))
    val indexed = TextIndex.bm25TopDocs(spark, prefix, queryTerms, topk = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val scratch = graft.TextQueries.bm25Ranked(spark, dir, nq = 20, topk = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(indexed == scratch,
      s"diff: ${(indexed diff scratch).take(3)} / ${(scratch diff indexed).take(3)}")
  }

  test("narrow query prunes buckets at the scan") {
    built
    import spark.implicits._
    val term = spark.table(s"${prefix}_postings")
      .select("term").first().getString(0)
    val one = Seq((0L, term)).toDF("qid", "term")
    val plan = TextIndex.bm25TopDocs(spark, prefix, one, topk = 10)
      .queryExecution.executedPlan.toString
    val ms = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toList
    assert(ms.nonEmpty,
      s"expected bucket pruning on the posting scan:\n$plan")
    assert(ms.exists(g => g.group(1).toInt < g.group(2).toInt),
      s"single-term probe should select a strict bucket subset:\n$plan")
  }

  test("bit-identity holds at sf0.01 (the driver gate scale)") {
    val dir01 = "/root/testdata/sf0.01"
    val p01 = "graft_tix_spec01"
    TextIndex.build(spark.read.parquet(s"$dir01/documents.parquet"), p01,
      numBuckets = 8)
    val queryTerms = spark.table(s"${p01}_postings")
      .filter(col("doc_id") < 20)
      .select(col("doc_id").as("qid"), col("term"))
    val indexed = TextIndex.bm25TopDocs(spark, p01, queryTerms, topk = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val scratch = graft.TextQueries.bm25Ranked(spark, dir01, nq = 20, topk = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    TextIndex.drop(spark, p01)
    assert(indexed == scratch,
      s"diff: ${(indexed diff scratch).take(3)} / ${(scratch diff indexed).take(3)}")
  }

  test("drop removes the persisted tables (store CRUD contract)") {
    TextIndex.drop(spark, prefix)
    assert(!spark.catalog.tableExists(s"${prefix}_postings"))
    assert(!spark.catalog.tableExists(s"${prefix}_stats"))
  }
}
