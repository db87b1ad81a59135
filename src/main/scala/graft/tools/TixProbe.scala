package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable dev probe: time TextIndex build/append/serve phases on
  * sf0.1 to locate where bm25_incremental's cold seconds go. */
object TixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIX $label%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val d1 = docs.filter(col("doc_id") < 250)
    val d2 = docs.filter(col("doc_id") >= 250)
    val p = "graft_probe_tix"
    t("drop")(graft.operators.TextIndex.drop(spark, p))
    t("build(250)")(graft.operators.TextIndex.build(d1, p, numBuckets = 8))
    t("append(rest)")(graft.operators.TextIndex.append(d2, p, numBuckets = 8))
    val queryTerms = t("queryTerms")(spark.table(s"${p}_postings")
      .filter(col("doc_id") < 20)
      .select(col("doc_id").as("qid"), col("term")))
    t("serve1")(graft.operators.TextIndex
      .bm25TopDocs(spark, p, queryTerms, topk = 10).count())
    t("serve2")(graft.operators.TextIndex
      .bm25TopDocs(spark, p, queryTerms, topk = 10).count())
    // phase split inside build: postingsFor alone
    t("postingsFor.noop")(graft.operators.TextIndex.postingsFor(docs)
      .write.format("noop").mode("overwrite").save())
    // fine-grained: each write step of a build, separately
    import org.apache.spark.sql.SaveMode
    spark.sql("DROP TABLE IF EXISTS probe_p")
    spark.sql("DROP TABLE IF EXISTS probe_l")
    spark.sql("DROP TABLE IF EXISTS probe_s")
    val post = graft.operators.TextIndex.postingsFor(d1)
    t("write postings bucketed")(post.write.mode(SaveMode.Overwrite)
      .bucketBy(8, "term").sortBy("term").format("parquet")
      .saveAsTable("probe_p"))
    t("lexicon agg+write")(spark.table("probe_p")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(8, "term").sortBy("term").format("parquet")
      .saveAsTable("probe_l"))
    t("docs.count")(d1.count())
    t("dld distinct")(spark.table("probe_p")
      .select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)), sum("dl")).first())
    import spark.implicits._
    t("stats write")(Seq((1L, 2L, 3L)).toDF("n", "ndl", "sumdl")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable("probe_s"))
    t("write postings 2nd")(post.write.mode(SaveMode.Overwrite)
      .bucketBy(8, "term").sortBy("term").format("parquet")
      .saveAsTable("probe_p"))
    t("drop-if-exists x4 (absent)") {
      (1 to 4).foreach(i => spark.sql(s"DROP TABLE IF EXISTS probe_none$i"))
    }
    t("fs exists+delete x4 (absent)") {
      (1 to 4).foreach { i =>
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), s"probe_none$i")
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
    }
    t("build(250) 2nd")(graft.operators.TextIndex.build(d1, "graft_probe2", numBuckets = 8))
    t("serve3 fresh prefix") {
      val qt = spark.table("graft_probe2_postings").filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), col("term"))
      graft.operators.TextIndex.bm25TopDocs(spark, "graft_probe2", qt, topk = 10).count()
    }
    spark.stop()
  }
}
