package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val page =
    """<html><head><title>t</title>
      |<style>body { margin: 0; }</style>
      |<script>var x = 1 < 2; // <p>not a block</p></script>
      |</head><body>
      |<!-- nav chrome -->
      |<nav><a href="/">home</a> <a href="/about">about</a> <a href="/tags">tags</a></nav>
      |<h1>short heading</h1>
      |<p>This is the first real paragraph of body prose, long enough to
      |pass the content threshold, with a single <a href="/ref">reference
      |link</a> inside it and some &amp; escaped &lt;entities&gt; too.</p>
      |<p>The second paragraph is also body prose and comfortably longer
      |than the minimum character threshold for content blocks.</p>
      |<footer><a href="/privacy">privacy policy</a> <a href="/terms">terms of use</a> (c)</footer>
      |</body></html>""".stripMargin

  test("boilerplate is cut, prose is kept: nav/footer fail the " +
      "link-density rule, paragraphs pass, script/style/comments vanish") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val b = HtmlExtract.blocks(df, col("html")).filter(col("n_chars") > 0)
      .orderBy("block_ix").collect()
    val byText = b.map(r => r.getAs[String]("text") -> r).toMap
    // nav: three links, all text is link text → density ~1, cut
    val nav = byText.keys.find(_.contains("home about")).get
    assert(!byText(nav).getAs[Boolean]("is_content"))
    assert(byText(nav).getAs[Double]("link_density") > 0.8)
    // heading: short → cut
    assert(!byText("short heading").getAs[Boolean]("is_content"))
    // paragraphs: long, low density → kept; entities decoded
    val p1 = byText.keys.find(_.contains("first real paragraph")).get
    assert(byText(p1).getAs[Boolean]("is_content"))
    assert(p1.contains("& escaped <entities>"))
    assert(byText(p1).getAs[Double]("link_density") < 0.35)
    // nothing from script/style/comments leaked into any block
    assert(!b.exists(r => r.getAs[String]("text").contains("margin") ||
      r.getAs[String]("text").contains("var x") ||
      r.getAs[String]("text").contains("nav chrome")))

    val ex = HtmlExtract.extract(df, col("html")).collect().head
    assert(ex.getAs[Long]("n_content") == 2L)
    val txt = ex.getAs[String]("text")
    assert(txt.contains("first real paragraph") &&
      txt.contains("second paragraph"))
    assert(!txt.contains("privacy policy") && !txt.contains("home"))
    // block order preserved in the joined text
    assert(txt.indexOf("first") < txt.indexOf("second"))
  }

  test("malformed input is data, not an error: unclosed tags, stray <, " +
      "null html, all-boilerplate docs") {
    val df = Seq(
      (1L, "<p>an unclosed paragraph of sufficient length to count as content here"),
      (2L, "stray < bracket survives as text in a long enough sentence to be content"),
      (3L, null.asInstanceOf[String]),
      (4L, "<nav><a href='/'>x</a></nav>")
    ).toDF("doc_id", "html")
    val ex = HtmlExtract.extract(df, col("html")).orderBy("doc_id").collect()
    assert(ex.length == 4, "no document may be dropped")
    assert(ex(0).getAs[String]("text").contains("unclosed paragraph"))
    // '< bracket survives' — the stray < never closes, so the tag-strip
    // regex can't match it and the text survives verbatim
    assert(ex(1).getAs[String]("text").contains("<"))
    assert(ex(2).getAs[Long]("n_blocks") == 0L)
    assert(ex(2).getAs[String]("text") == "")
    assert(ex(3).getAs[Long]("n_content") == 0L)
  }

  test("the typed kernel is bit-identical to the Column pipeline on " +
      "chrome-wrapped corpus text and on the malformed fixtures") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 120)
    val wrapped = docs.select(col("doc_id"),
      concat(lit("<html><head><script>var x=1<2;</script></head><body>" +
          "<nav><a href='/'>home</a> <a href='/a'>about</a></nav><p>"),
        col("text"),
        lit(" &amp; more</p><h1>h</h1><footer><a href='/p'>privacy " +
          "policy</a> <a href='/t'>terms</a> (c)</footer></body></html>"))
        .as("html"))
      .unionByName(Seq(
        (90001L, "<p>an unclosed paragraph of sufficient length to count here"),
        (90002L, "stray < bracket survives as text in a long enough sentence x"),
        (90003L, null.asInstanceOf[String]),
        (90004L, "<nav><a href='/'>x</a></nav>"),
        // control chars that are NOT \s (so they survive the whitespace
        // collapse) sitting at block edges: Spark's trim strips only
        // ' ', and the kernel must match (not Java String.trim, which
        // strips everything <= U+0020)
        (90005L, "<p>\u0001a control-char-edged block long enough to " +
          "count as content here\u0002</p><p> \u0003 another one with " +
          "inner \u0004 bytes and sufficient length to pass \u0005 </p>")
      ).toDF("doc_id", "html"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_blocks", "n_content", "content_chars", "text")
      .collect().map(_.toSeq).toSet
    assert(rows(HtmlExtract.extractKernel(wrapped, col("html"))) ==
      rows(HtmlExtract.extract(wrapped, col("html"))))
  }

  test("extraction feeds the text battery: extracted prose round-trips " +
      "through the corpus cleaning convention") {
    // wrap real corpus text in chrome; extraction must return exactly
    // the wrapped text (single space collapse, trim)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 50)
    val wrapped = docs.select(col("doc_id"), col("text"),
      concat(lit("<html><body><nav><a href='/'>home</a> <a href='/a'>about</a></nav><p>"),
        col("text"),
        lit("</p><footer><a href='/p'>privacy</a></footer></body></html>")).as("html"))
    val ex = HtmlExtract.extract(wrapped, col("html"))
      .select(col("doc_id"), col("text").as("extracted"))
    val mismatch = ex.join(docs, "doc_id")
      .filter(col("extracted") =!= trim(regexp_replace(col("text"), "\\s+", " ")))
      .count()
    assert(mismatch == 0)
  }
}
