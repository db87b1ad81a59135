package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction with link-density boilerplate removal — the
  * raw-crawl FRONT DOOR of the pipeline: every text operator in the
  * engine starts at a clean `text` column, and a real 100 TB corpus
  * starts at crawl HTML. Deterministic, regex-only (the published
  * jusText/trafilatura block heuristic reduced to its portable core),
  * so the whole extraction is expressible in ANSI SQL and the battery
  * hash-matches DuckDB end to end — no DOM parser, no library.
  *
  * Pipeline:
  *
  *  1. whole-document pre-clean: drop `<script>`/`<style>` elements and
  *     HTML comments (they span blocks, so they go first);
  *  2. segment into BLOCKS on block-level tags (`p div h1-6 li table
  *     tr td section article header footer nav blockquote pre br` …) —
  *     the tag itself is the separator, inline markup stays inside;
  *  3. per block, derive the visible text (strip tags → decode the
  *     six ubiquitous entities → collapse whitespace → trim) and the
  *     LINK text (the same cleaning over the concatenated `<a>`
  *     bodies);
  *  4. classify: a block is content iff it has ≥ `minChars` visible
  *     chars AND link_density ≤ `maxLinkDensity` (the jusText core
  *     rule: navigation/footer chrome is short and link-saturated,
  *     body prose is long and link-sparse).
  *
  * Scale shape: pre-clean and segmentation are per-row projections;
  * the per-block metrics run AFTER the explode, where each regex is a
  * plain codegen'd projection over a string column (never inside an
  * interpreted array lambda — the 788× DCT lesson, BASELINE r12).
  * Zero shuffles until a caller aggregates.
  *
  * Malformed input is data, not an error (the codec stance): unclosed
  * tags strip as written, a stray `<` that never closes survives as
  * text, null HTML yields zero blocks — nothing throws.
  */
object HtmlExtract {

  /** Block-level separator tags (opening, closing or self-closing). */
  private val BlockSep =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th|section" +
      "|article|header|footer|nav|blockquote|pre|br)[^>]*>"

  /** Whole-document pre-clean: script/style elements and comments out
    * (dotall + case-insensitive; lazy bodies so sibling elements
    * survive; two patterns because RE2 oracles have no backrefs). */
  def preClean(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Visible text of an HTML fragment: strip tags (→ space, so words
    * split by markup never fuse), decode the six ubiquitous entities
    * (after tag-strip, so `&lt;b&gt;` can never become markup; `&amp;`
    * decodes LAST, the standard unescape order — amp-first would
    * double-decode escaped entities like `&amp;lt;`), collapse
    * whitespace, trim. */
  def visibleText(fragment: Column): Column = {
    val noTags = regexp_replace(fragment, "<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<",
        "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-block rows: (idCol, block_ix, text, n_chars, link_chars,
    * link_density, is_content). `block_ix` numbers the RAW segmentation
    * (empty segments included), so relative order is stable for
    * re-assembly; callers filter `n_chars > 0`. */
  def blocks(df: DataFrame, htmlCol: Column, idCol: String = "doc_id",
      minChars: Int = 25, maxLinkDensity: Double = 0.35): DataFrame = {
    // null html coalesces to '' (one empty block), so a document is
    // never silently dropped by the explode
    val segs = df.select(col(idCol),
      split(preClean(coalesce(htmlCol, lit(""))), BlockSep).as("segs"))
    val b = segs.select(col(idCol),
      posexplode(col("segs")).as(Seq("block_ix", "block")))
    val anchors = array_join(
      regexp_extract_all(col("block"), lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
      " ")
    b.select(col(idCol), col("block_ix"),
        visibleText(col("block")).as("text"),
        visibleText(anchors).as("link_text"))
      .select(col(idCol), col("block_ix"), col("text"),
        length(col("text")).as("n_chars"),
        length(col("link_text")).as("link_chars"))
      .withColumn("link_density",
        col("link_chars").cast("double") /
          greatest(col("n_chars"), lit(1)).cast("double"))
      .withColumn("is_content",
        col("n_chars") >= minChars && col("link_density") <= maxLinkDensity)
  }

  /** Per-document extracted text: content blocks joined with '\n' in
    * block order (plus block/content counts — the per-doc audit of the
    * boilerplate cut). Documents whose every block is boilerplate keep
    * a row with empty text: extraction FILTERS content, it must not
    * silently drop documents. */
  def extract(df: DataFrame, htmlCol: Column, idCol: String = "doc_id",
      minChars: Int = 25, maxLinkDensity: Double = 0.35): DataFrame =
    blocks(df, htmlCol, idCol, minChars, maxLinkDensity)
      .groupBy(idCol)
      .agg(
        sum(when(col("n_chars") > 0, 1L).otherwise(0L)).as("n_blocks"),
        sum(when(col("is_content"), 1L).otherwise(0L)).as("n_content"),
        sum(when(col("is_content"), col("n_chars")).otherwise(0L))
          .as("content_chars"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_content"), struct(col("block_ix"), col("text"))))),
            x => x.getField("text")),
          "\n").as("text"))

  // ---- the typed kernel twin ---------------------------------------
  // The Column pipeline above is the ORACLE form (DuckDB-expressible,
  // hash-gated). At crawl scale its cost is ~9 regex passes per block
  // through Catalyst's per-expression string churn; the kernel below
  // runs the IDENTICAL java.util.regex machinery once per document in
  // a mapPartitions with compiled patterns — the DCT-kernel precedent
  // (BASELINE r12: oracle stays relational, O(work) math goes typed).
  // Spec-pinned bit-identical to extract() on real corpus text.

  private lazy val pScript =
    java.util.regex.Pattern.compile("(?is)<script[^>]*>.*?</script>")
  private lazy val pStyle =
    java.util.regex.Pattern.compile("(?is)<style[^>]*>.*?</style>")
  private lazy val pComment =
    java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  private lazy val pBlockSep = java.util.regex.Pattern.compile(BlockSep)
  private lazy val pTag = java.util.regex.Pattern.compile("<[^>]*>")
  private lazy val pAnchor =
    java.util.regex.Pattern.compile("(?is)<a[^>]*>(.*?)</a>")
  private lazy val pWs = java.util.regex.Pattern.compile("\\s+")

  /** Space-only trim, matching Spark/DuckDB `trim()` which strip ' '
    * alone — Java's String.trim strips every char <= U+0020, so control
    * bytes (U+0000-U+0008, U+000E-U+001F) that survive the \s+ collapse
    * would diverge between kernel and Column form at a block's edge. */
  private def trimSpaces(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  private def cleanFragment(s: String): String = {
    var t = pTag.matcher(s).replaceAll(" ")
    // same entity set and order as visibleText (&amp; LAST); literal
    // (non-regex) patterns there, so String.replace is identical
    t = t.replace("&nbsp;", " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&")
    trimSpaces(pWs.matcher(t).replaceAll(" "))
  }

  /** Code-point count — Spark's `length()` (UTF8String.numChars) and
    * DuckDB's length() both count code points, so the kernel must too
    * or non-BMP text (emoji) diverges from the oracle form. */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** [[extract]]'s output computed by the typed kernel — one compiled
    * regex pass per stage per document instead of a Catalyst expression
    * chain per block. Identical semantics (same JDK regex engine, same
    * pipeline order); use for the hot crawl path, keep [[extract]] for
    * oracle-gated queries. */
  def extractKernel(df: DataFrame, htmlCol: Column,
      idCol: String = "doc_id", minChars: Int = 25,
      maxLinkDensity: Double = 0.35): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), htmlCol.cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, html0) =>
          val html = if (html0 == null) "" else html0
          var h = pScript.matcher(html).replaceAll(" ")
          h = pStyle.matcher(h).replaceAll(" ")
          h = pComment.matcher(h).replaceAll(" ")
          val segs = pBlockSep.split(h, -1)
          var nBlocks = 0L
          var nContent = 0L
          var contentChars = 0L
          val sb = new StringBuilder
          var i = 0
          while (i < segs.length) {
            val block = segs(i)
            val txt = cleanFragment(block)
            if (txt.nonEmpty) {
              nBlocks += 1
              val m = pAnchor.matcher(block)
              val ab = new StringBuilder
              var first = true
              while (m.find()) {
                if (!first) ab.append(' ')
                ab.append(m.group(1)); first = false
              }
              val ltxt = cleanFragment(ab.result())
              val nCp = cpLen(txt)
              val density = cpLen(ltxt).toDouble / math.max(nCp, 1)
              if (nCp >= minChars && density <= maxLinkDensity) {
                nContent += 1
                contentChars += nCp
                if (sb.nonEmpty) sb.append('\n')
                sb.append(txt)
              }
            }
            i += 1
          }
          (id, nBlocks, nContent, contentChars, sb.result())
        }
      }
      .toDF(idCol, "n_blocks", "n_content", "content_chars", "text")
  }
}
