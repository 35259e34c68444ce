package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Main-content extraction from HTML by block segmentation +
  * link/text-density classification — the jusText/boilerpipe-style
  * stage every crawl pipeline runs BEFORE quality signals (nav bars,
  * sidebars, and footers otherwise poison stopword ratios, dedup
  * shingles, and LM scores). Kohlschütter et al. (WSDM 2010) and
  * Pomikálek's jusText established the two load-bearing signals:
  * boilerplate blocks are SHORT and LINK-DENSE; body text is neither.
  *
  * Pipeline (pure codegen'd Column algebra — the [[TextAnalysis]]
  * regex discipline: every construct means the same thing in Java
  * regex and RE2, no lookaround):
  *
  *  1. drop `<script>`/`<style>` bodies and comments
  *     ([[TextAnalysis.stripMarkup]]'s steps),
  *  2. replace every BLOCK-LEVEL tag (open or close) with a U+0001
  *     boundary and split — inline tags (`<a>`, `<b>`, spans) stay
  *     inside their block,
  *  3. per block: link chars = total cleaned length of `<a>...</a>`
  *     inner HTML; block text = tags stripped to spaces, whitespace
  *     collapsed, trimmed; empty blocks drop,
  *  4. classify: `keep = n_words >= minWords AND link_density <=
  *     maxLinkDensityX10000/10000` — the documented simplification of
  *     jusText's multi-class scheme (no short/near-good propagation;
  *     entities stay undecoded in block metrics).
  *
  * All thresholds integer (`link_density_x10000 = link_chars * 10000
  * DIV max(chars, 1)`), so the DuckDB oracle recomputes every block
  * stat and the keep verdict from scratch. 100 TB shape: one narrow
  * per-row pass, no shuffle ([[blocks]]' explode is narrow; a
  * boundary count bounds output size).
  */
object MainContent {

  /** Block-level tags, longest-prefix-first so `p` cannot shadow
    * `pre` ([^>]*-free tail: after the name only whitespace-led
    * attributes, an optional self-close slash, then `>` — `<param>`
    * must NOT read as a `p` block).
    */
  val blockTagPattern: String =
    "(?i)</?(blockquote|thead|tbody|table|section|article|footer|header|" +
      "aside|main|nav|pre|ul|ol|li|tr|td|th|div|h[1-6]|hr|br|p)" +
      "([ \\t\\n\\r\\f][^>]*)?/?>" // explicit class: \s itself differs Java-vs-RE2

  private val linkPattern = "(?is)<a[^>]*>(.*?)</a>"

  /** Strip remaining (inline) tags to spaces, collapse whitespace,
    * trim — the per-block text normalization, shared with the link
    * spans so link chars and block chars count identically.
    */
  def blockText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(c, "(?s)<[^>]*>", " "), "[ \\t\\n\\r]+", " "))

  /** Non-empty blocks of `html`, in document order:
    * `array<struct<text, n_chars, n_words, n_link_chars>>`.
    */
  def blockArray(html: Column): Column = {
    val noScript = regexp_replace(coalesce(html, lit("")),
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val marked = regexp_replace(noComment, blockTagPattern, "\u0001")
    filter(
      transform(split(marked, "\u0001"), raw => {
        val text = blockText(raw)
        val linkChars = aggregate(
          transform(regexp_extract_all(raw, lit(linkPattern), lit(1)),
            x => length(blockText(x))),
          lit(0), (a, x) => a + x)
        struct(
          text.as("text"),
          length(text).as("n_chars"),
          when(length(text) === 0, 0)
            .otherwise(size(split(text, " "))).as("n_words"),
          linkChars.as("n_link_chars"))
      }),
      b => b.getField("n_chars") > 0)
  }

  /** Per-block classification table: idCols ++ (block_idx, text,
    * n_chars, n_words, n_link_chars, link_density_x10000, keep).
    */
  def blocks(
      df: DataFrame, idCols: Seq[Column], htmlCol: Column,
      minWords: Int = 6, maxLinkDensityX10000: Int = 3300): DataFrame =
    df.select((idCols :+ blockArray(htmlCol).as("_blocks")): _*)
      .select((idCols :+ posexplode(col("_blocks")).as(Seq("block_idx", "_b"))): _*)
      .select((idCols
        :+ col("block_idx").cast("long").as("block_idx")
        :+ col("_b.text").as("text")
        :+ col("_b.n_chars").cast("long").as("n_chars")
        :+ col("_b.n_words").cast("long").as("n_words")
        :+ col("_b.n_link_chars").cast("long").as("n_link_chars")
        :+ (col("_b.n_link_chars").cast("long") * 10000 /
            greatest(col("_b.n_chars").cast("long"), lit(1L)))
          .cast("long").as("link_density_x10000")
        :+ (col("_b.n_words") >= minWords &&
            col("_b.n_link_chars").cast("long") * 10000 <=
              lit(maxLinkDensityX10000.toLong) *
                greatest(col("_b.n_chars").cast("long"), lit(1L)))
          .as("keep")): _*)

  /** The extraction itself: kept blocks joined with single spaces —
    * what a pipeline feeds to [[TextAnalysis.cleanText]] and the
    * quality/dedup stages. Array-local (no explode, no shuffle).
    */
  def mainContent(
      html: Column, minWords: Int = 6,
      maxLinkDensityX10000: Int = 3300): Column =
    array_join(
      transform(
        filter(blockArray(html), b =>
          b.getField("n_words") >= minWords &&
            b.getField("n_link_chars").cast("long") * 10000 <=
              lit(maxLinkDensityX10000.toLong) *
                greatest(b.getField("n_chars").cast("long"), lit(1L))),
        b => b.getField("text")),
      " ")
}
