package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-content extraction from HTML (round-10 verdict item 7):
  * tables, code blocks, and lists as TYPED rows beside
  * [[MainContent]]'s text blocks — modern corpora keep markdown-ified
  * structure instead of flattening it into prose.
  *
  *  - `<table>` → GitHub-style markdown (`| a | b |` rows; a
  *    `|---|...` separator after the first row when it has `<th>`
  *    cells), cell text tag-stripped and whitespace-collapsed
  *    ([[MainContent.blockText]]'s normalization).
  *  - `<pre>` → a fenced code block; inner tags (`<code>`) strip to
  *    EMPTY and whitespace is PRESERVED — code is the one place the
  *    collapse rule would destroy meaning.
  *  - `<ul>`/`<ol>` → `- item` / `1. item` lines.
  *
  * Same engineering envelope as [[MainContent]]: pure codegen'd
  * Column algebra (every regex construct means the same thing in Java
  * regex and RE2 — lazy quantifiers, explicit classes, no
  * lookaround), script/style/comment bodies dropped first, entities
  * left undecoded, NON-NESTED structures only (the first closing tag
  * wins — the documented jusText-class simplification; nested tables
  * inside tables are out of scope, as in the block classifier).
  * One narrow per-row pass, zero shuffles at any corpus size.
  */
object HtmlStructure {

  private def collapse(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(c, "(?s)<[^>]*>", " "), "[ \\t\\n\\r]+", " "))

  private def preClean(html: Column): Column = {
    val noScript = regexp_replace(coalesce(html, lit("")),
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Markdown for one `<table>` inner-HTML string. */
  def tableMarkdown(t: Column): Column = {
    val rows = regexp_extract_all(t, lit("(?is)<tr[^>]*>(.*?)</tr>"), lit(1))
    val mdRows = transform(rows, r =>
      concat(lit("| "),
        array_join(transform(
          regexp_extract_all(r, lit("(?is)<t[dh][^>]*>(.*?)</t[dh]>"), lit(1)),
          c => collapse(c)), " | "),
        lit(" |")))
    val firstCells = regexp_extract_all(element_at(rows, 1),
      lit("(?is)<t[dh][^>]*>(.*?)</t[dh]>"), lit(1))
    val sep = concat(lit("|"),
      array_join(transform(firstCells, _ => lit("---")), "|"), lit("|"))
    val hasHeader = element_at(rows, 1).rlike("(?is)<th")
    when(size(rows) === 0, lit(""))
      .when(hasHeader,
        concat(element_at(mdRows, 1), lit("\n"), sep,
          when(size(mdRows) > 1,
            concat(lit("\n"),
              array_join(slice(mdRows, lit(2), size(mdRows) - 1), "\n")))
            .otherwise(lit(""))))
      .otherwise(array_join(mdRows, "\n"))
  }

  /** Fenced code block for one `<pre>` inner-HTML string. */
  def codeMarkdown(c: Column): Column = {
    val inner = regexp_replace(
      regexp_replace(
        regexp_replace(c, "(?s)<[^>]*>", ""),
        "^[ \\t\\n\\r]+", ""),
      "[ \\t\\n\\r]+$", "")
    concat(lit("```\n"), inner, lit("\n```"))
  }

  /** `- item` lines for one `<ul>` inner-HTML string. */
  def ulMarkdown(l: Column): Column =
    array_join(transform(
      regexp_extract_all(l, lit("(?is)<li[^>]*>(.*?)</li>"), lit(1)),
      item => concat(lit("- "), collapse(item))), "\n")

  /** `1. item` lines for one `<ol>` inner-HTML string. */
  def olMarkdown(l: Column): Column =
    array_join(transform(
      regexp_extract_all(l, lit("(?is)<li[^>]*>(.*?)</li>"), lit(1)),
      (item, i) => concat((i + 1).cast("string"), lit(". "), collapse(item))),
      "\n")

  /** One row per extracted structure:
    * (idCols..., kind ∈ {table, code, ul, ol}, struct_idx, markdown) —
    * struct_idx is the 0-based occurrence order within the doc for
    * that kind (regex extraction order = document order).
    */
  def structures(
      df: DataFrame, idCols: Seq[Column], htmlCol: Column): DataFrame = {
    val cleaned = preClean(htmlCol)
    def one(kind: String, pattern: String, md: Column => Column): DataFrame =
      df.select((idCols :+ transform(
          regexp_extract_all(cleaned, lit(pattern), lit(1)), md).as("_mds")): _*)
        .select((idCols :+ lit(kind).as("kind")
          :+ posexplode(col("_mds")).as(Seq("struct_idx", "markdown"))): _*)
        .select((idCols :+ col("kind")
          :+ col("struct_idx").cast("long").as("struct_idx")
          :+ col("markdown")): _*)
    one("table", "(?is)<table[^>]*>(.*?)</table>", tableMarkdown)
      .unionByName(one("code", "(?is)<pre[^>]*>(.*?)</pre>", codeMarkdown))
      .unionByName(one("ul", "(?is)<ul[^>]*>(.*?)</ul>", ulMarkdown))
      .unionByName(one("ol", "(?is)<ol[^>]*>(.*?)</ol>", olMarkdown))
  }
}
