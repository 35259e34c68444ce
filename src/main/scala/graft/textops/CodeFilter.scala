package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-document detection and source-file quality filtering — the
  * published rule family used to curate code training corpora (The
  * Stack / StarCoder data pipeline: average/maximum line length
  * bounds, alphanumeric-fraction floor, auto-generated-file
  * exclusion), plus a structural is-this-code heuristic (brace/
  * semicolon line endings, indentation discipline, keyword lexicon)
  * so the filters can be applied selectively on mixed prose+code
  * crawls.
  *
  * Everything is a single narrow projection over codegen'd string
  * expressions — no UDFs, no shuffle; ratios are integral x10000
  * (x100 for the length average) so the DuckDB oracle matches
  * exactly. At 100 TB this is a map-only pass that chains onto any
  * scan; the only wide op a caller might add downstream is their own
  * aggregation.
  *
  * No reference analogue (the reference is a web-access-log triage
  * tool); built for the beyond-reference training-data surface.
  */
object CodeFilter {

  /** Fixed keyword lexicon — membership count feeds the is_code
    * verdict. Kept tiny and ASCII so `contains` stays codegen'd;
    * the oracle embeds the same list verbatim.
    */
  val kwLexicon: Seq[String] = Seq(
    "#include", "int ", "def ", "return", "import ",
    "for (", "void ", "class ", "function")

  /** Phrases (lowercased) whose presence in the first 200 chars marks
    * a generated file (The Stack's exclusion rule).
    */
  val autogenMarkers: Seq[String] = Seq("auto-generated", "do not edit")

  /** Per-document line statistics + verdicts.
    *
    * Output: id, n_lines, max_line_len, avg_len_x100, alnum_x10000,
    * indent_x10000, punctl_x10000, kw_hits, autogen, is_code,
    * stack_pass.
    *
    * - avg_len_x100: floor(100 * body chars / lines) where body
    *   chars excludes the newline separators themselves.
    * - alnum_x10000: [A-Za-z0-9] fraction of ALL chars (newlines
    *   included — the published rule is file-level).
    * - indent_x10000: fraction of lines starting with space/tab.
    * - punctl_x10000: fraction of lines whose right-trimmed form
    *   ends in `;`, `{` or `}`.
    * - is_code: structural shape (≥25% punct-terminated lines OR
    *   ≥40% indented lines) AND ≥2 lexicon keywords.
    * - stack_pass: The Stack file rules — avg line ≤ 100 chars, max
    *   line ≤ 1000 chars, alnum fraction ≥ 0.25, not auto-generated.
    */
  def lineStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val lines = split(t, "\n", -1)
    val nLines = size(lines)
    val bodyChars = length(t) - (nLines - lit(1))
    val maxLine = array_max(transform(lines, x => length(x)))
    val nIndent = size(filter(lines,
      x => substring(x, 1, 1) === " " || substring(x, 1, 1) === "\t"))
    val nPunct = size(filter(lines, { x =>
      val r = rtrim(x)
      r.endsWith(";") || r.endsWith("{") || r.endsWith("}")
    }))
    val kwHits = kwLexicon
      .map(k => when(t.contains(k), 1L).otherwise(0L))
      .reduce(_ + _)
    val head = lower(substring(t, 1, 200))
    val autogen = autogenMarkers
      .map(m => head.contains(m))
      .reduce(_ || _)
    val alnumChars = length(regexp_replace(t, "[^A-Za-z0-9]", ""))

    // ratios via integral DIV on long counts (never double division —
    // a double quotient that lands epsilon under an exact integer
    // floors one off the oracle's exact `//`)
    docs.select(
        col(idCol),
        nLines.cast("long").as("n_lines"),
        maxLine.cast("long").as("max_line_len"),
        bodyChars.cast("long").as("_cf_body"),
        length(t).cast("long").as("_cf_len"),
        alnumChars.cast("long").as("_cf_alnum"),
        nIndent.cast("long").as("_cf_indent"),
        nPunct.cast("long").as("_cf_punct"),
        kwHits.as("kw_hits"),
        autogen.as("autogen"))
      .withColumn("avg_len_x100",
        expr("CAST(100 * _cf_body DIV n_lines AS BIGINT)"))
      .withColumn("alnum_x10000", expr(
        "CAST(CASE WHEN _cf_len = 0 THEN 0 " +
          "ELSE 10000 * _cf_alnum DIV _cf_len END AS BIGINT)"))
      .withColumn("indent_x10000",
        expr("CAST(10000 * _cf_indent DIV n_lines AS BIGINT)"))
      .withColumn("punctl_x10000",
        expr("CAST(10000 * _cf_punct DIV n_lines AS BIGINT)"))
      .drop("_cf_body", "_cf_len", "_cf_alnum", "_cf_indent", "_cf_punct")
      .select(col(idCol), col("n_lines"), col("max_line_len"),
        col("avg_len_x100"), col("alnum_x10000"), col("indent_x10000"),
        col("punctl_x10000"), col("kw_hits"), col("autogen"))
      .withColumn("is_code",
        (col("punctl_x10000") >= 2500 || col("indent_x10000") >= 4000) &&
          col("kw_hits") >= 2)
      .withColumn("stack_pass",
        col("avg_len_x100") <= 10000 && col("max_line_len") <= 1000 &&
          col("alnum_x10000") >= 2500 && !col("autogen"))
  }
}
