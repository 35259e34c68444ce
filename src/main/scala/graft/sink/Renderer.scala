package graft.sink

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K1/K2 — terminal pretty-table and CSV sinks (reference
  * dataframe.py:391-600). Driver-side rendering over a bounded
  * `collect()` — display is not an engine operator; the engine-side sort
  * (O1) happens before collection. Column behavior reproduced:
  *  - display config with per-column truncation widths and flags
  *    (dataframe.py:29-47)
  *  - terminal mode drops all-empty/0/'-'/NaN columns
  *    (dataframe.py:411-437); `cluster` and `risk_score` always kept
  *    (cluster only when clustering display is enabled)
  *  - values truncate to width with ".." (tail-truncate for user_agent)
  *    unless the row's risk_score >= 70, which wraps instead
  *    (dataframe.py:454-486)
  *  - ANSI colour: risk bands >=95 white-on-red, >=90 red, >=80 magenta,
  *    >=70 blue, >=60 cyan; first row of a new (source, ip, cluster) run
  *    highlights identity columns (dataframe.py:509-544)
  */
object Renderer {

  final case class ColSpec(name: String, header: String, width: Int,
      term: Boolean, csv: Boolean, truncRev: Boolean = false, riskWrap: Boolean = false)

  /** DISPLAY_CONFIG (dataframe.py:29-47). */
  val displayConfig: Seq[ColSpec] = Seq(
    ColSpec("source", "Source", 8, term = true, csv = true),
    ColSpec("timestamp", "Orig Timestamp", 26, term = true, csv = true),
    ColSpec("utc_timestamp", "UTC Timestamp", 26, term = true, csv = true),
    ColSpec("ip", "IP", 16, term = true, csv = true),
    ColSpec("method_path", "Method + Path", 30, term = true, csv = true, riskWrap = true),
    ColSpec("status", "Status", 6, term = true, csv = true),
    ColSpec("resp_size", "Size", 6, term = true, csv = true),
    ColSpec("user_agent", "User Agent", 12, term = true, csv = true, truncRev = true, riskWrap = true),
    ColSpec("referrer", "Referrer", 14, term = true, csv = true, riskWrap = true),
    ColSpec("request_count", "Count", 6, term = true, csv = true),
    ColSpec("risk_score", "Score", 6, term = true, csv = true),
    ColSpec("rule_applied", "Rule", 15, term = true, csv = true, riskWrap = true),
    ColSpec("cluster", "CID", 4, term = true, csv = true),
    ColSpec("tool", "TID", 6, term = true, csv = true),
    ColSpec("tool_name", "Tool Name", 15, term = false, csv = true),
    ColSpec("tool_desc", "Tool Description", 30, term = false, csv = true),
    ColSpec("extra", "Extra Info", 30, term = false, csv = true))

  val RiskWrapThreshold = 70.0

  /** P1 — display projection (dataframe.py:408-409). */
  def withMethodPath(df: DataFrame): DataFrame =
    df.withColumn("method_path", concat_ws(" ", col("method"), col("request_uri")))
      .drop("method", "request_uri")

  private def cell(r: Row, name: String): String = {
    val i = r.fieldIndex(name)
    if (r.isNullAt(i)) "" else r.get(i).toString
  }

  private def isEmptyValue(v: String): Boolean =
    v == "" || v == "-" || v == "0" || v == "0.0"

  /** Terminal-mode column pruning (P2, dataframe.py:411-437). */
  def selectTermColumns(rows: Seq[Row], clusterEnabled: Boolean): Seq[ColSpec] =
    displayConfig.filter { c =>
      if (c.name == "cluster") clusterEnabled
      else if (c.name == "risk_score") true
      else if (!c.term) false
      else rows.isEmpty || rows.exists(r =>
        r.schema.fieldNames.contains(c.name) && !isEmptyValue(cell(r, c.name)))
    }.filter(c => rows.isEmpty || rows.headOption.forall(_.schema.fieldNames.contains(c.name)))

  def truncate(value: String, maxLen: Int, fromEnd: Boolean): String = {
    if (maxLen <= 0 || value.length <= maxLen) value
    else if (maxLen < 2) { if (fromEnd) value.takeRight(maxLen) else value.take(maxLen) }
    else if (fromEnd) ".." + value.takeRight(maxLen - 2)
    else value.take(maxLen - 2) + ".."
  }

  def wrap(value: String, width: Int): Seq[String] =
    if (value.isEmpty) Seq("")
    else value.split(" ").foldLeft(Vector.empty[String]) { (acc, w) =>
      acc.lastOption match {
        case Some(last) if last.length + 1 + w.length <= width =>
          acc.init :+ (last + " " + w)
        case _ if w.length <= width => acc :+ w
        case _ => acc ++ w.grouped(width) // hard-break overlong tokens
      }
    }

  private val Reset = "[0m"
  private def colorFor(risk: Double): Option[String] =
    if (risk >= 95) Some("[1;37;41m")      // bold white on red
    else if (risk >= 90) Some("[31m")      // red
    else if (risk >= 80) Some("[1;35m")    // bold magenta
    else if (risk >= 70) Some("[1;34m")    // bold blue
    else if (risk >= 60) Some("[1;36m")    // bold cyan
    else None
  private val NewClusterColor = "[1;34m"
  private val identityCols = Set("source", "timestamp", "utc_timestamp", "ip")

  /** Render a collected frame as the reference's pretty table. */
  def renderTable(rows: Seq[Row], clusterEnabled: Boolean = true, colour: Boolean = true): String = {
    if (rows.isEmpty) return "<EMPTY>"
    val cols = selectTermColumns(rows, clusterEnabled)
    if (cols.isEmpty) return "<EMPTY>"

    var prev: (String, String, String) = (null, null, null)
    val rendered: Seq[Seq[Seq[String]]] = rows.map { r =>
      val risk = try cell(r, "risk_score").toDouble catch { case _: Exception => 0.0 }
      val key = (cell(r, "ip"), cell(r, "source"),
        if (r.schema.fieldNames.contains("cluster")) cell(r, "cluster") else "")
      val isNewCluster = key != prev
      prev = key
      cols.map { c =>
        val raw = cell(r, c.name)
        val lines: Seq[String] =
          if (c.riskWrap && risk >= RiskWrapThreshold) wrap(raw, c.width)
          else Seq(truncate(raw, c.width, c.truncRev))
        if (!colour) lines
        else if (c.name == "risk_score")
          colorFor(risk).map(k => lines.map(k + _ + Reset)).getOrElse(lines)
        else if (clusterEnabled && isNewCluster && identityCols.contains(c.name))
          lines.map(NewClusterColor + _ + Reset)
        else lines
      }
    }

    def visibleLen(s: String): Int = s.replaceAll("\\[[0-9;]*m", "").length
    val widths = cols.indices.map { i =>
      (cols(i).header.length +: rendered.map(_(i).map(visibleLen).max)).max
    }
    def pad(s: String, w: Int) = s + " " * (w - visibleLen(s))
    val sep = widths.map(w => "-" * (w + 2)).mkString("+", "+", "+")
    val sb = new StringBuilder
    sb.append(sep).append('\n')
    sb.append(cols.zip(widths).map { case (c, w) => " " + pad(c.header, w) + " " }
      .mkString("|", "|", "|")).append('\n')
    sb.append(sep).append('\n')
    rendered.foreach { cells =>
      val h = cells.map(_.size).max
      (0 until h).foreach { li =>
        sb.append(cols.indices.map { i =>
          val v = if (li < cells(i).size) cells(i)(li) else ""
          " " + pad(v, widths(i)) + " "
        }.mkString("|", "|", "|")).append('\n')
      }
    }
    sb.append(sep)
    sb.toString
  }

  /** K2 — CSV escape (dataframe.py:594-600). */
  def escapeCsv(field: String): String =
    if (field == null) ""
    else if (field.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + field.replace("\"", "\"\"") + "\""
    else field

  /** K2 — render collected rows as CSV with the full csv column set.
    * Delegates to [[renderCsvStream]] so the bounded and streaming
    * paths cannot drift.
    */
  def renderCsv(rows: Seq[Row]): String = {
    if (rows.isEmpty) return "<EMPTY>"
    val sb = new StringBuilder
    renderCsvStream(rows.iterator, s => { sb.append(s); () })
    sb.toString
  }

  /** K2 streaming: emit the same CSV text as [[renderCsv]] one line at a
    * time (header from the first row's schema), so an unbounded
    * `toLocalIterator` result never materializes on the driver. Returns
    * the number of data rows written — 0 means nothing was emitted (the
    * caller decides how to represent empty, matching renderCsv's
    * `<EMPTY>`).
    */
  def renderCsvStream(rows: Iterator[Row], out: String => Unit): Long = {
    if (!rows.hasNext) return 0L
    val first = rows.next()
    val present = first.schema.fieldNames.toSet
    val cols = displayConfig.filter(c => c.csv && present.contains(c.name))
    out(cols.map(_.header).mkString(",") + "\n")
    var n = 0L
    (Iterator.single(first) ++ rows).foreach { r =>
      out(cols.map(c => escapeCsv(cell(r, c.name))).mkString(",") + "\n")
      n += 1
    }
    n
  }

  /** K2 distributed: write the csv column set with headers via the Spark
    * csv sink (for outputs too large to collect).
    */
  def writeCsv(df: DataFrame, path: String): Unit = {
    val present = df.columns.toSet
    val cols = displayConfig.filter(c => c.csv && present.contains(c.name))
    df.select(cols.map(c => col(c.name).as(c.header)): _*)
      .write.mode("overwrite").option("header", "true").csv(path)
  }
}
