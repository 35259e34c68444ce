package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cidr

/** F1–F14 — the user-facing filter surface (SURVEY §2.2; reference
  * `AccessLogDataFrame.filter`, dataframe.py:252-374).
  *
  * One conjunctive predicate; include/ignore pairs are a predicate and
  * its negation; output is always sorted `(source, utc_timestamp)` (O1 —
  * dataframe.py:372). All string "contains" filters are regex-escaped
  * substring disjunctions, matching the reference's
  * `'|'.join(map(re.escape, ...))`.
  */
final case class FilterOptions(
    startTime: Option[String] = None,
    endTime: Option[String] = None,
    riskScore: Double = 0,
    requestCount: Long = 0,
    statusIgnore: Seq[Int] = Nil,
    statusInclude: Seq[Int] = Nil,
    methodInclude: Seq[String] = Nil,
    methodIgnore: Seq[String] = Nil,
    uriInclude: Seq[String] = Nil,
    uriIgnore: Seq[String] = Nil,
    allExtension: Boolean = false,
    extensionIgnore: Seq[String] = Nil,
    ipInclude: Seq[String] = Nil,
    ipIgnore: Seq[String] = Nil,
    uaInclude: Seq[String] = Nil,
    uaIgnore: Seq[String] = Nil,
    refInclude: Seq[String] = Nil,
    refIgnore: Seq[String] = Nil,
    minSize: Option[Long] = None,
    maxSize: Option[Long] = None,
    toolsPresent: Boolean = false,
    clusterIdInclude: Seq[Long] = Nil,
    clusterIdIgnore: Seq[Long] = Nil)

object Filters {

  /** F14 — driver-side argument validation (dataframe.py:284-301). */
  def validate(o: FilterOptions): Unit = {
    if (o.riskScore != 0 && (o.riskScore < 0 || o.riskScore > 100))
      throw new IllegalArgumentException(s"Bad risk score ${o.riskScore}")
    if (o.requestCount < 0)
      throw new IllegalArgumentException(s"Bad request count: ${o.requestCount}")
    if (o.minSize.exists(_ < 0))
      throw new IllegalArgumentException(s"Bad request count: ${o.minSize.get}")
  }

  /** Escaped substring-disjunction containment (regex semantics like
    * pandas str.contains with the escaped pattern — case-SENSITIVE here,
    * unlike the rule engine's `contains`; SURVEY §7.4.3).
    */
  private def containsAny(c: Column, needles: Seq[String]): Column =
    needles.map(n => c.contains(n)).reduce(_ || _)

  /** F2 — static-extension ignore: `lower(uri before '?')` ends with any
    * listed extension (dataframe.py:319-324).
    */
  def extensionIgnoreCol(uri: Column, exts: Seq[String]): Column = {
    val path = lower(substring_index(uri, "?", 1))
    exts.map(e => path.endsWith(e.toLowerCase)).reduce(_ || _)
  }

  def predicate(o: FilterOptions): Option[Column] = {
    val conjuncts = Seq.newBuilder[Column]
    if (o.clusterIdInclude.nonEmpty) conjuncts += col("cluster").isin(o.clusterIdInclude: _*)
    if (o.clusterIdIgnore.nonEmpty) conjuncts += !col("cluster").isin(o.clusterIdIgnore: _*)
    o.startTime.foreach(t => conjuncts += col("utc_timestamp") >= to_timestamp(lit(t)))
    o.endTime.foreach(t => conjuncts += col("utc_timestamp") <= to_timestamp(lit(t)))
    if (!o.allExtension && o.extensionIgnore.nonEmpty)
      conjuncts += !extensionIgnoreCol(col("request_uri"), o.extensionIgnore)
    if (o.riskScore > 0) conjuncts += col("risk_score") >= o.riskScore
    if (o.requestCount > 0) conjuncts += col("request_count") >= o.requestCount
    o.minSize.foreach(s => conjuncts += col("resp_size") >= s)
    o.maxSize.foreach(s => conjuncts += col("resp_size") <= s)
    if (o.statusInclude.nonEmpty) conjuncts += col("status").isin(o.statusInclude: _*)
    if (o.statusIgnore.nonEmpty) conjuncts += !col("status").isin(o.statusIgnore: _*)
    if (o.methodInclude.nonEmpty) conjuncts += col("method").isin(o.methodInclude: _*)
    if (o.methodIgnore.nonEmpty) conjuncts += !col("method").isin(o.methodIgnore: _*)
    if (o.uriInclude.nonEmpty) conjuncts += containsAny(col("request_uri"), o.uriInclude)
    // F8b: --ignore-uripath-keyword exists in the reference CLI
    // (triage.py:175-180) but is never passed to filter() — SURVEY §2.2
    // calls it surface to implement anyway; it is the natural negation
    if (o.uriIgnore.nonEmpty) conjuncts += !containsAny(col("request_uri"), o.uriIgnore)
    if (o.ipInclude.nonEmpty) conjuncts += Cidr.inCidrs(col("ip"), o.ipInclude)
    if (o.ipIgnore.nonEmpty) conjuncts += !Cidr.inCidrs(col("ip"), o.ipIgnore)
    if (o.uaInclude.nonEmpty) conjuncts += containsAny(col("user_agent"), o.uaInclude)
    if (o.uaIgnore.nonEmpty) conjuncts += !containsAny(col("user_agent"), o.uaIgnore)
    if (o.refInclude.nonEmpty) conjuncts += containsAny(col("referrer"), o.refInclude)
    if (o.refIgnore.nonEmpty) conjuncts += !containsAny(col("referrer"), o.refIgnore)
    conjuncts.result().reduceOption(_ && _)
  }

  /** F13 — `--tool-focus`: membership in the set of first/last rows (by
    * utc_timestamp, ties broken by `orderTieCol` ≈ pandas idxmin/idxmax
    * first-occurrence) of each (source, ip, tool≠'') group. The
    * reference computes this set on the UNFILTERED frame and ANDs it
    * into the conjunctive mask (dataframe.py:367-370), so it is a flag,
    * not a post-filter.
    */
  def toolFocusFlag(orderTieCol: Column): Column = {
    val wAsc = Window.partitionBy(col("source"), col("ip"), col("tool"))
      .orderBy(col("utc_timestamp").asc, orderTieCol.asc)
    val wDesc = Window.partitionBy(col("source"), col("ip"), col("tool"))
      .orderBy(col("utc_timestamp").desc, orderTieCol.asc)
    col("tool") =!= "" &&
      (row_number().over(wAsc) === 1 || row_number().over(wDesc) === 1)
  }

  /** Apply the full filter + O1 output sort. */
  def apply(df: DataFrame, o: FilterOptions, orderTieCol: Column = monotonically_increasing_id()): DataFrame = {
    validate(o)
    val marked =
      if (o.toolsPresent) df.withColumn("_tool_focus", toolFocusFlag(orderTieCol))
      else df
    val conjuncts =
      predicate(o).toSeq ++ (if (o.toolsPresent) Seq(col("_tool_focus")) else Nil)
    val filtered = conjuncts.reduceOption(_ && _).map(marked.filter).getOrElse(marked)
    filtered.drop("_tool_focus").orderBy(col("source"), col("utc_timestamp"))
  }
}
