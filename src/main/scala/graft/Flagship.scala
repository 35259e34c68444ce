package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.query.FilterOptions
import graft.rules.{GraftConfig, RuleEngine}
import graft.sources.LineParser

/** The flagship end-to-end demo: synthesize apache access-log lines from
  * the `events` table, then run the FULL engine pipeline —
  * parse (S6) -> dedup (D1) -> utc (C10) -> sessionize (W1) ->
  * request_count (A1) -> risk features (C1-C8) -> rule engine ->
  * burst detector (W2) -> tool scanner (W3) -> filters (F*) — exactly
  * the reference CLI flow (triage.py:227-263).
  */
object Flagship {

  /** Default rules matching the live reference rule set's semantics
    * (reference rules.yaml:29-150 — titles/scores are part of the
    * observable output surface).
    */
  val defaultRulesYaml: String =
    """- title: Large Request Count & Server Error
      |  detection: { selection: { request_count|gte: 500, status: [500, 502, 503, 504], resp_size|gte: 25 } }
      |  tags: [ { risk_score: 80.0 } ]
      |- title: Suspicious URI & OK Status
      |  detection: { selection: { uri_risk|gte: 70, status: [200, 201, 202], resp_size|gte: 25 } }
      |  tags: [ { risk_score: 75.0 } ]
      |- title: Shell Command & Status Success
      |  detection: { selection: { status: [200, 201, 202], resp_size|gte: 25, request_uri|contains: 'whoami' } }
      |  tags: [ { risk_score: 71.1 } ]
      |- title: Moderately suspicious URI & Server Error
      |  detection: { selection: { resp_size|gte: 25, uri_risk|gte: 40, status: [500, 502, 503, 504] } }
      |  tags: [ { risk_score: 68.0 } ]
      |- title: Suspicious Referrer
      |  detection: { selection: { referrer|contains: fofa.info } }
      |  tags: [ { risk_score: 67.5 } ]
      |- title: Repeating Requests & Server Error
      |  detection: { selection: { resp_size|gte: 25, request_count|gte: 200, request_count|lt: 500, status: [500, 502, 503, 504] } }
      |  tags: [ { risk_score: 42.0 } ]
      |- title: Repeating POST Requests Status OK or Forbidden
      |  detection: { selection: { request_count|gte: 200, resp_size|gte: 25, status: [200, 201, 202, 403], method: ['POST'] } }
      |  tags: [ { risk_score: 41.0 } ]
      |- title: Status Code Risk
      |  detection: { selection: { status_risk|gte: 70 } }
      |  tags: [ { risk_score: 40.0 } ]""".stripMargin

  /** Deterministic apache-format lines derived from `events`. */
  def syntheticLines(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = SparkEntry.eventsTable(spark, sfDir)
    val ip = concat(lit("10."), (col("user_id") % 200).cast("string"), lit(".0.1"))
    val ts = date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss Z")
    val method = element_at(
      typedLit(Seq("GET", "POST", "PUT", "HEAD")),
      (col("user_id") % 4 + 1).cast("int"))
    val uri = concat(
      lit("/page/p"), (col("event_id") % 50).cast("string"),
      when(col("event_id") % 97 === 0, lit("/../etc/passwd")).otherwise(lit("")),
      when(col("event_id") % 89 === 0, lit("/cmd.php?x=whoami")).otherwise(lit("")),
      when(col("event_id") % 53 === 0, lit("?q=%2e%2e")).otherwise(lit("")))
    val status = element_at(
      typedLit(Seq(200, 200, 404, 200, 500, 302, 403)),
      (col("event_id") % 7 + 1).cast("int"))
    val size = floor(col("value") * 100).cast("long")
    val line = concat(
      ip, lit(" - - ["), ts, lit("] \""), method, lit(" "), uri,
      lit(" HTTP/1.1\" "), status.cast("string"), lit(" "), size.cast("string"),
      lit(" \"-\" \"Mozilla/5.0 (graft)\""))
    ev.select(
      line.as("value"),
      concat(lit("src"), (col("user_id") % 3).cast("string"), lit(".log")).as("source"))
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val parsed = LineParser.parse(syntheticLines(spark, sfDir)).parsed
    val config = GraftConfig.default.copy(
      toolSignatures = Seq(rules.ToolSignature(
        tool = "DS01", name = "DirSearch",
        description = "DirSearch using default dictionary (dicc.txt).",
        keywords = Seq("/.access", ".bak_0.log", ".chef/config.rb"),
        timeWindowSeconds = 7200)))
    val ruleSet = RuleEngine.parseRules(defaultRulesYaml)
    val webshells = Set("cmd.php", "shell.php", "c99.php", "alfa3.php", "1.php")
    val normalized = Pipeline.normalize(parsed)
    val scored = Pipeline.score(normalized, config, ruleSet, webshells)
    graft.query.Filters(scored, FilterOptions(riskScore = 40.0), col("_row_id"))
  }
}
