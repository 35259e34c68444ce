package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.UriCodec.{nested_unquote, py_unquote}

/** C1–C8 scalar risk features (SURVEY §2.5), all as native Column
  * expressions — no UDFs, full whole-stage codegen. Semantics from
  * reference risk.py:196-332 (uri), 275-287 (method), 289-312 (status).
  */
object RiskFeatures {

  /** Combined path-traversal pattern (reference risk.py:247-251):
    * `../`, `..\`, `/..`, `\..`, `%00`, U+FFFD — tested with
    * case-insensitive search.
    */
  val traversalPattern: String =
    "(?i)(\\.\\./|\\.\\.\\\\|/\\.\\.|\\\\\\.\\.|%00|�)"

  /** C3 — split a (decoded) request URI into path / query the way the
    * reference effectively does for relative log URIs
    * (urlparse at risk.py:252-254): path before the first '?', query
    * after it ('' when absent).
    */
  def uriPath(dec: Column): Column = substring_index(dec, "?", 1)
  def uriQuery(dec: Column): Column =
    when(instr(dec, "?") > 0, dec.substr(instr(dec, "?") + 1, length(dec)))
      .otherwise(lit(""))

  /** C1 — composite uri_risk 0..100 (reference risk.py:196-228).
    *
    * @param sensitivePaths  lowercase substrings (+25 when any present)
    * @param riskyExtPatterns regex fragments like `\.sql` (+10 when any
    *                         matches the lowered URI)
    * @param webshellNames   known webshell basenames (+50 on match of the
    *                        decoded basename before '?')
    */
  def uriRisk(
      requestUri: Column,
      sensitivePaths: Seq[String],
      riskyExtPatterns: Seq[String],
      webshellNames: Set[String]): Column = {
    val d = nested_unquote(requestUri)
    val dec = d.getField("uri")
    val depth = d.getField("depth")
    val lowerDec = lower(dec)

    val depthScore = when(depth >= 2, 20).when(depth === 1, 10).otherwise(0)

    val sensitive =
      if (sensitivePaths.isEmpty) lit(0)
      else when(sensitivePaths.map(p => lowerDec.contains(p.toLowerCase)).reduce(_ || _), 25)
        .otherwise(0)

    val path = uriPath(dec)
    val query = uriQuery(dec)
    val ptPath = length(path) > 0 && path.rlike(traversalPattern)
    val ptQuery = length(query) > 0 && query.rlike(traversalPattern)
    val traversal = when(ptPath, 80).when(ptQuery, 15).otherwise(0)

    // webshell basename: unquote AGAIN (reference decodes once more inside
    // _extract_filename, risk.py:329), strip query, take basename.
    // NOTE: the reference *ships* a config bug (config.py:19 loads the
    // rules file as the shell list, so the +50 never fires with default
    // config); we implement the documented intent (config.yaml:9 ->
    // shells.txt). Divergence pinned in RiskFeaturesSpec.
    val basename = substring_index(substring_index(py_unquote(dec), "?", 1), "/", -1)
    val shell =
      if (webshellNames.isEmpty) lit(0)
      else when(basename.isin(webshellNames.toSeq: _*), 50).otherwise(0)

    val doubleExt = when(dec.rlike("(?i)\\.php\\.[a-zA-Z0-9]+$"), 80).otherwise(0)

    val riskyExt =
      if (riskyExtPatterns.isEmpty) lit(0)
      else when(riskyExtPatterns.map(p => lowerDec.rlike(p)).reduce(_ || _), 10).otherwise(0)

    least(depthScore + sensitive + traversal + shell + doubleExt + riskyExt, lit(100))
  }

  /** C7 — method_risk lookup (reference risk.py:275-287). */
  def methodRisk(method: Column): Column = {
    val m = upper(method)
    when(m === "GET", 10)
      .when(m === "HEAD", 20)
      .when(m === "OPTIONS", 25)
      .when(m === "POST", 45)
      .when(m.isin("PUT", "DELETE", "TRACE", "CONNECT"), 80)
      .otherwise(60)
  }

  /** C8 — status_risk: exact-code map then range fallback
    * (reference risk.py:289-312).
    */
  def statusRisk(status: Column): Column = {
    val exact = Map(
      100 -> 20, 101 -> 20,
      200 -> 30, 201 -> 90, 202 -> 35, 204 -> 25, 207 -> 70,
      301 -> 10, 302 -> 10, 304 -> 20,
      400 -> 15, 401 -> 30, 403 -> 40, 404 -> 10, 429 -> 35,
      500 -> 90, 502 -> 70, 503 -> 70, 504 -> 70)
    val exactChain = exact.toSeq.sortBy(_._1).foldLeft(when(lit(false), 0)) {
      case (acc, (code, score)) => acc.when(status === code, score)
    }
    exactChain
      .when(status >= 100 && status < 200, 25)
      .when(status >= 200 && status < 300, 35)
      .when(status >= 300 && status < 400, 15)
      .when(status >= 400 && status < 500, 25)
      .when(status >= 500 && status < 600, 80)
      .otherwise(90)
  }
}
