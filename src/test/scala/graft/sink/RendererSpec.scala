package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSpec

class RendererSpec extends GraftSparkSpec {
  import spark.implicits._

  test("truncate head/tail with .. (dataframe.py:454-464)") {
    assert(Renderer.truncate("abcdefghij", 6, fromEnd = false) == "abcd..")
    assert(Renderer.truncate("abcdefghij", 6, fromEnd = true) == "..ghij")
    assert(Renderer.truncate("abc", 6, fromEnd = false) == "abc")
    assert(Renderer.truncate("abcdefghij", 1, fromEnd = false) == "a")
  }

  test("csv escaping (dataframe.py:594-600)") {
    assert(Renderer.escapeCsv("plain") == "plain")
    assert(Renderer.escapeCsv("a,b") == "\"a,b\"")
    assert(Renderer.escapeCsv("say \"hi\"") == "\"say \"\"hi\"\"\"")
    assert(Renderer.escapeCsv(null) == "")
  }

  test("all-empty/0/'-' columns dropped in terminal mode (dataframe.py:411-437)") {
    val df = Seq(
      ("a.log", "ts", "1.1.1.1", "GET /x", 200, 0L, "-", "-", 1L, 0.0, "", 0L, ""))
      .toDF("source", "timestamp", "ip", "method_path", "status", "resp_size",
        "user_agent", "referrer", "request_count", "risk_score", "rule_applied",
        "cluster", "tool")
    val rows = df.collect().toSeq
    val cols = Renderer.selectTermColumns(rows, clusterEnabled = true).map(_.name)
    // resp_size all 0, user_agent/referrer all '-', rule_applied/tool all '' -> dropped
    assert(!cols.contains("resp_size") && !cols.contains("user_agent") &&
      !cols.contains("referrer") && !cols.contains("tool"))
    // risk_score + cluster always kept
    assert(cols.contains("risk_score") && cols.contains("cluster"))
  }

  test("risk >= 70 wraps instead of truncating; table renders") {
    val df = Seq(
      ("a.log", "t1", "1.1.1.1", "POST /a/very/long/path/segment/here", 200, 10L,
        "ua", "ref", 1L, 75.0, "Rule Title That Is Long", 0L, ""),
      ("a.log", "t2", "1.1.1.1", "GET /short", 200, 10L,
        "ua", "ref", 1L, 0.0, "x", 0L, ""))
      .toDF("source", "timestamp", "ip", "method_path", "status", "resp_size",
        "user_agent", "referrer", "request_count", "risk_score", "rule_applied",
        "cluster", "tool")
    val out = Renderer.renderTable(df.collect().toSeq, colour = false)
    // wrapped row spans multiple physical lines; no line exceeds header sep
    assert(out.contains("segment/here") || out.contains("/a/very/long/path"))
    val widths = out.linesIterator.map(_.length).toSet
    assert(widths.size <= 2) // all rows aligned to the same table width
  }

  test("empty frame renders <EMPTY> (dataframe.py:393)") {
    assert(Renderer.renderTable(Nil) == "<EMPTY>")
    assert(Renderer.renderCsv(Nil) == "<EMPTY>")
  }

  test("renderCsvStream emits byte-identical text to renderCsv") {
    val df = Seq(
      ("a.log", "ts", "1.1.1.1", "GET /x,y", 200, 512L, "say \"hi\"", "-", 2L, 71.5, "R1", 1L, "T1"),
      ("a.log", "ts2", "1.1.1.2", "GET /z", 404, 0L, "curl", "-", 1L, 0.0, "", 1L, ""))
      .toDF("source", "timestamp", "ip", "method_path", "status", "resp_size",
        "user_agent", "referrer", "request_count", "risk_score", "rule_applied",
        "cluster", "tool")
    val rows = df.collect().toSeq
    val sb = new StringBuilder
    val n = Renderer.renderCsvStream(rows.iterator, s => sb.append(s))
    assert(n == 2L)
    assert(sb.toString == Renderer.renderCsv(rows))
    // empty iterator writes nothing and reports 0
    val sb2 = new StringBuilder
    assert(Renderer.renderCsvStream(Iterator.empty, s => sb2.append(s)) == 0L)
    assert(sb2.isEmpty)
  }

  test("email message is a complete multipart MIME with base64 csv") {
    val msg = EmailSink.buildMessage("a@x", "b@y", "subj", "body", "h1,h2\nv1,v2\n")
    assert(msg.contains("Content-Type: multipart/mixed"))
    assert(msg.contains("Content-Disposition: attachment; filename=\"results.csv\""))
    val b64 = java.util.Base64.getMimeDecoder
    val enc = msg
      .split("Content-Disposition: attachment; filename=\"results.csv\"\r\n\r\n")(1)
      .split("\r\n--")(0)
    assert(new String(b64.decode(enc)) == "h1,h2\nv1,v2\n")
  }
}
