package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** S6 fixtures per FIXTURES.md §1 — every line validated against the
  * reference regexes; `matched by` records first-match-dispatch winners
  * including the shadowing of `apache extended` / `nginx` by `apache`.
  */
class LineParserSpec extends GraftSparkSpec {
  import spark.implicits._

  private def parseOne(line: String): Row = {
    val df = Seq((line, "test.log")).toDF("value", "source")
    val out = LineParser.parse(df).parsed.collect()
    assert(out.length == 1, s"expected 1 parsed row for: $line")
    out.head
  }

  test("apache format") {
    val r = parseOne("""203.0.113.7 - - [21/Apr/2025:18:23:15 +1000] "GET /admin/login.php?user=a HTTP/1.1" 200 1532 "https://example.com/" "Mozilla/5.0 (X11; Linux x86_64)"""")
    assert(r.getAs[String]("format") == "apache")
    assert(r.getAs[String]("ip") == "203.0.113.7")
    assert(r.getAs[String]("method") == "GET")
    assert(r.getAs[String]("request_uri") == "/admin/login.php?user=a")
    assert(r.getAs[Int]("status") == 200)
    assert(r.getAs[Long]("resp_size") == 1532L)
    assert(r.getAs[String]("referrer") == "https://example.com/")
    assert(r.getAs[String]("user_agent") == "Mozilla/5.0 (X11; Linux x86_64)")
  }

  test("no_method format -> method INVALID") {
    val r = parseOne("""203.0.113.7 - - [21/Apr/2025:18:23:16 +1000] "quit" 400 226 "-" "-"""")
    assert(r.getAs[String]("format") == "no_method")
    assert(r.getAs[String]("method") == "INVALID")
    assert(r.getAs[String]("request_uri") == "quit")
  }

  test("apache extended line is SHADOWED by apache (FIXTURES §1)") {
    val r = parseOne("""203.0.113.7 - - [21/Apr/2025:18:23:17 +1000] "GET /index.html HTTP/1.1" 200 1532 "-" "curl/8.5.0" "TLSv1.3"""")
    assert(r.getAs[String]("format") == "apache")
    // the lazy user_agent group swallows the extended trailing field
    assert(r.getAs[String]("user_agent") == "curl/8.5.0\" \"TLSv1.3")
    assert(r.getAs[String]("extra") == null)
  }

  test("clf format -> referrer/user_agent default '-'") {
    val r = parseOne("""203.0.113.7 - - [21/Apr/2025:18:23:18 +1000] "GET /index.html HTTP/1.0" 200 512""")
    assert(r.getAs[String]("format") == "clf")
    assert(r.getAs[String]("referrer") == "-")
    assert(r.getAs[String]("user_agent") == "-")
  }

  test("unknown (grep-style prefix cols) format") {
    val r = parseOne("""web01 proxy fe1 203.0.113.7 - - [21/Apr/2025:18:23:19 +1000] "GET /health HTTP/1.1" 200 17""")
    assert(r.getAs[String]("format") == "unknown")
    assert(r.getAs[String]("ip") == "203.0.113.7")
  }

  test("nginx-style line is SHADOWED by apache") {
    val r = parseOne("""198.51.100.9 - - [21/Apr/2025:08:23:20 +0000] "POST /api/v1/items HTTP/1.1" 201 94 "" "python-requests/2.31"""")
    assert(r.getAs[String]("format") == "apache")
    assert(r.getAs[String]("referrer") == "-") // empty group -> '-' (Python `or`)
  }

  test("iis format") {
    val r = parseOne("2025-04-21 08:23:21 W3SVC1 GET /default.aspx - 443 - 203.0.113.7 Mozilla/5.0+(Windows+NT+10.0) - 200 0 0 1320")
    assert(r.getAs[String]("format") == "iis")
    assert(r.getAs[String]("ip") == "203.0.113.7")
    assert(r.getAs[Int]("status") == 200)
    assert(r.getAs[Long]("resp_size") == 1320L)
  }

  test("iis_custom_1 format -> resp_size 0, time_taken captured") {
    val r = parseOne("2025-04-21 08:23:22 W3SVC1 HOST1 10.0.0.5 GET /login.aspx - 443 - 203.0.113.7 Mozilla/5.0+(Windows) http://ref.example/ 401 1 2 120")
    assert(r.getAs[String]("format") == "iis_custom_1")
    assert(r.getAs[Long]("resp_size") == 0L)
    assert(r.getAs[String]("time_taken") == "120")
    assert(r.getAs[String]("referrer") == "http://ref.example/")
  }

  test("grep-prefix strip then parse (FIXTURES §1.1)") {
    val r = parseOne("""access.log:203.0.113.7 - - [21/Apr/2025:18:23:15 +1000] "GET / HTTP/1.1" 200 5 "-" "-"""")
    assert(r.getAs[String]("ip") == "203.0.113.7")
  }

  test("comment and blank lines skipped; garbage goes to error channel") {
    val df = Seq(
      ("#Fields: date time s-sitename cs-method", "f.log"),
      ("", "f.log"),
      ("garbage that matches nothing", "f.log")).toDF("value", "source")
    val out = LineParser.parse(df)
    assert(out.parsed.count() == 0)
    val errs = out.errors.collect()
    assert(errs.length == 1 && errs.head.getAs[String]("line") == "garbage that matches nothing")
  }

  test("trailing-junk regex of the reference is a no-op (SURVEY §7.4.4)") {
    // the reference applies r'(\".*?\"|-\" \".*?\"|-\")$.*' -> r'\1' on the
    // stripped line; '$.*' can only match empty, so parsing is unaffected.
    val line = """203.0.113.7 - - [21/Apr/2025:18:23:15 +1000] "GET /x HTTP/1.1" 200 5 "-" "ua" """
    val r = parseOne(line)
    assert(r.getAs[String]("user_agent") == "ua")
  }
}
