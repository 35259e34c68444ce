package graft.rules

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Sigma operator matrix (risk.py:113-173) + highest-wins fold
  * (risk.py:175-183), using the FIXTURES §3.1 rule set shapes.
  */
class RuleEngineSpec extends GraftSparkSpec {
  import spark.implicits._

  private val fixtureYaml =
    """- title: Fixture Numeric Ops
      |  detection: { selection: { uri_risk|gte: 40, request_count|lt: 500, resp_size|ne: 0 } }
      |  tags: [ { risk_score: 50.0 } ]
      |- title: Fixture String Ops
      |  detection: { selection: { request_uri|contains: whoami, referrer|startswith: "http", user_agent|endswith: "0" } }
      |  tags: [ { risk_score: 60.0 } ]
      |- title: Fixture Regex + Contains-All
      |  detection: { selection: { request_uri|regex: "cmd=[a-z]+", request_uri|contains|all: [cmd, exec] } }
      |  tags: [ { risk_score: 70.0 } ]
      |- title: Fixture List + CIDR + Bare Field
      |  detection: { selection: { method|in: [PUT, DELETE], ip|cidr: ["198.51.100.0/24"], status: [200, 201] } }
      |  tags: [ { risk_score: 80.0 } ]""".stripMargin

  private val rules = RuleEngine.parseRules(fixtureYaml)

  private def df(rows: (String, String, Int, Long, Long, Int, String, String)*) =
    rows.toSeq.toDF("request_uri", "method", "status", "request_count",
      "resp_size", "uri_risk", "referrer", "user_agent")
      .withColumn("ip", lit("198.51.100.9"))
      .withColumn("status_risk", graft.functions.RiskFeatures.statusRisk(col("status")))
      .withColumn("method_risk", graft.functions.RiskFeatures.methodRisk(col("method")))

  private def applied(rows: (String, String, Int, Long, Long, Int, String, String)*) =
    RuleEngine(df(rows: _*), rules)
      .select("risk_score", "rule_applied").collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSeq

  test("yaml parse: 4 rules with ops, contains|all split on FIRST pipe") {
    assert(rules.map(_.title) == Seq("Fixture Numeric Ops", "Fixture String Ops",
      "Fixture Regex + Contains-All", "Fixture List + CIDR + Bare Field"))
    assert(rules(2).conditions.map(_.op).toSet == Set("regex", "contains|all"))
  }

  test("numeric ops rule") {
    assert(applied(("/x", "GET", 404, 10L, 25L, 45, "-", "-")).head == (50.0, "Fixture Numeric Ops"))
    // request_count 500 fails lt
    assert(applied(("/x", "GET", 404, 500L, 25L, 45, "-", "-")).head == (0.0, ""))
  }

  test("string ops: contains case-insens, startswith/endswith case-SENS") {
    assert(applied(("/a?c=WHOAMI", "GET", 404, 10L, 0L, 0, "https://r", "Mozilla/5.0"))
      .head == (60.0, "Fixture String Ops"))
    // startswith is case-sensitive: "Http" fails
    assert(applied(("/a?c=whoami", "GET", 404, 10L, 0L, 0, "Https://r", "Mozilla/5.0"))
      .head == (0.0, ""))
  }

  test("regex + contains|all conjunction") {
    assert(applied(("/run?cmd=exec", "GET", 404, 10L, 0L, 0, "-", "-"))
      .head == (70.0, "Fixture Regex + Contains-All"))
    // regex hits but contains|all misses 'exec'
    assert(applied(("/run?cmd=ls", "GET", 404, 10L, 0L, 0, "-", "-"))
      .head == (0.0, ""))
  }

  test("in + cidr + bare field; highest-score rule wins") {
    // matches rule 4 (80) AND rule 1 (50) -> 80 wins
    assert(applied(("/x", "PUT", 200, 10L, 25L, 45, "-", "-"))
      .head == (80.0, "Fixture List + CIDR + Bare Field"))
  }

  test("equal scores: first rule in file order wins") {
    val dup = RuleEngine.parseRules(
      """- title: A
        |  detection: { selection: { status: [200] } }
        |  tags: [ { risk_score: 55.0 } ]
        |- title: B
        |  detection: { selection: { method|in: [GET] } }
        |  tags: [ { risk_score: 55.0 } ]""".stripMargin)
    val got = RuleEngine(df(("/x", "GET", 200, 1L, 1L, 0, "-", "-")), dup)
      .select("rule_applied").head.getString(0)
    assert(got == "A")
  }

  test("live reference rule set semantics (rules.yaml:29-150)") {
    val live = RuleEngine.parseRules(graft.Flagship.defaultRulesYaml)
    // status 500 + size>=25 + uri_risk 45 -> 'Moderately suspicious URI &
    // Server Error' (68) beats 'Status Code Risk' (40)
    val got = RuleEngine(df(("/x.sql?a=../b", "GET", 500, 1L, 30L, 45, "-", "-")), live)
      .select("risk_score", "rule_applied").head
    assert(got.getDouble(0) == 68.0)
    assert(got.getString(1) == "Moderately suspicious URI & Server Error")
  }
}
