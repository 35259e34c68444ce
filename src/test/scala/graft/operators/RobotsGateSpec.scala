package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[RobotsGate]]'s RFC 9309 subset: longest prefix wins, allow
  * beats disallow on ties, opt-out default, ruleless/hostless URLs,
  * and partitioning invariance.
  */
class RobotsGateSpec extends GraftSparkSpec {
  import spark.implicits._

  private val rules = Seq(
    ("a.example.com", false, "/private"),
    ("a.example.com", true, "/private/ok"),
    ("a.example.com", false, "/tmp"),
    ("a.example.com", true, "/tmp"), // exact tie: allow wins
    ("b.example.com", false, "/")) // blanket disallow

  private def run(urls: Seq[(Long, String)]) =
    RobotsGate.decide(urls.toDF("id", "url"), Seq(col("id")), col("url"),
      rules.toDF("host", "allow", "prefix"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(3),
        if (r.isNullAt(4)) null else r.getString(4)))
      .sortBy(_._1)

  test("longest prefix wins; allow beats disallow on exact ties") {
    val got = run(Seq(
      (0L, "https://a.example.com/private/x"), // disallow /private
      (1L, "https://a.example.com/private/ok/x"), // allow (longer)
      (2L, "https://a.example.com/tmp/y"), // tie -> allow
      (3L, "https://a.example.com/open"), // no match -> allowed
      (4L, "https://b.example.com/anything"), // blanket disallow
      (5L, "https://c.example.com/x"), // ruleless host
      (6L, "not-a-url"))) // no host
    assert(got === Seq(
      (0L, false, "/private"),
      (1L, true, "/private/ok"),
      (2L, true, "/tmp"),
      (3L, true, null),
      (4L, false, "/"),
      (5L, true, null),
      (6L, true, null)))
  }

  test("path includes the query; empty path reads as /") {
    val got = run(Seq(
      (0L, "https://a.example.com/private?x=1"), // query is part of path
      (1L, "https://b.example.com"))) // empty path -> "/" -> blanket
    assert(got === Seq((0L, false, "/private"), (1L, false, "/")))
  }

  test("partitioning invariance") {
    val urls = (0L until 50L).map(i =>
      (i, s"https://a.example.com/${if (i % 2 == 0) "private" else "open"}/$i"))
    def r(n: Int) = RobotsGate.decide(
      urls.toDF("id", "url").repartition(n), Seq(col("id")), col("url"),
      rules.toDF("host", "allow", "prefix").repartition(n))
      .collect().map(x => (x.getLong(0), x.getBoolean(3))).sortBy(_._1).toSeq
    assert(r(1) === r(7))
  }

  private def parse(rows: Seq[(String, String)], agent: String = "graftbot") =
    RobotsGate.parseRobots(rows.toDF("host", "robots").repartition(3),
      "host", "robots", agent)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else java.lang.Boolean.valueOf(r.getBoolean(2)),
        r.getString(3),
        if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4))))
      .toSet

  test("parseRobots: exact-agent group beats *, star used otherwise") {
    val txt = "User-agent: graftbot\nDisallow: /bot\n" +
      "User-agent: *\nDisallow: /all"
    assert(parse(Seq(("h1", txt))) ===
      Set(("h1", "rule", java.lang.Boolean.FALSE, "/bot", null)))
    assert(parse(Seq(("h1", txt)), agent = "unknown") ===
      Set(("h1", "rule", java.lang.Boolean.FALSE, "/all", null)))
  }

  test("parseRobots: consecutive UA lines share a group; matching groups combine") {
    val txt = "User-agent: GraftBot\nUser-agent: other\nDisallow: /shared\n" +
      "Crawl-delay: 1\nUser-agent: graftbot\nDisallow: /extra\nCrawl-delay: 3"
    assert(parse(Seq(("h1", txt))) === Set(
      ("h1", "rule", java.lang.Boolean.FALSE, "/shared", null),
      ("h1", "rule", java.lang.Boolean.FALSE, "/extra", null),
      ("h1", "delay", null, null, java.lang.Long.valueOf(3000L))))
  }

  test("parseRobots: comments, empty Disallow, orphan rules, bad delays drop") {
    val txt = "# top\nDisallow: /orphan\nUser-agent: *\nDisallow:\n" +
      "Allow: /a  # inline\nCrawl-delay: abc\nnot a directive line"
    assert(parse(Seq(("h1", txt))) ===
      Set(("h1", "rule", java.lang.Boolean.TRUE, "/a", null)))
    assert(parse(Seq(("h2", ""))) === Set.empty)
    assert(parse(Seq(("h3", "User-agent: other\nDisallow: /x"))) === Set.empty)
  }

  test("parseRobots feeds decide and schedule end-to-end") {
    val txt = "User-agent: *\nDisallow: /private\nAllow: /private/ok\nCrawl-delay: 2"
    val parsed = RobotsGate.parseRobots(
      Seq(("h1.example.com", txt)).toDF("host", "robots"),
      "host", "robots", "graftbot")
    val rules = parsed.filter(col("kind") === "rule")
      .select("host", "allow", "prefix")
    val got = RobotsGate.decide(
      Seq((1L, "https://h1.example.com/private/x"),
        (2L, "https://h1.example.com/private/ok/x"),
        (3L, "https://h1.example.com/pub")).toDF("id", "url"),
      Seq(col("id")), col("url"), rules)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).sortBy(_._1).toSeq
    assert(got === Seq((1L, false), (2L, true), (3L, true)))
    val delays = parsed.filter(col("kind") === "delay")
      .select("host", "delay_ms")
    val sched = graft.operators.CrawlScheduler.schedule(
      Seq(("h1.example.com", "https://h1.example.com/a"),
        ("h1.example.com", "https://h1.example.com/b")).toDF("host", "url"),
      "host", "url", delays.withColumnRenamed("delay_ms", "delay_ms"))
      .collect().map(r => r.getAs[Long]("fetch_time_ms")).sorted.toSeq
    assert(sched === Seq(0L, 2000L))
  }
}
