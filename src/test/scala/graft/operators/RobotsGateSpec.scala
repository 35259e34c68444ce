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
}
