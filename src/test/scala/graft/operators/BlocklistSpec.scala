package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Domain blocklist (Blocklist): host extraction edge cases, the
  * label-aligned suffix rule, join-path vs column-fold agreement, and
  * the filter form.
  */
class BlocklistSpec extends GraftSparkSpec {
  import spark.implicits._

  private val urls = Seq(
    (1L, "https://ads.tracker.example/p/1"),   // subdomain of blocked
    (2L, "https://tracker.example/x"),         // exact blocked
    (3L, "https://nottracker.example/x"),      // label-aligned: NOT blocked
    (4L, "https://spam.net:8443/y"),           // port stripped
    (5L, "https://user:pw@sub.spam.net/z"),    // userinfo stripped
    (6L, "not a url"),                         // no host
    (7L, "https://good.example.org/ok"))
    .toDF("id", "url")

  private val blocklist = Seq("tracker.example", "SPAM.net").toDF("domain")
  private val domains = Seq("tracker.example", "spam.net")

  test("urlHost strips userinfo and port, lowers, nulls non-URLs") {
    val got = urls.select(col("id"), Blocklist.urlHost(col("url")).as("h"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("ads.tracker.example")), (2L, Some("tracker.example")),
      (3L, Some("nottracker.example")), (4L, Some("spam.net")),
      (5L, Some("sub.spam.net")), (6L, None), (7L, Some("good.example.org"))))
  }

  test("hostSuffixes is the label-suffix chain") {
    val got = spark.sql("SELECT 'a.b.c' AS h")
      .select(Blocklist.hostSuffixes(col("h")))
      .collect().head.getSeq[String](0)
    assert(got == Seq("a.b.c", "b.c", "c"))
  }

  test("flagBlocked marks exactly the suffix-rule matches; null hosts pass") {
    val got = Blocklist.flagBlocked(
      urls, "id", Blocklist.urlHost(col("url")), blocklist)
      .select(col("id"), col("blocked"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, true), (2L, true), (3L, false), (4L, true),
      (5L, true), (6L, false), (7L, false)))
  }

  test("join path and small-list column fold agree") {
    val fold = urls.select(col("id"),
      coalesce(Blocklist.hostBlocked(Blocklist.urlHost(col("url")), domains),
        lit(false)).as("blocked"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    val join = Blocklist.flagBlocked(
      urls, "id", Blocklist.urlHost(col("url")), blocklist)
      .select(col("id"), col("blocked"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(fold == join)
  }

  test("dropBlocked keeps the complement") {
    val kept = Blocklist.dropBlocked(
      urls, "id", Blocklist.urlHost(col("url")), blocklist)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 6L, 7L))
  }

  test("registrableDomain: eTLD+1 heuristic") {
    import spark.implicits._
    val cases = Seq(
      "www.alpha.co.uk" -> "alpha.co.uk",   // 2-letter TLD + public 2nd level
      "deep.sub.alpha.co.uk" -> "alpha.co.uk",
      "alpha.co.uk" -> "alpha.co.uk",
      "news.beta.com" -> "beta.com",        // 3-letter TLD: last two labels
      "deep.sub.gamma.org" -> "gamma.org",
      "x.co.com" -> "co.com",               // 'com' is not a 2-letter TLD
      "ab.cd.ef" -> "cd.ef",                // 'cd' not in the public set
      "delta.io" -> "delta.io",             // 2 labels pass through
      "localhost" -> "localhost")           // 1 label passes through
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), Blocklist.registrableDomain(col("host")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"$h -> ${got(h)}, want $want")
    }
  }
}
