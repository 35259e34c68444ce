package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class AnchorTextSpec extends GraftSparkSpec {
  import spark.implicits._

  private def links(rows: Seq[(Long, String, String)]) =
    LinkExtract.anchorTexts(
      rows.toDF("doc_id", "page_url", "html"),
      Seq(col("doc_id")), col("page_url"), col("html"))
      .select("doc_id", "link_idx", "href", "url", "dst_host", "anchor")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5)))

  private val base = "https://src.example/p/1"

  test("nested tags strip to spaces; whitespace collapses; text trims") {
    val got = links(Seq((1L, base,
      """<a href="https://t.example/x">Read <b>more</b>   now</a>""")))
    assert(got.toSeq == Seq(
      (1L, 0L, "https://t.example/x", "https://t.example/x",
        "t.example", "Read more now")))
  }

  test("image-only anchors emit empty text; unresolvable refs drop") {
    val got = links(Seq((1L, base,
      """<a href=https://t.example/i><img src="x.png"/></a>""" +
        """<a href="javascript:void(0)">Click</a>""" +
        """<a href="mailto:x@y.example">Mail</a>""")))
    assert(got.toSeq == Seq(
      (1L, 0L, "https://t.example/i", "https://t.example/i", "t.example", "")))
  }

  test("unclosed anchors are skipped; tag case is insensitive") {
    val got = links(Seq((1L, base,
      """<a href="https://a.example/open">no close""" +
        """<A HREF="https://b.example/up">Caps</A>""")))
    // the unclosed first anchor swallows to the FIRST </a>, so one
    // element emerges whose href is the first tag's
    assert(got.length == 1)
    assert(got(0)._3 == "https://a.example/open")
    assert(got(0)._6 == "no close Caps")
  }

  test("relative hrefs resolve against the page url") {
    val got = links(Seq((1L, "https://src.example/dir/page.html",
      """<a href="../up/x">Up</a><a href="/rooted">Root</a>""")))
    assert(got.map(g => (g._4, g._6)).toSeq == Seq(
      ("https://src.example/up/x", "Up"),
      ("https://src.example/rooted", "Root")))
  }

  test("aggregateAnchors: modal anchor by (count desc, text asc); empty anchors count links only") {
    val rows = Seq(
      (1L, "h.example", "alpha"), (2L, "h.example", "alpha"),
      (3L, "h.example", "beta"), (4L, "h.example", "beta"),
      (5L, "h.example", ""), (6L, "g.example", "solo"))
      .toDF("doc_id", "dst_host", "anchor")
    val got = LinkExtract.aggregateAnchors(rows, "doc_id")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), if (r.isNullAt(5)) -1L else r.getLong(5))))
      .toMap
    // tie at count 2: 'alpha' < 'beta' wins
    assert(got("h.example") == ((5L, 5L, 2L, "alpha", 2L)))
    assert(got("g.example") == ((1L, 1L, 1L, "solo", 1L)))
  }

  test("a host with only empty anchors has null top_anchor") {
    val rows = Seq((1L, "h.example", ""), (2L, "h.example", ""))
      .toDF("doc_id", "dst_host", "anchor")
    val got = LinkExtract.aggregateAnchors(rows, "doc_id").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 2L)   // n_links
    assert(got(0).getLong(3) == 0L)   // n_anchors
    assert(got(0).isNullAt(4))        // top_anchor
  }
}
