package graft.textops

import graft.GraftSparkSpec

/** Pins [[LinkExtract]] resolution to the PUBLIC RFC 3986 §5.4
  * example matrix (base `http://a/b/c/d;p?q`), adjusted for the two
  * documented link-graph divergences (fragments always drop;
  * non-http(s) results and empty refs are null), cross-checks the
  * well-formed subset against `java.net.URI` (an INDEPENDENT RFC
  * implementation), and pins the href extraction repertoire.
  */
class LinkExtractSpec extends GraftSparkSpec {

  private val base = "http://a/b/c/d;p?q"

  // RFC 3986 §5.4.1 normal examples, fragment-drop applied.
  private val normal = Seq(
    "g:h" -> null, // non-http scheme: not an edge
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    "#s" -> "http://a/b/c/d;p?q", // fragment dropped -> base itself
    "g#s" -> "http://a/b/c/g",
    "g?y#s" -> "http://a/b/c/g?y",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "g;x?y#s" -> "http://a/b/c/g;x?y",
    "" -> null, // empty ref: no edge (RFC: base)
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g")

  // §5.4.2 abnormal examples (strict-parser column), same adjustments.
  private val abnormal = Seq(
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
    "g?y/./x" -> "http://a/b/c/g?y/./x",
    "g?y/../x" -> "http://a/b/c/g?y/../x",
    "g#s/./x" -> "http://a/b/c/g", // fragment starts at FIRST '#'
    "g#s/../x" -> "http://a/b/c/g",
    "http:g" -> null) // scheme-only ref with no authority: not fetchable

  test("RFC 3986 §5.4 matrix (fragment-drop + edge-null adjusted)") {
    for ((ref, want) <- normal ++ abnormal)
      assert(LinkExtract.resolve(base, ref) === want, s"ref=<$ref>")
  }

  test("java.net.URI agrees on the well-formed http subset") {
    // Exclusions = exactly where the JDK's RFC-2396-era resolver is
    // known to diverge from RFC 3986: fragment/query-only refs and
    // dot-segments that over-traverse the root (no clamping). The
    // q115 fixture stays inside this subset, so the embedded oracle's
    // independent half is RFC-correct everywhere it is used.
    val javaDivergent =
      Set("../../../g", "../../../../g", "/./g", "/../g")
    val b = java.net.URI.create(base)
    for ((ref, want) <- normal ++ abnormal
         if want != null && ref.nonEmpty && !ref.contains("#") &&
           !ref.startsWith("?") && !ref.startsWith("http:") &&
           !javaDivergent.contains(ref)) {
      val viaJava = b.resolve(java.net.URI.create(ref)).toString
      assert(viaJava === want, s"java disagrees on ref=<$ref>")
    }
  }

  test("non-absolute or non-http base yields no edges, never garbage") {
    assert(LinkExtract.resolve("not a url", "g") === null)
    assert(LinkExtract.resolve("/rooted/only", "g") === null)
    assert(LinkExtract.resolve("ftp://a/b", "g") === null)
    assert(LinkExtract.resolve("", "g") === null)
  }

  test("scheme/ref edge cases") {
    // javascript:/mailto:/data: refs are not edges
    assert(LinkExtract.resolve(base, "javascript:void(0)") === null)
    assert(LinkExtract.resolve(base, "mailto:x@example.com") === null)
    assert(LinkExtract.resolve(base, "data:text/plain,hi") === null)
    // absolute https ref from http base keeps its own scheme
    assert(LinkExtract.resolve(base, "https://x.example.org/p?a=1") ===
      "https://x.example.org/p?a=1")
    // protocol-relative inherits the base scheme
    assert(LinkExtract.resolve("https://h.example.com/a/", "//cdn.example.net/l") ===
      "https://cdn.example.net/l")
    // colon in the first relative segment reads as a scheme (RFC:
    // such refs need a ./ prefix) -> non-http -> null; prefixed works
    assert(LinkExtract.resolve(base, "a:b/c") === null)
    assert(LinkExtract.resolve(base, "./a:b/c") === "http://a/b/c/a:b/c")
  }

  test("href extraction: quoting, whitespace, order, non-anchors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val html =
      """<p>x</p><a href="/dq">d</a> <A HREF='/sq'>s</A>
        |<a class="z" href = /bare>b</a>
        |<a name="no-href">none</a>
        |<a data-href="/tracker">not-an-href-attr</a>
        |<a xlink:href="/svg">not-an-href-attr</a>
        |<img href="/not-an-anchor">
        |<a href="">empty</a><a href="#top">frag</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(LinkExtract.rawHrefs(col("h")).as("r"))
      .head.getSeq[String](0)
    assert(got === Seq("/dq", "/sq", "/bare", "", "#top"))
  }

  test("outlinks table: resolution, host, drop gaps, codegen path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "https://w.example.com/a/b/page.html",
        """<a href="sub/x">1</a><a href="javascript:void(0)">2</a>""" +
          """<a href="//cdn.example.net/y">3</a><a href="../up">4</a>"""))
      .toDF("id", "url", "html")
    val out = LinkExtract.outlinks(df, Seq(col("id")), col("url"), col("html"))
      .orderBy("link_idx")
      .collect()
      .map(r => (r.getLong(1), r.getString(3), r.getString(4)))
    assert(out === Seq(
      (0L, "https://w.example.com/a/b/sub/x", "w.example.com"),
      // link_idx 1 (javascript:) dropped -> gap marks the non-edge
      (2L, "https://cdn.example.net/y", "cdn.example.net"),
      (3L, "https://w.example.com/a/up", "w.example.com")))
  }
}
