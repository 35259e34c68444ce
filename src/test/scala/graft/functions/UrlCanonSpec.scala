package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class UrlCanonSpec extends GraftSparkSpec {
  import spark.implicits._

  private def c(u: String): String = UrlCanon.canonicalize(u)

  test("scheme and host lower, path and query case preserved") {
    assert(c("HTTPS://WWW.Example.COM/Path/File?Q=V") ==
      "https://www.example.com/Path/File?Q=V")
  }

  test("default ports drop only for their own scheme") {
    assert(c("http://a.com:80/x") == "http://a.com/x")
    assert(c("https://a.com:443/x") == "https://a.com/x")
    assert(c("http://a.com:443/x") == "http://a.com:443/x")
    assert(c("https://a.com:80/x") == "https://a.com:80/x")
    assert(c("ftp://a.com:80/x") == "ftp://a.com:80/x")
  }

  test("fragment strips, empty path becomes /") {
    assert(c("https://a.com#frag") == "https://a.com/")
    assert(c("https://a.com/x#a#b") == "https://a.com/x")
    assert(c("  https://a.com/x  ") == "https://a.com/x")
  }

  test("RFC 3986 dot-segment resolution (stack algorithm)") {
    assert(c("https://a.com/b/c/../d") == "https://a.com/b/d")
    assert(c("https://a.com/./b/./c") == "https://a.com/b/c")
    assert(c("https://a.com/b/../../c") == "https://a.com/c")
    // leading /../ pops nothing (RFC: the output stack is empty)
    assert(c("https://a.com/../b") == "https://a.com/b")
    // trailing /.. and /. keep the directory slash
    assert(c("https://a.com/b/c/..") == "https://a.com/b/")
    assert(c("https://a.com/b/.") == "https://a.com/b/")
    // empty segments are preserved, and .. pops them like any segment
    assert(c("https://a.com/b//../c") == "https://a.com/b/c")
    assert(c("https://a.com/a//b") == "https://a.com/a//b")
  }

  test("tracking params drop by NAME, survivors keep order and text") {
    assert(c("https://a.com/x?utm_source=f&id=3&utm_campaign=c&b=2") ==
      "https://a.com/x?id=3&b=2")
    assert(c("https://a.com/x?gclid=1&fbclid=2&ref=3") == "https://a.com/x")
    // name-anchored: 'reference' is NOT 'ref', 'xref' is not either
    assert(c("https://a.com/x?reference=1&xref=2") ==
      "https://a.com/x?reference=1&xref=2")
    // valueless tracking param still drops; empty params drop
    assert(c("https://a.com/x?ref&a=1&&b") == "https://a.com/x?a=1&b")
  }

  test("non-URL input passes through trim + fragment strip only") {
    assert(c("not a url") == "not a url")
    assert(c("  plain#frag  ") == "plain")
    assert(c("://missing.scheme/x") == "://missing.scheme/x")
    assert(c("1http://bad-scheme.com/x") == "1http://bad-scheme.com/x")
  }

  test("column expression matches the JVM function and is null-safe") {
    val urls = Seq(
      (1L, "https://Example.COM:443/a/../b?utm_source=x&id=1#f"),
      (2L, "HTTP://H.com:80/"),
      (3L, null)).toDF("id", "url")
    val got = urls.select(col("id"),
      UrlCanon.canonicalize_url(col("url")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "https://example.com/b?id=1"),
      (2L, "http://h.com/"),
      (3L, null)))
  }

  test("codegen path stays active (no eval fallback) over a real frame") {
    val df = (0 until 100).map(i => (i.toLong, s"https://S$i.com:443/p/./$i?utm_x=1&k=$i"))
      .toDF("id", "url")
      .select(UrlCanon.canonicalize_url(col("url")).as("c"))
    val rows = df.collect()
    assert(rows.length == 100)
    assert(rows.map(_.getString(0)).forall(s => s.startsWith("https://s") && s.contains("?k=")))
  }
}
