package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins q136's markdown serialization rules: header-separator tables,
  * whitespace-preserving code fences, list numbering, inline-tag
  * stripping, comment/script decoy immunity, and document order.
  */
class HtmlStructureSpec extends GraftSparkSpec {
  import spark.implicits._

  private def extract(html: String): Seq[(String, Long, String)] =
    HtmlStructure.structures(
      Seq((1L, html)).toDF("doc_id", "html"), Seq(col("doc_id")), col("html"))
      .select("kind", "struct_idx", "markdown")
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("table with th row gets a header separator; inline tags strip") {
    val md = extract(
      "<table><tr><th>a</th><th>b <b>c</b></th></tr>" +
        "<tr><td>1</td><td>2</td></tr></table>")
    assert(md === Seq(("table", 0L, "| a | b c |\n|---|---|\n| 1 | 2 |")))
  }

  test("headerless table has no separator; multiple tables index in order") {
    val md = extract(
      "<table><tr><td>x</td></tr></table><p>t</p>" +
        "<table><tr><td>y</td><td>z</td></tr></table>")
    assert(md === Seq(
      ("table", 0L, "| x |"),
      ("table", 1L, "| y | z |")))
  }

  test("pre blocks keep internal whitespace, strip inner tags to empty") {
    val md = extract("<pre><code>def f(x):\n    return  x\n</code></pre>")
    assert(md === Seq(("code", 0L, "```\ndef f(x):\n    return  x\n```")))
  }

  test("ul bullets and ol numbering") {
    val md = extract(
      "<ul><li>one</li><li>two <i>em</i></li></ul>" +
        "<ol><li>first</li><li>second</li><li>third</li></ol>")
    assert(md === Seq(
      ("ol", 0L, "1. first\n2. second\n3. third"),
      ("ul", 0L, "- one\n- two em")))
  }

  test("comment and script decoys never extract") {
    val md = extract(
      "<!-- <table><tr><td>no</td></tr></table> -->" +
        "<script>var t = '<ul><li>no</li></ul>';</script>" +
        "<ul><li>yes</li></ul>")
    assert(md === Seq(("ul", 0L, "- yes")))
  }

  test("partitioning invariance") {
    val docs = (0L until 60L).map(i =>
      (i, s"<table><tr><th>h</th></tr><tr><td>v$i</td></tr></table>" +
        s"<ul><li>a$i</li></ul>")).toDF("doc_id", "html")
    def run(p: Int) = HtmlStructure.structures(
      docs.repartition(p), Seq(col("doc_id")), col("html"))
      .as[(Long, String, Long, String)].collect()
      .sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(run(1) === run(7))
  }
}
