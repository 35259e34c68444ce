package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class MainContentSpec extends GraftSparkSpec {
  import spark.implicits._

  private def blocksOf(html: String): Seq[(Long, String, Long, Long, Long, Boolean)] =
    MainContent.blocks(Seq((1L, html)).toDF("id", "html"),
        Seq(col("id")), col("html"))
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(7)))
      .sortBy(_._1).toSeq

  private def mainOf(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(MainContent.mainContent(col("h")).as("m"))
      .collect()(0).getString(0)

  test("block tags segment; inline tags stay inside their block") {
    val bs = blocksOf("<div>alpha beta</div><p>one <b>two</b> three</p>")
    assert(bs.map(b => (b._1, b._2)) ==
      Seq((0L, "alpha beta"), (1L, "one two three")))
  }

  test("p does not shadow pre; param is not a block tag") {
    // <pre> is a block boundary; <param> is NOT (its 'p' prefix must
    // not match the p alternative)
    val bs = blocksOf("<pre>code here</pre><p>x <param name=\"a\"> y</p>")
    assert(bs.map(_._2) == Seq("code here", "x y"))
  }

  test("script/style bodies and comments never reach block text") {
    val bs = blocksOf(
      "<p>keep</p><script>var x = 1;</script><style>.a{}</style><!-- note -->")
    assert(bs.map(_._2) == Seq("keep"))
  }

  test("link density: anchor inner text counts against the block") {
    // block text 'aa bb cc' (8 chars), link text 'bb' (2) -> 2500
    val bs = blocksOf("<div>aa <a href=\"/x\">bb</a> cc</div>")
    val b = bs.head
    assert((b._3, b._5) == (8L, 2L))
    // nested inline markup inside the anchor still counts as link text
    val bs2 = blocksOf("<div>aa <a href=\"/x\"><b>bb</b> dd</a> cc</div>")
    assert(bs2.head._5 == 5L) // "bb dd"
  }

  test("keep rule: short or link-dense blocks drop, body text survives") {
    val html = "<div><a>Home</a> <a>About</a> <a>Contact</a></div>" +
      "<p>this body block carries more than six plain words</p>" +
      "<p>tiny</p>"
    val bs = blocksOf(html)
    assert(bs.map(b => (b._2.take(9), b._6)) ==
      Seq(("Home Abou", false),
        ("this body", true), ("tiny", false)))
    assert(mainOf(html) == "this body block carries more than six plain words")
  }

  test("mainContent joins kept blocks in document order") {
    val html = "<p>first good block with seven words here</p><div><a>nav nav nav</a></div>" +
      "<p>second good block with seven words too</p>"
    assert(mainOf(html) ==
      "first good block with seven words here second good block with seven words too")
  }

  test("null and empty inputs yield no blocks and empty main content") {
    assert(blocksOf("").isEmpty)
    assert(mainOf("") == "")
    val nulls = MainContent.blocks(
      Seq((1L, null: String)).toDF("id", "html"), Seq(col("id")), col("html"))
    assert(nulls.count() == 0)
  }

  test("self-closing and attribute-bearing block tags are boundaries") {
    val bs = blocksOf("alpha<br/>beta<div class=\"x\">gamma</div>")
    assert(bs.map(_._2) == Seq("alpha", "beta", "gamma"))
  }
}
