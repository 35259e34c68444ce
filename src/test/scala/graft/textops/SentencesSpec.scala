package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins for [[TextAnalysis.sentences]] — one test per protection rule
  * (the q107 rule set), plus the documented heuristic edges.
  */
class SentencesSpec extends GraftSparkSpec {
  import spark.implicits._

  private def sentsOf(text: String): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.sentences(col("t")).as("s"))
      .collect()(0).getSeq[String](0).toSeq

  test("terminator runs split; terminators drop; elements trim") {
    assert(sentsOf("One. Two! Three?") == Seq("One", "Two", "Three"))
    assert(sentsOf("What?! Really!!") == Seq("What", "Really"))
  }

  test("abbreviation periods do not split and are restored") {
    assert(sentsOf("Dr. Smith met Mr. Jones. They left.") ==
      Seq("Dr. Smith met Mr. Jones", "They left"))
    assert(sentsOf("Acme Inc. shipped. St. Mary vs. the board.") ==
      Seq("Acme Inc. shipped", "St. Mary vs. the board"))
  }

  test("unlisted abbreviation splits (documented closed-list heuristic)") {
    assert(sentsOf("Approx. five left.") == Seq("Approx", "five left"))
  }

  test("decimal points survive, including alternating chains") {
    assert(sentsOf("Pi is 3.14 today. Yes.") == Seq("Pi is 3.14 today", "Yes"))
    // 1.2.3: a single global pass cannot protect the second dot (the
    // scan resumes after the replacement) — the second pass does
    assert(sentsOf("v1.2.3 shipped. Done.") == Seq("v1.2.3 shipped", "Done"))
  }

  test("ellipsis trails off without ending the sentence") {
    assert(sentsOf("Wait... what happened? Go.") ==
      Seq("Wait... what happened", "Go"))
    // a 4th dot is a real terminator after the protected "..."
    assert(sentsOf("Hmm.... next") == Seq("Hmm...", "next"))
  }

  test("e.g. and i.e. survive") {
    assert(sentsOf("Use e.g. apples. Or i.e. fruit.") ==
      Seq("Use e.g. apples", "Or i.e. fruit"))
  }

  test("empty, whitespace, null, and placeholder-char inputs") {
    assert(sentsOf("").isEmpty)
    assert(sentsOf("   ").isEmpty)
    assert(sentsOf(". . ?!").isEmpty)
    // U+0001/U+0002 are the pipeline's placeholders — stripped first,
    // so adversarial input cannot forge a protected period
    assert(sentsOf("a\u0001b. c\u0002d.") == Seq("ab", "cd"))
    val nulls = Seq(Tuple1(null: String)).toDF("t")
      .select(TextAnalysis.sentences(col("t")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(nulls.isEmpty)
  }

  test("terminator-free text is one sentence, trimmed verbatim") {
    assert(sentsOf("  plain word salad with no stops  ") ==
      Seq("plain word salad with no stops"))
  }
}
