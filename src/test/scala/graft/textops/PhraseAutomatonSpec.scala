package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Aho–Corasick matcher semantics: overlapping end-position counts,
  * failure-link correctness on adversarial suffix structure, case
  * folding, large dictionaries, and an independent brute-force
  * reference.
  */
class PhraseAutomatonSpec extends GraftSparkSpec {
  import spark.implicits._

  private def run(patterns: Seq[String], texts: Seq[String]): Seq[(Long, Long)] = {
    val auto = PhraseAutomaton.build(patterns)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        PhraseAutomaton.ac_match(spark, col("text"), auto).as("m"))
      .orderBy("id")
      .select(PhraseAutomaton.ac_hits(col("m")),
        PhraseAutomaton.ac_distinct(col("m")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  /** Brute-force reference: for each pattern, count every (possibly
    * overlapping) occurrence by scanning all start positions.
    */
  private def brute(patterns: Seq[String], text: String): (Long, Long) = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val counts = patterns.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.map { p =>
      (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length))
    }
    (counts.map(_.toLong).sum, counts.count(_ > 0).toLong)
  }

  test("overlapping occurrences count by end position") {
    // "aa" in "aaaa": ends at 1,2,3 -> 3 hits
    assert(run(Seq("aa"), Seq("aaaa")) == Seq((3L, 1L)))
    // self-overlap via failure links: "aba" in "ababa" -> 2
    assert(run(Seq("aba"), Seq("ababa")) == Seq((2L, 1L)))
  }

  test("failure links: a pattern inside another, and shared suffixes") {
    // matching "she" must also report "he" (suffix), the classic AC case
    val got = run(Seq("he", "she", "his", "hers"), Seq("ushers"))
    // "ushers": she@3, he@3, hers@5 -> 3 hits, 3 distinct patterns
    assert(got == Seq((3L, 3L)))
    assert(brute(Seq("he", "she", "his", "hers"), "ushers") == ((3L, 3L)))
  }

  test("case folding, misses, empties, nulls") {
    assert(run(Seq("Spark SQL"), Seq("uses spark sql daily")) == Seq((1L, 1L)))
    assert(run(Seq("zzz"), Seq("no match here")) == Seq((0L, 0L)))
    assert(run(Seq("x"), Seq("")) == Seq((0L, 0L)))
    val auto = PhraseAutomaton.build(Seq("x"))
    val r = Seq(Option.empty[String]).toDF("text")
      .select(PhraseAutomaton.ac_match(spark, col("text"), auto).as("m"))
      .collect().head
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException](PhraseAutomaton.build(Nil))
    intercept[IllegalArgumentException](PhraseAutomaton.build(Seq("ok", "")))
  }

  test("matches the brute-force reference on randomized-ish structured input") {
    // deterministic adversarial soup over a tiny alphabet: maximal
    // failure-link traffic
    val pats = Seq("ab", "aab", "bba", "abab", "ba", "aaa", "babb")
    val texts = (0 until 20).map { i =>
      Iterator.iterate(i * 2654435761L)(x => x * 6364136223846793005L + 1442695040888963407L)
        .take(60).map(x => if (((x >>> 33) & 1) == 0) 'a' else 'b').mkString
    }
    val got = run(pats, texts)
    val want = texts.map(t => brute(pats, t))
    assert(got == want)
  }

  test("large dictionary: 20k patterns, one pass, correct spot checks") {
    val pats = (0 until 20000).map(i => s"term${i}x")
    val auto = PhraseAutomaton.build(pats)
    val got = Seq((1L, "has term17x and term19999x and term17x again"),
        (2L, "no dictionary words at all"))
      .toDF("id", "text")
      .select(col("id"), PhraseAutomaton.ac_match(spark, col("text"), auto).as("m"))
      .orderBy("id")
      .select(PhraseAutomaton.ac_hits(col("m")),
        PhraseAutomaton.ac_distinct(col("m")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 2L), (0L, 0L)))
  }
}
