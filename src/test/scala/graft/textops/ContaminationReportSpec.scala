package graft.textops

import graft.GraftSparkSpec

class ContaminationReportSpec extends GraftSparkSpec {
  import spark.implicits._

  private def run(corpus: Seq[(Long, String)], evals: Seq[(Long, String)]) =
    SpanDedup.contaminationReport(
      corpus.toDF("doc_id", "text").repartition(3),
      "doc_id", "text",
      evals.toDF("eval_id", "text"), "eval_id", "text", k = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))))
      .toMap

  private val probe = "alpha beta gamma delta epsilon" // 5 tokens -> 2 windows

  test("a fully-leaked eval doc reports 10000 and counts its hosts") {
    val corpus = Seq(
      1L -> s"intro words here $probe trailing",
      2L -> s"$probe",
      3L -> "unrelated content entirely different words")
    val got = run(corpus, Seq(10L -> probe))
    assert(got(10L) == ((2L, 2L, 2L, 10000L)))
  }

  test("partial leaks report the distinct-window fraction") {
    // eval doc: 6 tokens -> 3 windows; corpus contains only the first 4
    val corpus = Seq(1L -> "alpha beta gamma delta filler filler2")
    val got = run(corpus, Seq(10L -> "alpha beta gamma delta epsilon zeta"))
    assert(got(10L) == ((3L, 1L, 1L, 3333L)))
  }

  test("unleaked and too-short eval docs report zeros") {
    val corpus = Seq(1L -> "nothing matching at all in this corpus")
    val got = run(corpus,
      Seq(10L -> "completely absent benchmark question text",
        11L -> "too short"))
    assert(got(10L) == ((2L, 0L, 0L, 0L)))
    assert(got(11L) == ((0L, 0L, 0L, 0L)))
  }

  test("duplicate windows count once; matching is case-insensitive") {
    val corpus = Seq(1L -> s"ALPHA BETA GAMMA DELTA and $probe again $probe")
    val got = run(corpus, Seq(10L -> probe))
    assert(got(10L) == ((2L, 2L, 1L, 10000L)))
  }
}
