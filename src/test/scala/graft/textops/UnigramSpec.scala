package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins the [[Unigram]] determinism rules: coverage (every word
  * segments and concatenates back), Viterbi tie-breaking, the
  * prune/score formula, the frequent-substring preference that makes
  * the trainer useful, partitioning invariance of the distributed
  * word-count half, and the refine pass.
  */
class UnigramSpec extends GraftSparkSpec {
  import spark.implicits._

  private def model(corpus: Seq[String], vocab: Int = 60,
      maxLen: Int = 4, iters: Int = 2): Unigram.Model =
    Unigram.train(corpus.toDF("text"), "text", vocabSize = vocab,
      maxPieceLen = maxLen, emIters = iters)

  test("coverage: pieces concatenate back to the marked words") {
    val m = model(Seq("the cat sat", "the mat", "cat cat"))
    for (w <- Seq("the", "cat", "sat", "mat", "zebra?!")) {
      val ps = Unigram.segmentWord(Unigram.Marker + w, m.scoreOf, m.maxLen)
      assert(ps.mkString === Unigram.Marker + w, s"word=$w")
      assert(ps.nonEmpty)
    }
  }

  test("frequent whole words become single pieces") {
    val corpus = Seq.fill(30)("the the the cat").mkString(" ")
    val m = model(Seq(corpus), vocab = 40, maxLen = 4)
    // "▁the" (4 code points) dominates the corpus -> must be a piece,
    // and the Viterbi segmentation of "the" must be exactly it
    assert(m.pieces.contains(Unigram.Marker + "the"))
    val ps = Unigram.segmentWord(Unigram.Marker + "the", m.scoreOf, m.maxLen)
    assert(ps === Array(Unigram.Marker + "the"))
  }

  test("viterbi prefers higher score; exact ties go to the longer piece") {
    val m = new java.util.HashMap[String, java.lang.Double]()
    m.put("a", -1.0); m.put("b", -1.0); m.put("ab", -2.0)
    // "ab": single path scores equal (-2.0): longer last piece wins
    assert(Unigram.segmentWord("ab", m, 2) === Array("ab"))
    m.put("ab", -1.5) // now strictly better
    assert(Unigram.segmentWord("ab", m, 2) === Array("ab"))
    m.put("ab", -2.5) // strictly worse
    assert(Unigram.segmentWord("ab", m, 2) === Array("a", "b"))
  }

  test("unknown single code points segment at UnkScore, never crash") {
    val m = new java.util.HashMap[String, java.lang.Double]()
    m.put("x", -1.0)
    assert(Unigram.segmentWord("x☃x", m, 3) === Array("x", "☃", "x"))
  }

  test("segmentText: whitespace split + marker, empties skipped") {
    val m = model(Seq("ab ab"))
    val ps = Unigram.segmentText(" ab\t ab\n", m.scoreOf, m.maxLen)
    assert(ps.mkString === Unigram.Marker + "ab" + Unigram.Marker + "ab")
  }

  test("score formula: log(effective count / total), singles floored") {
    // one word "aa" x3: seed counts ▁=3, a=6, aa=3, ▁a=3, ▁aa=3, ...
    val m = model(Seq("aa aa aa"), vocab = 10, maxLen = 3, iters = 0)
    m.pieces.zip(m.scores).foreach { case (p, sc) =>
      assert(sc < 0.0, s"$p has non-negative log-prob")
    }
    assert(math.abs(m.scores.map(Math.exp).sum - 1.0) < 1e-9,
      "kept probabilities must sum to 1")
  }

  test("partitioning invariance: 1-partition vs 7-partition training") {
    val corpus = (0 until 200).map(i => s"doc $i word${i % 7} tail common common")
    val a = Unigram.train(corpus.toDF("text").repartition(1), "text", 80, 4, 2)
    val b = Unigram.train(corpus.toDF("text").repartition(7), "text", 80, 4, 2)
    assert(a.pieces.toSeq === b.pieces.toSeq)
    assert(a.scores.toSeq === b.scores.toSeq)
  }

  test("refineCounts at unbound maxWords reproduces an M-step fixpoint shape") {
    val corpus = Seq("the cat sat on the mat", "the cat", "a cat sat")
    val df = corpus.toDF("text")
    val m0 = Unigram.train(df, "text", vocabSize = 50, maxPieceLen = 4, emIters = 2)
    val m1 = Unigram.refineCounts(spark, df, "text", m0, vocabSize = 50)
    // refine may shrink (zero-count multis drop) but never grows, all
    // singles survive, and scores stay normalized
    assert(m1.pieces.length <= m0.pieces.length)
    val singles0 = m0.pieces.filter(p => p.codePointCount(0, p.length) == 1).toSet
    val singles1 = m1.pieces.filter(p => p.codePointCount(0, p.length) == 1).toSet
    assert(singles0 === singles1)
    assert(math.abs(m1.scores.map(Math.exp).sum - 1.0) < 1e-9)
    // a second refine under the refined model is a fixpoint: the
    // segmentations it counts are produced by the same scores
    val m2 = Unigram.refineCounts(spark, df, "text", m1, vocabSize = 50)
    val m3 = Unigram.refineCounts(spark, df, "text", m2, vocabSize = 50)
    assert(m2.pieces.toSeq === m3.pieces.toSeq)
    assert(m2.scores.toSeq === m3.scores.toSeq)
  }

  test("unigram_segment expression matches driver segmentText (codegen path)") {
    val corpus = Seq("the cat sat on the mat", "cats eat fish", "", " \t ")
    val df = corpus.toDF("text")
    val m = Unigram.train(df, "text", vocabSize = 60, maxPieceLen = 4, emIters = 2)
    val got = df.select(
      Unigram.unigram_segment(spark, coalesce(col("text"), lit("")), m).as("ps"))
      .collect().map(_.getSeq[String](0).toList)
    val want = corpus.map(t => Unigram.segmentText(t, m.scoreOf, m.maxLen).toList)
    assert(got.toSeq === want)
  }
}
