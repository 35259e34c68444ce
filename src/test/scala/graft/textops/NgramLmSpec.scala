package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Bigram-LM training counts and scoring semantics: hand-computed
  * probabilities on a tiny corpus, invariants of the smoothed model,
  * and the fluent-text-scores-lower property the quality signal
  * exists for.
  */
class NgramLmSpec extends GraftSparkSpec {
  import spark.implicits._

  private def model(texts: Seq[String], vocabSize: Int = 4096): NgramLm.Model =
    NgramLm.train(texts.map(Tuple1(_)).toDF("text"), "text", vocabSize = vocabSize)

  private def score(m: NgramLm.Model, text: String): (Long, Double, Double) = {
    val r = Seq(Tuple1(text)).toDF("text")
      .select(NgramLm.lm_score(spark, col("text"), m).as("s"))
      .select("s.*").collect().head
    (r.getLong(0), r.getDouble(1), r.getDouble(2))
  }

  test("training counts: vocab by count desc then token asc; context totals consistent") {
    val m = model(Seq("a b a", "B a"))
    // lowered tokens: a:3, b:2
    assert(m.vocab.toSeq == Seq("a", "b"))
    assert(m.unigram.toSeq == Seq(3L, 2L))
    assert(m.total == 5L && m.unkCount == 0L)
    // bigrams: <s>a, ab, ba, <s>b(from "B a"-> b a: <s>b, ba)
    // per doc1: (<s>,a) (a,b) (b,a); doc2: (<s>,b) (b,a)
    assert(m.bigramCount(m.startId, 0) == 1L) // <s> a
    assert(m.bigramCount(m.startId, 1) == 1L) // <s> b
    assert(m.bigramCount(0, 1) == 1L) // a b
    assert(m.bigramCount(1, 0) == 2L) // b a
    // context totals = sum of outgoing bigram counts
    assert(m.contextCounts(m.startId) == 2L)
    assert(m.contextCounts(0) == 1L && m.contextCounts(1) == 2L)
  }

  test("score matches the hand-evaluated smoothing formula") {
    val m = model(Seq("a b a", "b a"))
    // V=2, total=5, alpha=1. pu(a)=(3+1)/(5+2+1)=0.5, pu(b)=(2+1)/8=0.375
    // doc "a b": p(a|<s>)=(1+0.5)/(2+1)=0.5; p(b|a)=(1+0.375)/(1+1)=0.6875
    val expNll = -(math.log(0.5) + math.log((1 + 0.375) / 2.0))
    val (n, avg, ppl) = score(m, "a b")
    assert(n == 2L)
    assert(math.abs(avg - expNll / 2) < 1e-12)
    assert(math.abs(ppl - math.exp(expNll / 2)) < 1e-12)
  }

  test("empty and whitespace docs score (0, 0.0, 1.0); unseen tokens fold to unk") {
    val m = model(Seq("a b a", "b a"), vocabSize = 1) // vocab = [a], b -> unk
    assert(score(m, "") == ((0L, 0.0, 1.0)))
    assert(score(m, " \t\n ") == ((0L, 0.0, 1.0)))
    assert(m.unkCount == 2L && m.vocab.toSeq == Seq("a"))
    // scoring an OOV token works (goes through unk counts)
    val (n, avg, _) = score(m, "zzz")
    assert(n == 1L && avg > 0.0)
  }

  test("fluent text scores lower perplexity than gibberish") {
    val train = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog")
    val m = model(train)
    val (_, _, fluent) = score(m, "the quick brown fox jumps over the lazy dog")
    val (_, _, gibberish) = score(m, "dog the over fox quick zzz qqq lazy brown")
    assert(fluent < gibberish,
      s"fluent ppl $fluent must be below gibberish ppl $gibberish")
  }

  test("probabilities sum to 1 over vocab+unk for seen and unseen contexts") {
    val m = model(Seq("a b c a b", "c a"))
    for (ctx <- 0 to m.startId) {
      val sum = (0 to m.unkId).map { w =>
        (m.bigramCount(ctx, w) + m.alpha * m.pUnigram(w)) /
          (m.contextCounts(ctx) + m.alpha)
      }.sum
      assert(math.abs(sum - 1.0) < 1e-12, s"ctx=$ctx sums to $sum")
    }
  }

  test("oversized bigram table fails loudly before collect") {
    val docs = (0 until 60).map(i =>
      Tuple1((0 until 40).map(j => s"t${i}_$j").mkString(" "))).toDF("text")
    val e = intercept[IllegalArgumentException] {
      NgramLm.train(docs, "text", maxBigrams = 100)
    }
    assert(e.getMessage.contains("maxBigrams"))
  }

  // ---- trigram stupid backoff ----

  private def model3(texts: Seq[String], vocabSize: Int = 4096): NgramLm.TrigramModel =
    NgramLm.trainTrigram(texts.map(Tuple1(_)).toDF("text"), "text",
      vocabSize = vocabSize)

  private def score3(m: NgramLm.TrigramModel, text: String): (Long, Double, Double) = {
    val r = Seq(Tuple1(text)).toDF("text")
      .select(NgramLm.lm_score3(spark, col("text"), m).as("s"))
      .select("s.*").collect().head
    (r.getLong(0), r.getDouble(1), r.getDouble(2))
  }

  test("trigram counts: packed tables and context totals are consistent") {
    val m = model3(Seq("a b a b", "a b c"))
    // ids: a=0, b=1, c=2 (counts a:3 b:3 c:1 -> desc, tie a<b)
    val S = m.startId
    // doc1 trigrams: (S,S,a) (S,a,b) (a,b,a) (b,a,b)
    // doc2:          (S,S,a) (S,a,b) (a,b,c)
    assert(m.c3(S, S, 0) == 2L)
    assert(m.c3(S, 0, 1) == 2L)
    assert(m.c3(0, 1, 0) == 1L && m.c3(0, 1, 2) == 1L)
    assert(m.c2ctx(S, S) == 2L && m.c2ctx(0, 1) == 2L)
    // bigram level shares the q64 packing
    assert(m.c2(0, 1) == 3L && m.c2(1, 0) == 1L && m.c2(1, 2) == 1L)
    assert(m.contextCounts(0) == 3L)
  }

  test("trigram score replays the backoff chain exactly") {
    val m = model3(Seq("a b a b", "a b c"))
    val S = m.startId
    // "a b a": t1 a|S,S = 2/2; t2 b|S,a -> c3(S,a,b)=2, ctx2=2 -> 1.0
    //          t3 a|a,b -> c3(a,b,a)=1, c2ctx(a,b)=2 -> 0.5
    val exp1 = -(math.log(1.0) + math.log(1.0) + math.log(0.5)) / 3
    val (n1, avg1, _) = score3(m, "a b a")
    assert(n1 == 3L && math.abs(avg1 - exp1) < 1e-12)
    // "c c": trigram (S,S,c) unseen -> 0.4 * S(c|S): bigram (S,c)
    // unseen -> 0.4 * 0.4 * pu(c); pu(c) = (1+1)/(7+3+1)
    val puC = 2.0 / 11.0
    val s1 = 0.4 * 0.4 * puC
    // then (S,c,c) unseen -> 0.4 * S(c|c): (c,c) unseen -> 0.4*0.4*pu(c)
    val exp2 = -(math.log(s1) + math.log(s1)) / 2
    val (n2, avg2, _) = score3(m, "c c")
    assert(n2 == 2L && math.abs(avg2 - exp2) < 1e-12)
  }

  test("trigram model prefers its training patterns over shuffled ones") {
    val fluent = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog")
    val m = model3(fluent)
    val (_, good, _) = score3(m, "the quick brown fox jumps")
    val (_, bad, _) = score3(m, "fox the jumps quick brown")
    assert(good < bad)
  }

  test("trigram: empty docs and bound violations behave like the bigram family") {
    val m = model3(Seq("a b"))
    assert(score3(m, "") == ((0L, 0.0, 1.0)))
    val e = intercept[IllegalArgumentException] {
      NgramLm.trainTrigram(
        Seq.tabulate(40)(i => s"w$i x$i y$i z$i").map(Tuple1(_)).toDF("text"),
        "text", maxNgrams = 3)
    }
    assert(e.getMessage.contains("distinct"))
  }
}
