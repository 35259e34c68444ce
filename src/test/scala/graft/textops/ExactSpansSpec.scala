package graft.textops

import graft.GraftSparkSpec

/** Pins [[SpanDedup.exactSpans]]' boundary exactness (the q132
  * contract): maximal duplicated runs come back with precise 0-based
  * token offsets regardless of k-misaligned placement, sub-k shared
  * runs never report, within-doc repeats report their later
  * occurrence, and nearby spans merge iff their duplicated windows
  * chain within k.
  */
class ExactSpansSpec extends GraftSparkSpec {
  import spark.implicits._

  private val k = 8

  private def spans(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, String)]] =
    SpanDedup.exactSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq).toMap

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("k-misaligned verbatim copy recovers exact boundaries") {
    val a = words("a", 60)
    val copy = a.slice(5, 28) // 23 tokens at source offset 5
    val b = words("j", 3) ++ copy ++ words("z", 4) // copier offset 3
    val got = spans(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
    assert(!got.contains(1L), "source doc must keep its first occurrence")
    assert(got(2L) === Seq((3L, 23L, copy.mkString(" "))))
  }

  test("exactly-k shared run reports length k; k-1 does not report") {
    val a = words("p", 40)
    val hit = a.slice(10, 10 + k)
    val miss = a.slice(25, 25 + k - 1)
    val b = words("q", 5) ++ hit ++ words("r", 5) ++ miss ++ words("s", 5)
    val got = spans(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
    assert(got(2L) === Seq((5L, k.toLong, hit.mkString(" "))))
  }

  test("within-doc repeat reports the later occurrence only") {
    val run = words("w", 10)
    val doc = run ++ words("x", 6) ++ run
    val got = spans(Seq(1L -> doc.mkString(" ")))
    assert(got(1L) === Seq((16L, 10L, run.mkString(" "))))
  }

  test("two copies split by > k unique tokens stay two spans; <= k-gap merges") {
    val a = words("m", 60)
    val c1 = a.slice(0, 10)
    val c2 = a.slice(30, 40)
    val far = words("u", k + 4) // window-position gap > k
    val b = c1 ++ far ++ c2
    val got = spans(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
    assert(got(2L).map(s => (s._1, s._2)) ===
      Seq((0L, 10L), (10L + k + 4L, 10L)))
  }

  test("case-insensitive: copies differing only by case still match, text lowers") {
    val a = words("c", 30)
    val b = words("y", 2) ++ a.slice(3, 15).map(_.toUpperCase)
    val got = spans(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
    assert(got(2L) === Seq((2L, 12L, a.slice(3, 15).mkString(" "))))
  }

  test("partitioning invariance") {
    val docs = (0L until 80L).map { i =>
      val base = words(s"t${i % 7}_", 30)
      i -> (words(s"u$i", (i % 5).toInt) ++ base).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    def run(parts: Int) =
      SpanDedup.exactSpans(df.repartition(parts), "doc_id", "text", k)
        .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) === run(13))
  }
}
