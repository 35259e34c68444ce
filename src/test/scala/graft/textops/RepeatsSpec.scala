package graft.textops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.GraftSparkSpec

/** Pins [[Repeats.longestRepeat]]: classic known answers, overlap
  * semantics, a brute-force duel on random small strings, adversarial
  * single-char runs, and the codegen path.
  */
class RepeatsSpec extends GraftSparkSpec {

  /** n deterministic samples of gen (the PropertySpec helper). */
  private def forAll[A](gen: Gen[A], n: Int = 60)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  test("known answers") {
    assert(Repeats.longestRepeat("") === 0)
    assert(Repeats.longestRepeat("a") === 0)
    assert(Repeats.longestRepeat("ab") === 0)
    assert(Repeats.longestRepeat("aa") === 1)
    assert(Repeats.longestRepeat("banana") === 3) // "ana" overlapping
    assert(Repeats.longestRepeat("aaaa") === 3) // overlaps allowed
    assert(Repeats.longestRepeat("abcd efg abcd") === 4) // "abcd" twice
    assert(Repeats.longestRepeat("xyxyxy") === 4) // "xyxy" at 0 and 2
  }

  private def brute(s: String): Int = {
    val n = s.length
    (for {
      len <- (n - 1) to 1 by -1
      i <- 0 to n - len
      j <- (i + 1) to (n - len)
      if s.regionMatches(i, s, j, len)
    } yield len).headOption.getOrElse(0)
  }

  test("brute-force duel on random small strings") {
    val gen = for {
      n <- Gen.choose(0, 24)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    forAll(gen) { s => assert(Repeats.longestRepeat(s) === brute(s)) }
  }

  test("adversarial single-char run stays fast and exact") {
    val s = "z" * 5000
    assert(Repeats.longestRepeat(s) === 4999)
  }

  test("expression (codegen path) matches the driver function") {
    import spark.implicits._
    val rows = Seq("", "banana", "aaaa", "copy paste copy paste", "unique words")
    val got = rows.toDF("t")
      .select(Repeats.longest_repeat(col("t")).as("r"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === rows.map(Repeats.longestRepeat))
  }
}
