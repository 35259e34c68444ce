package graft.textops

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.GraftSparkSpec

class EditDistanceSpec extends GraftSparkSpec {
  import spark.implicits._

  /** Unbounded reference DP. */
  private def refLev(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  private def bl(a: String, b: String, maxD: Int): Long =
    EditDistance.boundedLev(
      UTF8String.fromString(a), UTF8String.fromString(b), maxD)

  test("banded distance equals the reference when <= maxD, saturates above") {
    val rnd = new scala.util.Random(5)
    val alpha = "abcd"
    val words = Seq.fill(200)(
      (0 until (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(4))).mkString)
    for (a <- words.take(40); b <- words.take(40); maxD <- 0 to 3) {
      val exact = refLev(a, b)
      val got = bl(a, b, maxD)
      if (exact <= maxD) assert(got == exact.toLong, s"($a,$b,$maxD)")
      else assert(got == (maxD + 1).toLong, s"($a,$b,$maxD) exact=$exact")
    }
  }

  test("edges: empty strings, equal strings, transposition costs 2") {
    assert(bl("", "", 1) == 0L)
    assert(bl("", "ab", 1) == 2L)   // saturated: distance 2 > 1
    assert(bl("", "ab", 2) == 2L)
    assert(bl("same", "same", 0) == 0L)
    assert(bl("ab", "ba", 1) == 2L) // Levenshtein, not Damerau
    assert(bl("ab", "ba", 2) == 2L)
  }

  test("deletionSigs: the string plus each single deletion; empty handled") {
    val sigs = Seq(Tuple1("abc")).toDF("s")
      .select(EditDistance.deletionSigs(col("s")).as("g"))
      .collect()(0).getSeq[String](0)
    assert(sigs == Seq("abc", "bc", "ac", "ab"))
    val empty = Seq(Tuple1("")).toDF("s")
      .select(EditDistance.deletionSigs(col("s")).as("g"))
      .collect()(0).getSeq[String](0)
    assert(empty == Seq(""))
  }

  test("join finds substitution, insertion, deletion twins; not distance 2") {
    val rows = Seq(
      (1L, "report alpha"), (2L, "repart alpha"), // substitution
      (3L, "report alphas"),                      // insertion vs 1
      (4L, "reprt alpha"),                        // deletion vs 1
      (5L, "rxpxrt alpha"),                       // distance 2 from 1
      (6L, "unrelated title")).toDF("id", "s")
    val got = EditDistance.editSimilarityJoin(rows, col("id"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)) &&
      got.contains((1L, 4L, 1L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
    // completeness on this fixture: exactly the reference brute-force set
    val brute = (for {
      a <- Seq((1L, "report alpha"), (2L, "repart alpha"), (3L, "report alphas"),
        (4L, "reprt alpha"), (5L, "rxpxrt alpha"), (6L, "unrelated title"))
      b <- Seq((1L, "report alpha"), (2L, "repart alpha"), (3L, "report alphas"),
        (4L, "reprt alpha"), (5L, "rxpxrt alpha"), (6L, "unrelated title"))
      if a._1 < b._1 && refLev(a._2, b._2) <= 1
    } yield (a._1, b._1, refLev(a._2, b._2).toLong)).toSet
    assert(got == brute)
  }

  test("bucket cap drops degenerate buckets whole") {
    val dupes = (1L to 20L).map(i => (i, "same exact title")).toDF("id", "s")
    assert(EditDistance.editSimilarityJoin(dupes, col("id"), col("s"),
      bucketCap = 10).count() == 0)
    // under the cap the identical strings pair at distance 0
    assert(EditDistance.editSimilarityJoin(dupes, col("id"), col("s"),
      bucketCap = 100).count() == 20L * 19 / 2)
  }

  test("randomized duel: join output equals brute force over a typo soup") {
    val rnd = new scala.util.Random(13)
    val alpha = "abcde"
    val strs = (1L to 120L).map { i =>
      val base = (0 until 6 + rnd.nextInt(4)).map(_ => alpha(rnd.nextInt(5))).mkString
      (i, base)
    }
    val got = EditDistance.editSimilarityJoin(
      strs.toDF("id", "s"), col("id"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      a <- strs; b <- strs
      if a._1 < b._1 && refLev(a._2, b._2) <= 1
    } yield (a._1, b._1, refLev(a._2, b._2).toLong)).toSet
    assert(got == brute)
  }
}
