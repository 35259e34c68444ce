package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.GraftSparkSpec

/** Bloom filter (Bloom): the no-false-negatives contract, definite
  * negatives at low load, Scala/Column bit agreement, merge/
  * partitioning/duplication invariance, and equality with an
  * independent set-bit reference recompute (false positives included).
  */
class BloomSpec extends GraftSparkSpec {
  import spark.implicits._

  private def corpus(n: Int): Seq[String] = (0 until n).map(i => s"doc-${i % 211}")

  test("scala bit and column bits agree") {
    val vals = Seq("alpha", "beta", "doc-0", "ünïcode", "")
    val k = 5
    val m = 4096
    val gotCol = vals.toDF("v")
      .select(col("v") +: Bloom.bitCols(col("v"), m, k)
        .zipWithIndex.map { case (c, i) => c.as(s"b$i") }: _*)
      .collect().map(r => (r.getString(0), (1 to k).map(r.getLong))).toMap
    vals.foreach { v =>
      val want = (0 until k).map(i => Bloom.bit(i, UTF8String.fromString(v), m).toLong)
      assert(gotCol(v) == want, s"bit mismatch for '$v'")
    }
  }

  test("no false negatives ever; absent keys definite-negative at low load") {
    val present = corpus(1000)
    val absent = (0 until 50).map(i => s"zzz-absent-$i")
    val got = Bloom.mightContainProbes(
      present.toDF("v").repartition(7), col("v"),
      (present.distinct ++ absent).toDF("p"), "p", m = 1 << 16, k = 5)
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    present.distinct.foreach(p => assert(got(p), s"false negative for $p"))
    // 211 distinct keys * 5 bits in 65536: load ~1.6%, FPR ~(0.016)^5;
    // one false positive among 50 absent probes would be a miracle —
    // and the oracle-checked contract is exact equality anyway
    absent.foreach(p => assert(!got(p), s"false positive for $p at trivial load"))
  }

  test("sketch is invariant to partitioning, row order, and duplication") {
    val base = corpus(2000)
    def sketch(vs: Seq[String], parts: Int): Seq[Long] =
      vs.toDF("v").repartition(parts)
        .agg(Bloom.bloom(col("v"), 1024, 4).as("sk"))
        .collect().head.getSeq[Long](0)
    val ref = sketch(base, 2)
    assert(ref == sketch(scala.util.Random.shuffle(base), 19))
    // set-bits are idempotent: duplicating the corpus changes nothing
    assert(ref == sketch(base ++ base, 5))
  }

  test("might_contain equals an independent set-bit reference recompute") {
    val vs = corpus(300)
    val m = 256 // force real false positives
    val k = 3
    val setBits: Set[Int] = vs.distinct
      .flatMap(v => (0 until k).map(i => Bloom.bit(i, UTF8String.fromString(v), m)))
      .toSet
    def refContains(p: String): Boolean =
      (0 until k).forall(i => setBits(Bloom.bit(i, UTF8String.fromString(p), m)))
    val probes = vs.distinct.take(20) ++ (0 until 200).map(i => s"probe-$i")
    val got = Bloom.mightContainProbes(
      vs.toDF("v").repartition(5), col("v"), probes.toDF("p"), "p", m, k)
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    probes.foreach(p => assert(got(p) == refContains(p), s"$p: ${got(p)}"))
    // at this load the reference must produce BOTH answers, or the
    // equality above proves nothing
    assert(probes.exists(refContains), "no positive probe in fixture")
    assert(probes.exists(p => !refContains(p)), "no negative probe in fixture")
  }

  test("null values are ignored") {
    val got = Bloom.mightContainProbes(
      Seq(Some("a"), None, None).toDF("v"), col("v"),
      Seq("a").toDF("p"), "p", 64, 2)
      .collect().head.getBoolean(1)
    assert(got)
  }
}
