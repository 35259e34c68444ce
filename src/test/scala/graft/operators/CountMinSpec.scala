package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.GraftSparkSpec

/** Count-min sketch (CountMin): the one-sided error contract
  * (est >= exact), the collision-free exact regime, Scala/Column
  * bucket agreement, merge/partitioning invariance, and equality with
  * an independent reference recompute.
  */
class CountMinSpec extends GraftSparkSpec {
  import spark.implicits._

  private def corpus(n: Int): Seq[String] =
    (0 until n).map(i => s"w${i % 37}") ++ Seq.fill(200)("hot")

  test("scala bucket and column bucket agree") {
    val vals = Seq("alpha", "beta", "hot", "w0", "ünïcode")
    val gotCol = vals.toDF("v")
      .select(col("v"), CountMin.bucket_col(3, col("v"), 512).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    vals.foreach { v =>
      assert(gotCol(v) == CountMin.bucket(3, UTF8String.fromString(v), 512).toLong,
        s"bucket mismatch for $v")
    }
  }

  test("estimates are never below the exact counts; exact when collision-free") {
    val df = corpus(1000).toDF("v").repartition(7)
    val probes = Seq("hot", "w0", "w36", "never-seen").toDF("p")
    val got = CountMin.estimateProbes(df, col("v"), probes, "p",
      depth = 4, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = corpus(1000).groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((p, est) <- got if p != "never-seen")
      assert(est >= exact(p), s"$p: est $est below exact ${exact(p)}")
    // 38 distinct keys in width 4096 x 4 rows: a collision in EVERY
    // row is essentially impossible, so min over rows is exact
    assert(got("hot") == exact("hot"))
    assert(got("w0") == exact("w0"))
    assert(got("never-seen") == 0L)
  }

  test("sketch is invariant to partitioning and row order") {
    val base = corpus(2000)
    def sketch(vs: Seq[String], parts: Int): Seq[Long] =
      vs.toDF("v").repartition(parts)
        .agg(CountMin.cms(col("v"), 4, 256).as("sk"))
        .collect().head.getSeq[Long](0)
    assert(sketch(base, 2) == sketch(scala.util.Random.shuffle(base), 19))
  }

  test("estimate equals an independent reference recompute") {
    val vs = corpus(500)
    val depth = 3
    val width = 64 // force real collisions
    val exact = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def refEst(p: String): Long =
      (0 until depth).map { d =>
        val b = CountMin.bucket(d, UTF8String.fromString(p), width)
        exact.collect {
          case (v, c) if CountMin.bucket(d, UTF8String.fromString(v), width) == b => c
        }.sum
      }.min
    val probes = Seq("hot", "w1", "w17").toDF("p")
    val got = CountMin.estimateProbes(
      vs.toDF("v").repartition(5), col("v"), probes, "p", depth, width)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for ((p, est) <- got) assert(est == refEst(p), s"$p: $est != ${refEst(p)}")
  }

  test("null values are ignored") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("v")
    val got = CountMin.estimateProbes(df, col("v"), Seq("a").toDF("p"), "p", 2, 32)
      .collect().head.getLong(1)
    assert(got == 2L)
  }
}
