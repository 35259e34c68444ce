package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class DriftReportSpec extends GraftSparkSpec {
  import spark.implicits._

  private def run(prev: Seq[String], cur: Seq[String]) =
    DriftReport.shareDrift(
      prev.toDF("key").repartition(3), cur.toDF("key").repartition(4), "key")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap

  test("shares, deltas, and PSI terms over a shifted mix") {
    // prev: a=50%, b=50%; cur: a=25%, b=50%, c=25%
    val got = run(
      Seq.fill(10)("a") ++ Seq.fill(10)("b"),
      Seq.fill(5)("a") ++ Seq.fill(10)("b") ++ Seq.fill(5)("c"))
    val a = got("a")
    assert(a._1 === 10L && a._2 === 5L)
    assert(a._3 === 5000L && a._4 === 2500L && a._5 === -2500L)
    // (0.25 - 0.5) * ln(0.25/0.5) = 0.1733
    assert(math.abs(a._6 - 0.1733) < 1e-9)
    val b = got("b")
    assert(b._5 === 0L && b._6 === 0.0)
    // a born key clips its prev share to the 1/10000 floor
    val c = got("c")
    assert(c._1 === 0L && c._3 === 0L && c._4 === 2500L)
    val expectC = (0.25 - 0.0001) * math.log(2500.0 / 1.0)
    assert(math.abs(c._6 - BigDecimal(expectC)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("a vanished key screams with a positive PSI term") {
    val got = run(Seq.fill(8)("a") ++ Seq.fill(8)("gone"), Seq.fill(8)("a"))
    val g = got("gone")
    assert(g._2 === 0L && g._4 === 0L)
    assert(g._6 > 4.0, s"vanishing 50% share must dominate PSI (got ${g._6})")
    assert(got("a")._4 === 10000L)
  }

  test("partitioning-insensitive") {
    val p = (1 to 100).map(i => s"k${i % 7}")
    val c = (1 to 90).map(i => s"k${i % 5}")
    def go(parts: Int) = DriftReport.shareDrift(
      p.toDF("key").repartition(parts), c.toDF("key").repartition(parts), "key")
      .collect().map(_.toSeq).toSet
    assert(go(1) === go(13))
  }
}
