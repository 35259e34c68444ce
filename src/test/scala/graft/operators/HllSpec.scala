package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class HllSpec extends GraftSparkSpec {
  import spark.implicits._

  /** Independent reference: md5-hex → 60-bit hash (the
    * [[DistinctSketch.hash60]] contract), registers, and the integer
    * estimator — own loops, java.security MessageDigest, BigInt
    * division; no Spark involved.
    */
  private def refEstimate(values: Seq[String]): (Long, Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = new Array[Long](64)
    values.foreach { v =>
      val hex = md.digest(v.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      md.reset()
      val h = java.lang.Long.parseLong(hex, 16)
      val reg = (h % 64).toInt
      val rest = h / 64
      val rho =
        if (rest == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > regs(reg)) regs(reg) = rho
    }
    val nHit = regs.count(_ > 0).toLong
    val maxRho = regs.max
    val t = regs.map(m => BigInt(1) << (55 - m.toInt)).sum
    val est = (BigInt(Hll.estNumerator) / t).toLong
    (nHit, maxRho, est)
  }

  private def run(values: Seq[(String, String)], parts: Int = 4) =
    Hll.estimateByKey(
      values.toDF("k", "v").repartition(parts), Seq(col("k")), col("v"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("registers and estimator match an independent recomputation exactly") {
    val vals = (1 to 5000).map(i => s"token-$i")
    val (nHit, maxRho, est) = refEstimate(vals)
    val got = run(vals.map("a" -> _))("a")
    assert(got == ((5000L, nHit, maxRho, est)))
  }

  test("estimate is within HLL's expected error of the true cardinality") {
    // m = 64 -> standard error 1.04/8 = 13%; 10k distinct values,
    // assert within 3 sigma (raw-formula regime, no linear counting)
    val n = 10000
    val got = run((1 to n).map(i => "k" -> s"value-$i"))("k")
    val est = got._4 / 1000.0
    assert(math.abs(est - n) / n < 0.39, s"est $est vs true $n")
  }

  test("duplicates do not move the sketch; n_values counts every row") {
    val uniq = (1 to 500).map(i => "k" -> s"u$i")
    val base = run(uniq)("k")
    val dup = run(uniq ++ uniq ++ uniq)("k")
    assert(dup._1 == 1500L)
    assert((dup._2, dup._3, dup._4) == ((base._2, base._3, base._4)))
  }

  test("groups sketch independently") {
    val a = (1 to 800).map(i => "a" -> s"x$i")
    val b = (1 to 30).map(i => "b" -> s"y$i")
    val got = run(a ++ b)
    val (_, nHitA, maxA, estA) = ((), got("a")._2, got("a")._3, got("a")._4)
    val refA = refEstimate((1 to 800).map(i => s"x$i"))
    val refB = refEstimate((1 to 30).map(i => s"y$i"))
    assert((nHitA, maxA, estA) == refA)
    assert((got("b")._2, got("b")._3, got("b")._4) == refB)
  }

  test("partitioning-insensitive") {
    val vals = (1 to 2000).map(i => (if (i % 2 == 0) "e" else "o") -> s"t$i")
    assert(run(vals, parts = 1) == run(vals, parts = 13))
  }

  test("rollup: fine-grained registers max-merge to the coarse estimate") {
    val vals = (1 to 4000).map(i => ((s"d${i % 2}", s"h${i % 24}"), s"u${i % 700}"))
    val df = vals.map { case ((d, h), v) => (d, h, v) }.toDF("d", "h", "v")
      .repartition(9)
    val fine = Hll.registersByKey(df, Seq(col("d"), col("h")), col("v"))
    val merged = Hll.estimateFromRegisters(
      fine.groupBy(col("d"), col("_hll_reg"))
        .agg(max(col("_hll_m")).as("_hll_m"), sum(col("_hll_c")).as("_hll_c")),
      Seq("d"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val direct = Hll.estimateByKey(df, Seq(col("d")), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(merged == direct)
  }

  test("the mergeable aggregate form equals the DataFrame form") {
    val vals = (1 to 3000).map(i => (if (i % 3 == 0) "a" else "b") -> s"v$i")
    val viaAgg = vals.toDF("k", "v").repartition(11)
      .groupBy(col("k"))
      .agg(Hll.hll(DistinctSketch.hash60(col("v"))).as("h"))
      .select(col("k"), col("h.n_regs_hit"), col("h.max_rho"),
        col("h.est_x1000"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val viaDf = run(vals)
    assert(viaDf.keySet == viaAgg.keySet)
    viaDf.foreach { case (k, (_, nh, mr, e)) =>
      assert(viaAgg(k) == ((nh, mr, e)), s"key $k")
    }
  }
}
