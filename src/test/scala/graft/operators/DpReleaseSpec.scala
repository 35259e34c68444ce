package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class DpReleaseSpec extends GraftSparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], epsX1000: Long, seed: String) =
    DpRelease.laplaceNoisyCounts(
      rows.toDF("k", "v").repartition(4), Seq(col("k")), epsX1000, seed)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  /** Independent reference: md5 via MessageDigest, same inverse-CDF. */
  private def refNoise(seed: String, key: String, b: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed|$key".getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString.substring(0, 15)
    val u = java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
    -b * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
  }

  test("noise matches the independent inverse-CDF recomputation exactly") {
    val rows = (1L to 90L).map(i => (s"g${i % 3}", i))
    val got = run(rows, epsX1000 = 1000, seed = "s1")
    for (g <- Seq("g0", "g1", "g2")) {
      val lap = refNoise("s1", g, 1.0)
      val (trueN, noiseX, dpN) = got(g)
      assert(trueN == 30L)
      assert(noiseX == BigDecimal(lap * 1000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(dpN == math.max(trueN + BigDecimal(lap)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, 0L))
    }
  }

  test("smaller epsilon scales the noise by 1/eps") {
    val rows = (1L to 40L).map(i => ("g", i))
    val a = run(rows, epsX1000 = 1000, seed = "s2")("g")._2
    val b = run(rows, epsX1000 = 250, seed = "s2")("g")._2
    // b = 4x larger scale -> 4x the raw noise (up to rounding)
    assert(math.abs(b - 4L * a) <= 2L, s"noise $a vs $b")
  }

  test("clamping: dp_n never goes negative") {
    // find a seed whose noise is strongly negative for this key by
    // scaling epsilon down until the clamp must engage
    val rows = Seq(("neg", 1L))
    val got = run(rows, epsX1000 = 1, seed = "s3")("neg")
    assert(got._3 >= 0L)
  }

  test("different seeds draw different noise; same seed replays") {
    val rows = (1L to 10L).map(i => ("g", i))
    val a = run(rows, 1000, "sA")("g")
    val b = run(rows, 1000, "sB")("g")
    val a2 = run(rows, 1000, "sA")("g")
    assert(a == a2)
    assert(a._2 != b._2)
  }

  test("partitioning-insensitive") {
    val rows = (1L to 200L).map(i => (s"g${i % 5}", i))
    def go(parts: Int) =
      DpRelease.laplaceNoisyCounts(
        rows.toDF("k", "v").repartition(parts), Seq(col("k")), 1000, "s4")
        .collect().map(_.toSeq).toSet
    assert(go(1) == go(13))
  }
}
