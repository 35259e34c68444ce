package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins the margin criterion's published win: a HUB target that raw
  * cosine prefers for every source is demoted by its own dense
  * neighborhood, and the true (weaker-cosine, unique-direction)
  * translation wins the margin — plus determinism and threshold
  * behavior.
  */
class BitextMiningSpec extends GraftSparkSpec {
  import spark.implicits._

  private val dim = 32
  private def unit(i: Int): Array[Double] =
    Array.tabulate(dim)(j => if (j == i) 1.0 else 0.0)

  // sources x_i = e_i (i = 1..6); hub y_h = normalize(sum e_i) has
  // cosine 1/sqrt(6) ~ 0.408 to EVERY source; true translation y_i =
  // 0.3 e_i + sqrt(1-0.09) e_{20+i} has cosine 0.3 — raw argmax picks
  // the hub for every source, the margin picks the translation
  private lazy val (aSide, bSide) = {
    val xs = (1 to 6).map(i => (i.toLong, unit(i).toSeq))
    val hub = (100000L,
      (1 to 6).map(unit).reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
        .map(_ / math.sqrt(6.0)).toSeq)
    val ys = (1 to 6).map { i =>
      val v = unit(i).zip(unit(20 + i)).map { case (a, b) =>
        0.3 * a + math.sqrt(1 - 0.09) * b }
      (100010L + i, v.toSeq)
    }
    (xs.toDF("vec_id", "embedding"),
      (hub +: ys).toDF("vec_id", "embedding").localCheckpoint())
  }

  test("raw cosine picks the hub; the margin recovers the translations") {
    val raw = Ann.cosineTopK(bSide, "vec_id", "embedding",
      aSide, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw.values.toSet === Set(100000L),
      "fixture broken: raw argmax should be the hub for every source")
    val mined = BitextMining.marginMine(
      aSide, "vec_id", "embedding", bSide, "vec_id", "embedding",
      k = 4, marginX10000 = 10000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mined === (1 to 6).map(i => i.toLong -> (100010L + i)).toMap)
  }

  test("IVF backend duels the exact backend on planted translations") {
    // jittered-translation corpus where IVF candidates work (no decoy
    // construction): 200 sources, translations = x + 0.35 reverse(x)
    val rnd = new scala.util.Random(23)
    val xs = (0 until 200).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }
    val ys = xs.map { case (i, v) =>
      (i + 100000L, v.zip(v.reverse).map { case (p, q) => p + 0.35 * q })
    }
    val aDf = xs.toDF("vec_id", "embedding").localCheckpoint()
    val bDf = ys.toDF("vec_id", "embedding").localCheckpoint()
    def recall(mined: Map[Long, Long]): Double =
      xs.count { case (i, _) => mined.get(i).contains(i + 100000L) } / 200.0
    val exact = BitextMining.marginMine(
      aDf, "vec_id", "embedding", bDf, "vec_id", "embedding",
      k = 4, marginX10000 = 10000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = BitextMining.marginMineIvf(
      aDf, "vec_id", "embedding", bDf, "vec_id", "embedding",
      k = 4, marginX10000 = 10000L, nlist = 16, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recall(exact) >= 0.95, s"exact recall ${recall(exact)}")
    assert(recall(ivf) >= 0.9, s"ivf-backend recall ${recall(ivf)}")
    // where both backends mined the same pair, the margin algebra must
    // agree on it (same downstream arithmetic)
    val agree = ivf.keySet.intersect(exact.keySet)
      .count(i => ivf(i) == exact(i))
    assert(agree * 10 >= ivf.size * 9, s"$agree/${ivf.size} pairs agree")
  }

  test("deterministic under repartitioning; threshold filters") {
    def run(parts: Int, thr: Long) = BitextMining.marginMine(
      aSide.repartition(parts), "vec_id", "embedding",
      bSide.repartition(parts), "vec_id", "embedding",
      k = 4, marginX10000 = thr)
      .collect().map(_.toSeq).toSet
    assert(run(2, 10000L) === run(11, 10000L))
    assert(run(2, 1000000L) === Set.empty, "absurd threshold keeps nothing")
  }
}
