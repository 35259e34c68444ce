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
