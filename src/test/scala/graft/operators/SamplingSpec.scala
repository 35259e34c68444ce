package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class SamplingSpec extends GraftSparkSpec {
  import spark.implicits._

  private def ids = spark.range(0, 1000).toDF("id")

  test("deterministic: same kept set across invocations and repartitionings") {
    def kept(parts: Int) = Sampling
      .deterministicSample(ids.repartition(parts), col("id"), keepBuckets = 32)
      .collect().map(_.getLong(0)).toSet
    val a = kept(1)
    assert(a == kept(7))
    // ~32/256 = 12.5%, loose band for 1000 ids
    assert(a.size > 60 && a.size < 190, s"got ${a.size}")
  }

  test("nested: smaller keepBuckets is a subset of larger") {
    def kept(k: Int) = Sampling.deterministicSample(ids, col("id"), k)
      .collect().map(_.getLong(0)).toSet
    val small = kept(8)
    val big = kept(64)
    assert(small.subsetOf(big))
    assert(kept(256).size == 1000) // keep everything
  }

  test("bounds are enforced") {
    intercept[IllegalArgumentException](
      Sampling.deterministicSample(ids, col("id"), 0))
    intercept[IllegalArgumentException](
      Sampling.deterministicSample(ids, col("id"), 257))
  }

  test("importanceResample: per-row probability honored, deterministic, clamped") {
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("p", (col("id") % 4) * 2500L + 1250L) // 1250..8750 x10000
    def kept(parts: Int) = Sampling
      .importanceResample(df.repartition(parts), col("id"), col("p"))
      .collect().map(_.getLong(0)).toSet
    val k = kept(1)
    assert(k === kept(13), "partitioning must not change a row's fate")
    // acceptance rate per probability band tracks p (1000 ids/band)
    for (band <- 0 until 4) {
      val inBand = k.count(_ % 4 == band)
      val expect = (band * 2500 + 1250) / 10.0 // of 1000
      assert(math.abs(inBand - expect) < 70,
        s"band $band kept $inBand, expected ~$expect")
    }
    // clamping: p <= 0 keeps nothing, p >= 10000 keeps everything
    val zero = Sampling.importanceResample(
      df.withColumn("p", lit(-5L)), col("id"), col("p")).count()
    val all = Sampling.importanceResample(
      df.withColumn("p", lit(20000L)), col("id"), col("p")).count()
    assert(zero === 0L && all === 4000L)
    // a different salt draws an independent decision set
    val other = Sampling.importanceResample(
      df, col("id"), col("p"), salt = "other:")
      .collect().map(_.getLong(0)).toSet
    assert(other !== k)
  }

  test("assignSplit: exhaustive, stable across partitioning and corpus versions") {
    def splits(df: org.apache.spark.sql.DataFrame, parts: Int): Map[Long, String] =
      Sampling.assignSplit(df.repartition(parts), col("id"),
        valBuckets = 13, testBuckets = 26)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val a = splits(ids, 1)
    assert(a.size == 1000 && a.values.forall(Set("train", "val", "test")))
    assert(a == splits(ids, 11)) // partitioning-invariant
    // corpus-version stability: dropping half the docs moves NOBODY
    val half = splits(ids.filter(col("id") % 2 === 0), 3)
    assert(half.forall { case (id, s) => a(id) == s })
    // rates land near 26/256 and 13/256 (loose bands for 1000 ids)
    val n = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("test") > 60 && n("test") < 150, s"test=${n("test")}")
    assert(n("val") > 25 && n("val") < 85, s"val=${n("val")}")
    assert(n("train") > 700, s"train=${n("train")}")
  }

  test("assignSplit: growing val only ever takes from train; salt decorrelates") {
    val base = Sampling.assignSplit(ids, col("id"), valBuckets = 13, testBuckets = 26)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val grown = Sampling.assignSplit(ids, col("id"), valBuckets = 40, testBuckets = 26)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    grown.foreach { case (id, s) =>
      if (base(id) == "test") assert(s == "test") // test set never moves
      if (s == "val") assert(base(id) != "test")  // new val came from train
    }
    // the split hash is NOT the sampling hash: the deterministic
    // sample's kept set must contain all three splits
    val kept = Sampling.deterministicSample(ids, col("id"), 32)
    val keptSplits = Sampling.assignSplit(kept, col("id"), 13, 26)
      .collect().map(_.getString(1)).toSet
    assert(keptSplits == Set("train", "val", "test"))
    intercept[IllegalArgumentException](
      Sampling.assignSplit(ids, col("id"), valBuckets = 200, testBuckets = 56))
  }

  /** Independent A-ES reference: java MessageDigest md5 + Math.log,
    * sharing no Spark expression machinery with [[Sampling.weightedKey]].
    */
  private def referenceSelect(
      rows: Seq[(Long, Long)], k: Int, salt: String = "wsamp:"): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(s"$salt$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / (1L << 60).toDouble
      math.log(u) / w.toDouble
    }
    rows.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
  }

  test("weightedSample: matches the independent reference, any partitioning") {
    val rows = (0L until 500L).map(i => (i, i % 17 + 1))
    val want = referenceSelect(rows, 50).toSet
    def got(parts: Int) = Sampling.weightedSample(
        rows.toDF("id", "w").repartition(parts), col("id"), col("w"), 50)
      .collect().map(_.getLong(0)).toSet
    assert(got(1) == want)
    assert(got(7) == want)
  }

  test("weightedSample: heavy weights dominate the selection") {
    // 10 ids with weight 10^6 vs 990 with weight 1: every heavy id's
    // key ln(u)/1e6 is > any light id's key unless the light u is
    // astronomically close to 1 — all heavies must be in the top 20
    val rows = (0L until 1000L).map(i => (i, if (i < 10) 1000000L else 1L))
    val got = Sampling.weightedSample(
        rows.toDF("id", "w").repartition(5), col("id"), col("w"), 20)
      .collect().map(_.getLong(0)).toSet
    assert((0L until 10L).forall(got.contains), s"missing heavy ids in $got")
    assert(got == referenceSelect(rows, 20).toSet)
  }

  test("weightedSample: k-boundary margin is far above ulp noise") {
    // the cross-engine safety argument: the gap between the k-th and
    // (k+1)-th keys must dwarf 1-ulp libm divergence
    val rows = (0L until 500L).map(i => (i, i % 17 + 1))
    val keyed = rows.toDF("id", "w")
      .withColumn("k", Sampling.weightedKey(col("id"), col("w")))
      .orderBy(col("k").desc, col("id"))
      .collect().map(_.getDouble(2))
    val margin = keyed(49) - keyed(50)
    assert(margin > 1e-9, s"boundary margin $margin too small")
  }

  test("weightedSample: bad k fails fast") {
    intercept[IllegalArgumentException](
      Sampling.weightedSample(ids, col("id"), lit(1L), 0))
    intercept[IllegalArgumentException](
      Sampling.weightedSamplePerKey(ids, col("id"), lit(1L), lit("x"), 0))
  }

  test("weightedSamplePerKey: per-stratum top-k by the same A-ES order") {
    val rows = (0L until 300L).map(i => (i, s"lang${i % 3}", i % 11 + 1))
    def perKeyReference(k: Int): Set[Long] =
      rows.groupBy(_._2).values.flatMap { grp =>
        referenceSelect(grp.map(r => (r._1, r._3)), k)
      }.toSet
    val got = Sampling.weightedSamplePerKey(
        rows.toDF("id", "lang", "w").repartition(5),
        col("id"), col("w"), col("lang"), k = 7)
      .collect().map(_.getLong(0)).toSet
    assert(got == perKeyReference(7))
    assert(got.size == 21) // 7 per stratum, 3 strata
    // plan rides the window-group-limit prune (the q76 assertion)
    val plan = Sampling.weightedSamplePerKey(
        rows.toDF("id", "lang", "w"), col("id"), col("w"), col("lang"), 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no map-side prune:\n$plan")
  }
}
