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
}
