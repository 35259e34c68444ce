package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class DistinctSketchSpec extends GraftSparkSpec {
  import spark.implicits._

  private def kmvOf(values: Seq[String], k: Int, parts: Int): (Long, Long) = {
    val df = values.toDF("v").repartition(parts)
    val r = df.agg(DistinctSketch.kmv(DistinctSketch.hash60(col("v")), k).as("s"))
      .select(col("s.n_hashes"), col("s.est_distinct")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Reference estimate from first principles: distinct hash60 values
    * collected exactly, k smallest kept, the shared estimator applied.
    */
  private def reference(values: Seq[String], k: Int): Long = {
    val hashes = values.toDF("v")
      .select(DistinctSketch.hash60(col("v")).as("h"))
      .distinct().collect().map(_.getLong(0)).sorted
    val s = new java.util.TreeSet[java.lang.Long]()
    hashes.take(k).foreach(h => s.add(h))
    DistinctSketch.estimate(s, k)
  }

  test("c < k: exact distinct count, any partitioning, duplicates ignored") {
    val vs = (1 to 500).map(i => s"v${i % 23}") // 23 distinct
    for (parts <- Seq(1, 5, 32)) {
      assert(kmvOf(vs, k = 64, parts) == ((23L, 23L)), s"parts=$parts")
    }
  }

  test("c >= k: estimate equals the k-th-smallest-hash formula exactly") {
    val vs = (1 to 3000).map(i => s"item-${i % 400}") // 400 distinct
    val want = reference(vs, k = 32)
    for (parts <- Seq(1, 7, 32)) {
      assert(kmvOf(vs, k = 32, parts) == ((32L, want)), s"parts=$parts")
    }
  }

  test("estimate is a function of the distinct SET: duplication-invariant") {
    val base = (1 to 800).map(i => s"d$i")
    val dup = base ++ base ++ base
    assert(kmvOf(base, 16, 4) == kmvOf(dup, 16, 8))
  }

  test("KMV accuracy: within 40% of truth at k = 64 (deterministic draw)") {
    val vs = (1 to 5000).map(i => s"term-$i")
    val (_, est) = kmvOf(vs, k = 64, parts = 8)
    // rel error ~ 1/sqrt(k-2) ~ 12.7%; md5 is a fixed draw, so this
    // either always passes or signals a broken hash/estimator
    assert(math.abs(est - 5000.0) / 5000.0 < 0.40, s"est=$est")
  }

  test("estimateByKey: per-group regimes coexist; n_values is the raw count") {
    val df = ((1 to 300).map(i => ("big", s"t${i % 100}")) ++
      (1 to 40).map(i => ("small", s"s${i % 7}")))
      .toDF("g", "v")
    val got = DistinctSketch.estimateByKey(df.repartition(6),
      Seq(col("g")), col("v"), k = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val wantBig = reference((1 to 300).map(i => s"t${i % 100}"), 16)
    assert(got("big") == ((300L, 16L, wantBig)))
    assert(got("small") == ((40L, 7L, 7L)), "c < k regime: exact")
  }

  test("out-of-domain hash fails loudly") {
    val df = Seq(1L).toDF("h")
    val e = intercept[Exception] {
      df.agg(DistinctSketch.kmv(lit(-1L), k = 4)).collect()
    }
    assert(e.getMessage.contains("kmv") || e.getCause != null)
  }
}
