package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Cross-stratum overlap estimation (DistinctSketch.overlapByKey):
  * exact set algebra below k, estimator accuracy and the KMV union
  * identity above k, partitioning invariance, and the decimal DIV
  * overflow regime.
  */
class OverlapSpec extends GraftSparkSpec {
  import spark.implicits._

  test("below k the whole row is exact set algebra") {
    // A = 0..9, B = 5..14 -> |A|=10 |B|=10 |U|=15 |I|=5 J=1/3
    val df = ((0 to 9).map(i => ("a", s"v$i")) ++
      (5 to 14).map(i => ("b", s"v$i"))).toDF("src", "v")
    val r = DistinctSketch.overlapByKey(df, col("src"), col("v"), k = 64)
      .collect().head
    assert(r.getAs[String]("key_a") == "a" && r.getAs[String]("key_b") == "b")
    assert(r.getAs[Long]("est_a") == 10L)
    assert(r.getAs[Long]("est_b") == 10L)
    assert(r.getAs[Long]("est_union") == 15L)
    assert(r.getAs[Long]("est_intersect") == 5L)
    assert(r.getAs[Long]("jaccard_x10000") == 3333L)
  }

  test("above k the estimate tracks a planted 1/3 Jaccard within KMV error") {
    // A = 0..2999, B = 1500..4499 -> true J = 1500/4500 = 1/3
    val df = ((0 until 3000).map(i => ("a", s"tok$i")) ++
      (1500 until 4500).map(i => ("b", s"tok$i"))).toDF("src", "v")
      .repartition(11)
    val r = DistinctSketch.overlapByKey(df, col("src"), col("v"), k = 256)
      .collect().head
    // sketch error ~ 1/sqrt(k-2) ~ 6%; allow 3 sigma on each estimate
    assert(math.abs(r.getAs[Long]("est_union") - 4500L) < 900,
      s"union est ${r.getAs[Long]("est_union")} far from 4500")
    val j = r.getAs[Long]("jaccard_x10000")
    assert(j > 1500 && j < 5200, s"jaccard_x10000 $j far from 3333")
  }

  test("union estimate obeys the KMV union identity: merged sketch == union's sketch") {
    val df = ((0 until 2000).map(i => ("a", s"w$i")) ++
      (1000 until 3000).map(i => ("b", s"w$i"))).toDF("src", "v")
    val k = 128
    val r = DistinctSketch.overlapByKey(df, col("src"), col("v"), k)
      .collect().head
    // reference: sketch the union directly (one stratum over A∪B rows)
    val direct = DistinctSketch.estimateByKey(
      df.select(lit("u").as("src"), col("v")), Seq(col("src")), col("v"), k)
      .collect().head.getAs[Long]("est_distinct")
    assert(r.getAs[Long]("est_union") == direct,
      "merging two KMV sketches must equal sketching the union")
  }

  test("result is invariant to partitioning and row order") {
    val base = (0 until 4000).map(i => (s"s${i % 3}", s"t${i % 997}"))
    val d1 = base.toDF("src", "v").repartition(3)
    val d2 = scala.util.Random.shuffle(base).toDF("src", "v").repartition(17)
    def rows(df: org.apache.spark.sql.DataFrame) =
      DistinctSketch.overlapByKey(df, col("src"), col("v"), k = 32)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(rows(d1) == rows(d2))
  }

  test("decimal DIV: the (k-1)*2^60 numerator regime evaluates without overflow") {
    // k = 64: 63 * 2^60 overflows a signed long; the decimal path must not
    val df = (0 until 500).flatMap(i => Seq(("a", s"x$i"), ("b", s"y$i")))
      .toDF("src", "v")
    val r = DistinctSketch.overlapByKey(df, col("src"), col("v"), k = 64)
      .collect().head
    assert(r.getAs[Long]("est_a") > 0 && r.getAs[Long]("est_union") > 0)
    assert(r.getAs[Long]("est_intersect") >= 0)
  }
}
