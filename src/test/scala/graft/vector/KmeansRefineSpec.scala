package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Distributed fixed-point Lloyd refinement (Ivf.refineCentroids):
  * equality with a naive driver recompute, partitioning invariance
  * (the property the fixed-point quantization exists to buy),
  * empty-cell stability, and planted-cluster recovery.
  */
class KmeansRefineSpec extends GraftSparkSpec {
  import spark.implicits._

  private val S = Ivf.RefineScale.toDouble

  /** Deterministic little corpus: 3 planted directions + noise. */
  private def points(n: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      val c = i % 3
      val base = Array.fill(8)(0.05)
      base(c * 2) = 1.0
      base((c * 2 + 1) % 8) += (i % 7) * 0.01
      (i.toLong, base.toSeq)
    }

  /** The refinement semantics in naive sequential form, sharing only
    * the arithmetic CONTRACT (reciprocal-multiply normalization,
    * fixed-point floor(x*inv*S + 0.5), decimal-exact sums, the
    * s/n/S mean expression, empty cells keep their centroid).
    */
  private def naiveRefine(
      pts: Seq[Seq[Double]], init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    var centers = init.map(_.clone())
    for (_ <- 0 until iters) {
      val dim = centers(0).length
      val sums = Array.fill(centers.length)(Array.fill(dim)(BigInt(0)))
      val counts = new Array[Long](centers.length)
      pts.foreach { p =>
        var norm = 0.0
        p.foreach(x => norm += x * x)
        val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
        val vn = p.map(_ * inv).toArray
        var best = 0; var bestD = Double.MaxValue
        for (c <- centers.indices) {
          var acc = 0.0
          var j = 0
          val m = math.min(vn.length, centers(c).length)
          while (j < m) { val d = vn(j) - centers(c)(j); acc += d * d; j += 1 }
          if (acc < bestD) { bestD = acc; best = c }
        }
        counts(best) += 1
        for (j <- 0 until dim)
          sums(best)(j) += BigInt(math.floor(vn(j) * S + 0.5).toLong)
      }
      val next = centers.map(_.clone())
      for (c <- centers.indices if counts(c) > 0; j <- 0 until dim)
        next(c)(j) = new java.math.BigDecimal(sums(c)(j).bigInteger).doubleValue() /
          counts(c).toDouble / S
      centers = next
    }
    centers
  }

  test("distributed refine equals the naive recompute bit-for-bit") {
    val pts = points(300)
    val df = pts.toDF("vec_id", "embedding").repartition(9)
    val init = Ivf.initFromIds(df, "vec_id", "embedding", 3)
    for (iters <- Seq(1, 3)) {
      val got = Ivf.refineCentroids(df, "embedding", init, iters)
      val want = naiveRefine(pts.map(_._2), init, iters)
      assert(got.length == want.length)
      for (c <- got.indices)
        assert(got(c).toSeq == want(c).toSeq, s"iters=$iters centroid $c diverged")
    }
  }

  test("result is invariant to partitioning — the fixed-point guarantee") {
    val pts = points(500)
    val init = Ivf.initFromIds(pts.toDF("vec_id", "embedding"), "vec_id", "embedding", 3)
    val a = Ivf.refineCentroids(
      pts.toDF("vec_id", "embedding").repartition(2), "embedding", init, 2)
    val b = Ivf.refineCentroids(
      scala.util.Random.shuffle(pts).toDF("vec_id", "embedding").repartition(23),
      "embedding", init, 2)
    for (c <- a.indices) assert(a(c).toSeq == b(c).toSeq, s"centroid $c differs")
  }

  test("an empty cell keeps its previous centroid") {
    // all points sit near e1; the far-away init centroid catches nothing
    val pts = (0 until 50).map(i => (i.toLong, Seq(1.0, 0.001 * i, 0.0)))
    val df = pts.toDF("vec_id", "embedding")
    val far = Array(-1.0, 0.0, 0.0)
    val near = Array(1.0, 0.0, 0.0)
    val got = Ivf.refineCentroids(df, "embedding", Array(near, far), 1)
    assert(got(1).toSeq == far.toSeq, "empty cell must keep its centroid")
    assert(got(0).toSeq != near.toSeq, "occupied cell must move to the mean")
  }

  test("refinement recovers the planted directions") {
    val pts = points(600)
    val df = pts.toDF("vec_id", "embedding").repartition(5)
    val init = Ivf.initFromIds(df, "vec_id", "embedding", 3)
    val centers = Ivf.refineCentroids(df, "embedding", init, 5)
    // each planted direction's dominant coordinate should dominate its
    // nearest centroid too
    for (c <- 0 until 3) {
      val dom = centers.map(ct => ct(c * 2)).max
      assert(dom > 0.5, s"no centroid captured planted direction $c (max coord $dom)")
    }
  }
}
