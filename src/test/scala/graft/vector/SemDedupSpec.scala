package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class SemDedupSpec extends GraftSparkSpec {
  import spark.implicits._

  // 40 one-hot base vectors (pairwise cosine 0) + a near-identical
  // twin of each (id + 1000): every twin must drop, every base keep
  private def corpus = {
    val base = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(40)(d => if (d == i) 1.0 else 0.0).toSeq)
    }
    val twins = base.map { case (id, v) => (id + 1000L, v.map(_ + 1e-4)) }
    (base ++ twins).toDF("vec_id", "embedding")
  }

  test("kept set equals a brute-force within-cell recompute") {
    val out = SemDedup.semanticDedup(corpus, "vec_id", "embedding",
      nClusters = 4, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.length == 80)

    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cellOf = out.map(r => r._1 -> r._2).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      val raw = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      math.floor(raw * 10000 + 0.5) / 10000 // Spark round(_, 4), HALF_UP
    }
    val ids = vecs.keys.toSeq.sorted
    val expectedDropped = ids.filter { b =>
      ids.exists(a => a < b && cellOf(a) == cellOf(b) && cos(vecs(a), vecs(b)) >= 0.99)
    }.toSet
    assert(out.filter(!_._3).map(_._1).toSet == expectedDropped)
  }

  test("every twin sharing its base's cell is dropped; bases are kept") {
    val out = SemDedup.semanticDedup(corpus, "vec_id", "embedding",
      nClusters = 4, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val keptOf = out.map(r => r._1 -> r._3).toMap
    (0 until 40).foreach { i =>
      assert(keptOf(i.toLong), s"base $i must be kept")
      if (cellOf(i.toLong) == cellOf(i + 1000L))
        assert(!keptOf(i + 1000L), s"twin of $i shares the cell and must drop")
    }
    // the perturbation is tiny: twins land with their bases
    assert((0 until 40).count(i => cellOf(i.toLong) == cellOf(i + 1000L)) == 40)
  }

  test("cells above maxCellSize contribute no pairs; their rows stay kept") {
    val out = SemDedup.semanticDedup(corpus, "vec_id", "embedding",
      nClusters = 4, threshold = 0.99, maxCellSize = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.forall(_._2), "all cells exceed size 1, so nothing may drop")
  }
}
