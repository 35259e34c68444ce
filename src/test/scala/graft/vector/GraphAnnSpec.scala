package graft.vector

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins the q133/q134 graph-ANN contract: the bounded-hop beam walk
  * beats plain IVF at the SAME probe budget on a jittered-twin corpus
  * (the cross-cell-edge payoff), determinism under repartitioning, and
  * persisted-index search equal to a fresh build+search.
  */
class GraphAnnSpec extends GraftSparkSpec {
  import spark.implicits._

  private val dim = 32
  private val nVec = 400
  private val jitterC = 0.35

  // seeded corpus: unit-ish vectors + rotated twins (vec_id + 100000),
  // the SparkEntry.jitterTwinEmbeddings law (x + c * reverse(x))
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val base = (0L until nVec.toLong).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(_ / n).toSeq)
    }
    val twins = base.map { case (i, v) =>
      (i + 100000L, v.zip(v.reverse).map { case (a, b) => a + jitterC * b })
    }
    (base ++ twins).toDF("vec_id", "embedding").localCheckpoint()
  }
  private lazy val queries = corpus.filter(col("vec_id") < 40)

  private def recallAt1(res: org.apache.spark.sql.DataFrame): Double = {
    val hits = res.filter(col("rank") === 1)
      .filter(col("neighbor_id") === col("query_id") + 100000).count()
    hits.toDouble / 40.0
  }

  test("graph walk >= 0.9 recall and beats IVF at the same nprobe=1 budget") {
    val g = recallAt1(GraphAnn.graphTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1, nlist = 32, nprobe = 1,
      m = 6, replicas = 2, hops = 5, beam = 12))
    val ivf = recallAt1(Ivf.ivfTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1, nlist = 32, nprobe = 1))
    assert(g >= 0.9, s"graph recall $g")
    assert(g > ivf, s"graph $g must beat ivf $ivf at equal probe budget")
  }

  test("deterministic under repartitioning") {
    def run(parts: Int) =
      GraphAnn.graphTopK(corpus.repartition(parts), "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 1,
        m = 6, replicas = 2, hops = 3, beam = 8)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(run(2) === run(11))
  }

  test("persisted index search equals fresh build+search") {
    val dir = Files.createTempDirectory("graph-idx").toFile
    dir.deleteOnExit()
    val centroids = Ivf.fitCentroids(corpus, "embedding", 16)
    GraphAnn.writeIndex(corpus, "vec_id", "embedding",
      dir.getAbsolutePath, centroids, m = 6, replicas = 2)
    val fresh = GraphAnn.graphTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2,
      m = 6, replicas = 2, hops = 3, beam = 8)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val fromDisk = GraphAnn.searchIndex(spark, dir.getAbsolutePath,
      queries, "vec_id", "embedding", k = 5, nprobe = 2, hops = 3, beam = 8)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(fromDisk === fresh)
  }

  test("edges are symmetric and capped; entries one per cell") {
    val centroids = Ivf.fitCentroids(corpus, "embedding", 8)
    val (edges, entries) = GraphAnn.build(
      corpus, "vec_id", "embedding", centroids, m = 4, replicas = 2)
    val e = edges.as[(Long, Long)].collect().toSet
    assert(e.forall { case (a, b) => e.contains((b, a)) }, "symmetry")
    assert(entries.groupBy("cell").count().filter(col("count") > 1).count() === 0L)
    // out-degree before symmetrization is <= m * replicas; after
    // adding reverses a hub can exceed it, but every edge endpoint
    // must exist in the corpus
    val ids = corpus.select("vec_id").as[Long].collect().toSet
    assert(e.forall { case (a, b) => ids(a) && ids(b) })
  }
}
