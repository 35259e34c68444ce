package graft.vector

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Persisted-index search must equal the fresh in-memory path: same
  * seeded quantizer, same assignments, same rank — so an index built
  * once serves every later query batch without re-training.
  */
class IvfIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(11)
    (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("searchIndex over a persisted index equals a fresh ivfTopK") {
    val dir = Files.createTempDirectory("ivf_index").toString
    val c = corpus
    val q = c.filter(col("vec_id") < 10)
    Ivf.buildIndex(c, "vec_id", "embedding", dir, nlist = 8)
    val fresh = Ivf.ivfTopK(c, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3)
      .collect().map(_.toSeq).toSet
    val indexed = Ivf.searchIndex(c, "vec_id", "embedding", q, "vec_id", "embedding",
      dir, k = 5, nprobe = 3)
      .collect().map(_.toSeq).toSet
    assert(indexed == fresh)
    assert(indexed.nonEmpty)
  }

  test("the persisted layout is the documented narrow shape") {
    val dir = Files.createTempDirectory("ivf_index2").toString
    Ivf.buildIndex(corpus, "vec_id", "embedding", dir, nlist = 8)
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
    val cells = spark.read.parquet(s"$dir/cells.parquet")
    assert(cents.columns.toSeq == Seq("cell", "centroid") && cents.count() == 8)
    assert(cells.columns.toSeq == Seq("id", "cell") && cells.count() == 300)
    // every cell id the assignments reference exists in the quantizer
    assert(cells.join(cents, Seq("cell"), "left_anti").count() == 0)
  }
}
