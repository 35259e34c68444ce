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

  test("appendToIndex assigns with the saved quantizer, no retrain") {
    val dir1 = Files.createTempDirectory("ivf_app1").toString
    val dir2 = Files.createTempDirectory("ivf_app2").toString
    val all = corpus
    val a = all.filter(col("vec_id") < 200)
    val b = all.filter(col("vec_id") >= 200)
    val q = all.filter(col("vec_id") < 10)
    Ivf.buildIndex(a, "vec_id", "embedding", dir1, nlist = 8)
    val centsBefore = spark.read.parquet(s"$dir1/centroids.parquet")
      .collect().map(_.toSeq).toSet
    Ivf.appendToIndex(b, "vec_id", "embedding", dir1)
    // quantizer untouched; one narrow row per appended vector
    assert(spark.read.parquet(s"$dir1/centroids.parquet")
      .collect().map(_.toSeq).toSet == centsBefore)
    assert(spark.read.parquet(s"$dir1/cells.parquet").count() == 300)
    // search-after-append == search over a bulk index built from the
    // union with the SAME saved quantizer (independent write paths)
    val savedCents = spark.read.parquet(s"$dir1/centroids.parquet")
      .orderBy(col("cell")).collect().map(_.getSeq[Double](1).toArray)
    Ivf.writeIndex(all, "vec_id", "embedding", dir2, savedCents)
    val appended = Ivf.searchIndex(all, "vec_id", "embedding", q, "vec_id", "embedding",
      dir1, k = 5, nprobe = 3).collect().map(_.toSeq).toSet
    val bulk = Ivf.searchIndex(all, "vec_id", "embedding", q, "vec_id", "embedding",
      dir2, k = 5, nprobe = 3).collect().map(_.toSeq).toSet
    assert(appended == bulk)
    assert(appended.nonEmpty)
    // appended vectors are actually findable: some neighbor from B
    assert(appended.exists(_(1).asInstanceOf[Long] >= 200L))
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
