package graft.vector

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Persisted-PQ-index search must equal the fresh in-memory path: same
  * seeded quantizer/codebooks, same codes, same ADC shortlist, same
  * exact re-rank — so a PQ index built once (codes ~32x smaller than
  * vectors) serves every later query batch.
  */
class PqIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(23)
    (0L until 400L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("searchIndex over a persisted PQ index equals a fresh ivfPqTopK") {
    val dir = Files.createTempDirectory("pq_index").toString
    val c = corpus
    val q = c.filter(col("vec_id") < 10)
    Pq.buildIndex(c, "vec_id", "embedding", dir, nlist = 8, m = 4, ks = 16)
    val fresh = Pq.ivfPqTopK(c, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3, m = 4, ks = 16, refine = 4)
      .collect().map(_.toSeq).toSet
    val indexed = Pq.searchIndex(c, "vec_id", "embedding", q, "vec_id", "embedding",
      dir, k = 5, nprobe = 3, refine = 4)
      .collect().map(_.toSeq).toSet
    assert(indexed == fresh)
    assert(indexed.nonEmpty)
  }

  test("appendToIndex encodes with the saved quantizer pair, no retrain") {
    val dir1 = Files.createTempDirectory("pq_app1").toString
    val dir2 = Files.createTempDirectory("pq_app2").toString
    val all = corpus
    val a = all.filter(col("vec_id") < 250)
    val b = all.filter(col("vec_id") >= 250)
    val q = all.filter(col("vec_id") < 10)
    Pq.buildIndex(a, "vec_id", "embedding", dir1, nlist = 8, m = 4, ks = 16)
    val centsBefore = spark.read.parquet(s"$dir1/centroids.parquet")
      .collect().map(_.toSeq).toSet
    val cbsBefore = spark.read.parquet(s"$dir1/codebooks.parquet")
      .collect().map(_.toSeq).toSet
    Pq.appendToIndex(b, "vec_id", "embedding", dir1)
    // quantizer and codebooks untouched; one code row per appended vector
    assert(spark.read.parquet(s"$dir1/centroids.parquet")
      .collect().map(_.toSeq).toSet == centsBefore)
    assert(spark.read.parquet(s"$dir1/codebooks.parquet")
      .collect().map(_.toSeq).toSet == cbsBefore)
    assert(spark.read.parquet(s"$dir1/codes.parquet").count() == 400)
    // search-after-append == search over a bulk index built from the
    // union with the SAME saved quantizer pair (independent write paths)
    val savedCents = spark.read.parquet(s"$dir1/centroids.parquet")
      .orderBy(col("cell")).collect().map(_.getSeq[Double](1).toArray)
    val savedCbs = spark.read.parquet(s"$dir1/codebooks.parquet")
      .orderBy(col("subspace"), col("code")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Double](2).toArray)).toArray
    Pq.writeIndex(all, "vec_id", "embedding", dir2, savedCents, savedCbs)
    val appended = Pq.searchIndex(all, "vec_id", "embedding", q, "vec_id", "embedding",
      dir1, k = 5, nprobe = 3, refine = 4).collect().map(_.toSeq).toSet
    val bulk = Pq.searchIndex(all, "vec_id", "embedding", q, "vec_id", "embedding",
      dir2, k = 5, nprobe = 3, refine = 4).collect().map(_.toSeq).toSet
    assert(appended == bulk)
    assert(appended.nonEmpty)
  }

  test("the persisted layout carries codes for every corpus vector") {
    val dir = Files.createTempDirectory("pq_index2").toString
    Pq.buildIndex(corpus, "vec_id", "embedding", dir, nlist = 8, m = 4, ks = 16)
    val codes = spark.read.parquet(s"$dir/codes.parquet")
    val cbs = spark.read.parquet(s"$dir/codebooks.parquet")
    assert(codes.columns.toSeq == Seq("id", "cell", "code") && codes.count() == 400)
    // m entries per vector, each code id within its subspace's codebook
    assert(codes.filter(size(col("code")) =!= 4).count() == 0)
    assert(cbs.groupBy("subspace").count().collect().forall(_.getLong(1) == 16))
  }
}
