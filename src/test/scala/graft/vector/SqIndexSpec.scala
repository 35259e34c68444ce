package graft.vector

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Persisted SQ8 index: saved-codes search must equal the fresh
  * in-memory path; append codes with the FROZEN saved params; delete
  * tombstones take effect immediately and survive compaction.
  */
class SqIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(23)
    (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("searchSqIndex over a persisted index equals a fresh sqTopK") {
    val dir = Files.createTempDirectory("sq_index").toString
    val c = corpus
    val q = c.filter(col("vec_id") < 10)
    Sq.buildSqIndex(c, "vec_id", "embedding", dir)
    val fresh = Sq.sqTopK(c, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 5, refine = 4).collect().map(_.toSeq).toSet
    val indexed = Sq.searchSqIndex(c, "vec_id", "embedding",
      q, "vec_id", "embedding", dir, k = 5, refine = 4)
      .collect().map(_.toSeq).toSet
    assert(indexed == fresh)
    assert(indexed.nonEmpty)
  }

  test("append codes with the frozen saved params; no refit") {
    val dir1 = Files.createTempDirectory("sq_app1").toString
    val dir2 = Files.createTempDirectory("sq_app2").toString
    val all = corpus
    val a = all.filter(col("vec_id") < 200)
    val b = all.filter(col("vec_id") >= 200)
    val q = all.filter(col("vec_id") < 10)
    Sq.buildSqIndex(a, "vec_id", "embedding", dir1)
    val paramsBefore = spark.read.parquet(s"$dir1/params.parquet")
      .collect().map(_.toSeq).toSet
    Sq.appendToSqIndex(b, "vec_id", "embedding", dir1)
    assert(spark.read.parquet(s"$dir1/params.parquet")
      .collect().map(_.toSeq).toSet == paramsBefore)
    assert(spark.read.parquet(s"$dir1/codes.parquet").count() == 300)
    // independent write path to the same state: a bulk index over ALL
    // vectors coded with dir1's SAVED params
    val (mn, mx) = Sq.loadParams(spark, dir1)
    Sq.writeSqIndex(all, "vec_id", "embedding", dir2, mn, mx)
    val s1 = Sq.searchSqIndex(all, "vec_id", "embedding",
      q, "vec_id", "embedding", dir1, k = 5).collect().map(_.toSeq).toSet
    val s2 = Sq.searchSqIndex(all, "vec_id", "embedding",
      q, "vec_id", "embedding", dir2, k = 5).collect().map(_.toSeq).toSet
    assert(s1 == s2)
  }

  test("out-of-range appended values clamp to the frozen code range") {
    val dir = Files.createTempDirectory("sq_clamp").toString
    val a = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    Sq.buildSqIndex(a, "vec_id", "embedding", dir)
    Sq.appendToSqIndex(
      Seq((3L, Array(9.0f, -9.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    val codes3 = spark.read.parquet(s"$dir/codes.parquet")
      .filter(col("id") === 3L).collect()(0).getSeq[Double](1)
    assert(codes3 == Seq(255.0, 0.0))
  }

  test("delete tombstones vanish from search and survive compaction") {
    val dir = Files.createTempDirectory("sq_del").toString
    val c = corpus
    val q = c.filter(col("vec_id") < 5)
    Sq.buildSqIndex(c, "vec_id", "embedding", dir)
    val before = Sq.searchSqIndex(c, "vec_id", "embedding",
      q, "vec_id", "embedding", dir, k = 3)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    val victim = before.head
    Sq.removeFromSqIndex(Seq(victim).toDF("vec_id"), "vec_id", dir)
    def hits() = Sq.searchSqIndex(c, "vec_id", "embedding",
      q, "vec_id", "embedding", dir, k = 3)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!hits().contains(victim))
    Sq.compactSqIndex(spark, dir)
    assert(!hits().contains(victim))
    assert(spark.read.parquet(s"$dir/codes.parquet")
      .filter(col("id") === victim).count() == 0)
  }
}
