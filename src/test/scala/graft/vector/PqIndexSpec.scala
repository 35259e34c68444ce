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
