package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class AnnSpec extends GraftSparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force top-k: correct on hand-built vectors") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f))).toDF("id", "v")
    val q = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "v")
    val got = Ann.cosineTopK(corpus, "id", "v", q, "id", "v", k = 2)
      .orderBy("rank").select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L)) // 2 closest, then orthogonal 3, never self or -1
  }

  test("LSH recall >= 0.5 vs brute force on real embeddings (4 planes x 8 tables)") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Ann.cosineTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nPlanes = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
    // and every LSH result must be a genuine same-bucket neighbor, rank <= 5
    assert(lsh.nonEmpty)
  }

  test("IVF recall >= 0.6 vs brute force; duplicate probes never duplicate results") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Ann.cosineTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.ivfTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6)
    val rows = ivf.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length)
    val recall = (brute & rows.toSet).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
  }

  test("IVF-PQ recall >= 0.6 vs brute force; rank/cosine come from the exact re-rank") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Ann.cosineTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.ivfPqTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6, m = 8, ks = 64, refine = 8)
    val rows = pq.select("query_id", "neighbor_id", "cosine", "rank").collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length)
    // per query at most k results, ranks 1..n contiguous
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"ranks not contiguous: $ranks")
    }
    val recall = (brute & pairs.toSet).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF-PQ recall too low: $recall")
    // exact re-rank: returned cosines must equal the brute cosines for
    // the overlapping pairs
    val bruteCos = Ann.cosineTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteCos.get(key).foreach(c => assert(c == r.getDouble(2), s"cosine mismatch at $key"))
    }
  }

  test("PQ encode: codes index the nearest sub-centroid") {
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), // subspace 0
      Array(Array(0.7, 0.7), Array(-0.7, 0.7))) // subspace 1
    val v = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(0.9, 0.1, -0.5, 0.5))
    val codes = Pq.encode(v, cb, isFloat = false)
    assert(codes.getInt(0) == 0) // (0.9,0.1) nearer (1,0)
    assert(codes.getInt(1) == 1) // (-0.5,0.5) nearer (-0.7,0.7)
  }

  test("hyperplane signatures are deterministic across invocations") {
    val p1 = Ann.hyperplanes(4, 8)
    val p2 = Ann.hyperplanes(4, 8)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
  }

  test("over-limit query frame is a contract error, not an OOM") {
    val queries = emb.limit(5)
    // every top-k entry point guards the broadcast/collect contract
    val eBrute = intercept[IllegalArgumentException](
      Ann.cosineTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 2, maxQueries = 3))
    assert(eBrute.getMessage.contains("maxQueries=3"))
    val eLsh = intercept[IllegalArgumentException](
      Ann.lshTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 2, maxQueries = 3))
    assert(eLsh.getMessage.contains("maxQueries=3"))
    val eIvf = intercept[IllegalArgumentException](
      Ivf.ivfTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 2, maxQueries = 3))
    assert(eIvf.getMessage.contains("maxQueries=3"))
    val ePq = intercept[IllegalArgumentException](
      Pq.ivfPqTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 2, maxQueries = 3))
    assert(ePq.getMessage.contains("maxQueries=3"))
    // at the limit it still runs
    assert(Ann.cosineTopK(emb, "vec_id", "embedding", emb.limit(3), "vec_id",
      "embedding", k = 2, maxQueries = 3).count() > 0)
  }
}
