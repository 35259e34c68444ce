package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class SqSpec extends GraftSparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("fitParams: per-dim min/max, index-ordered") {
    val corpus = Seq(
      (1L, Seq(0.0f, 5.0f, -2.0f)),
      (2L, Seq(1.0f, 3.0f, -2.0f)),
      (3L, Seq(0.5f, 9.0f, -2.0f))).toDF("id", "v")
    val (mn, mx) = Sq.fitParams(corpus, "v")
    assert(mn.toSeq == Seq(0.0, 3.0, -2.0))
    assert(mx.toSeq == Seq(1.0, 9.0, -2.0))
  }

  test("codes: min -> 0, max -> 255, constant dim -> 0, clamped") {
    val corpus = Seq((1L, Seq(0.0, 10.0, 7.0)), (2L, Seq(2.0, 20.0, 7.0)))
      .toDF("id", "v")
    val (mn, mx) = Sq.fitParams(corpus, "v")
    val got = corpus.select(col("id"), Sq.codes(col("v"), mn, mx).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(0.0, 0.0, 0.0))
    assert(got(2L) == Seq(255.0, 255.0, 0.0))
  }

  test("identical vectors get identical codes and rank 1 in sqTopK") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val twin = base.unionByName(base.select(
      (col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val res = Sq.sqTopK(twin, "vec_id", "embedding",
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 1)
    val top = res.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top.length == 10)
    assert(top.forall { case (q, n) => n == q + 100000 },
      s"twin not rank-1 for: ${top.filterNot { case (q, n) => n == q + 100000 }.toSeq}")
  }

  test("SQ8 top-5 agrees closely with brute force on real embeddings") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Ann.cosineTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Sq.sqTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, refine = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & sq).size.toDouble / brute.size
    assert(recall >= 0.8, s"SQ8 recall $recall < 0.8")
  }

  test("partitioning-insensitive") {
    val q = emb.filter(col("vec_id") < 5)
    def run(parts: Int) =
      Sq.sqTopK(emb.repartition(parts), "vec_id", "embedding",
        q, "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
    assert(run(1) == run(7))
  }
}
