package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-corpus mining (Artetxe & Schwenk 2019's
  * max-margin criterion, the LASER/CCMatrix bitext recipe): a raw
  * cosine threshold cannot separate translations from
  * merely-related sentences because cosine scales differ by region of
  * the embedding space; the margin normalizes each pair's cosine by
  * the average cosine of BOTH sides' k-nearest neighborhoods —
  *
  *   margin(x, y) = cos(x, y) / ((avgNN_k(x, B) + avgNN_k(y, A)) / 2)
  *
  * — and keeps, per source x, the best-margin y above a threshold.
  *
  * All post-cosine arithmetic is INTEGRAL: the 4-decimal-rounded
  * cosines (the q27/q33 convention) convert to x10000 longs and
  * margin_x10000 = cos·2k·10000 div (sumNN(x)+sumNN(y)), so the
  * DuckDB oracle replays the whole criterion bit-for-bit with no
  * float-summation order sensitivity.
  *
  * Ids must be globally distinct across the two sides (the fixture's
  * +100000 twin convention).
  *
  * 100 TB shape: the neighborhood sums ride the SAME top-k frames the
  * candidate generation produces (no extra scan); with the
  * brute-force [[Ann.cosineTopK]] backend both sides' query sets are
  * bounded ([[Ann.MaxQueries]]); at corpus scale the backend swaps
  * for [[Ivf.ivfTopK]]/[[GraphAnn]] per side — the margin algebra
  * downstream of (query_id, neighbor_id, cosine, rank) is unchanged.
  */
object BitextMining {

  /** Mined pairs: (src_id, dst_id, cos_x10000, margin_x10000), the
    * best-margin dst per src with margin ≥ `marginX10000`
    * (10000 = 1.0; CCMatrix ships ~1.06). Exact brute-force backend.
    */
  def marginMine(
      a: DataFrame, aIdCol: String, aVecCol: String,
      b: DataFrame, bIdCol: String, bVecCol: String,
      k: Int = 4, marginX10000: Long = 10000L,
      maxQueries: Int = Ann.MaxQueries): DataFrame =
    marginFromTopK(
      Ann.cosineTopK(b, bIdCol, bVecCol, a, aIdCol, aVecCol, k, maxQueries),
      Ann.cosineTopK(a, aIdCol, aVecCol, b, bIdCol, bVecCol, k, maxQueries),
      k, marginX10000)

  /** [[marginMine]] with the IVF candidate backend per direction —
    * the corpus-scale path (no cross join anywhere): each side's
    * top-k comes from `nprobe` probed cells, and the margin algebra
    * is IDENTICAL (it consumes only (query_id, neighbor_id, cosine)
    * frames). BitextMiningSpec duels this against the exact backend
    * on the planted-translation fixture. As with all IVF searches,
    * recall < 1 is the trade — a pair whose candidate never surfaces
    * in EITHER direction's probe cannot be mined; nprobe is the dial.
    */
  def marginMineIvf(
      a: DataFrame, aIdCol: String, aVecCol: String,
      b: DataFrame, bIdCol: String, bVecCol: String,
      k: Int = 4, marginX10000: Long = 10000L,
      nlist: Int = 16, nprobe: Int = 4,
      maxQueries: Int = Ann.MaxQueries,
      cacheKeyA: Option[String] = None,
      cacheKeyB: Option[String] = None): DataFrame =
    marginFromTopK(
      Ivf.ivfTopK(b, bIdCol, bVecCol, a, aIdCol, aVecCol, k, nlist,
        nprobe, maxQueries, cacheKeyB),
      Ivf.ivfTopK(a, aIdCol, aVecCol, b, bIdCol, bVecCol, k, nlist,
        nprobe, maxQueries, cacheKeyA),
      k, marginX10000)

  /** The backend-independent margin algebra over two top-k frames of
    * shape (query_id, neighbor_id, cosine, …): nnAB = per-source
    * neighbors in B, nnBA = per-target neighbors in A. Everything
    * after the cosines is integer arithmetic.
    */
  def marginFromTopK(
      nnAB0: DataFrame, nnBA0: DataFrame,
      k: Int, marginX10000: Long): DataFrame = {
    require(k >= 1, s"marginFromTopK: k must be >= 1 (got $k)")
    val nnAB = nnAB0
      .withColumn("_bm_c", round(col("cosine") * 10000).cast("long"))
    val nnBA = nnBA0
      .withColumn("_bm_c", round(col("cosine") * 10000).cast("long"))
    val sumA = nnAB.groupBy(col("query_id").as("src_id"))
      .agg(sum(col("_bm_c")).as("_bm_sa"))
    val sumB = nnBA.groupBy(col("query_id").as("dst_id"))
      .agg(sum(col("_bm_c")).as("_bm_sb"))
    val cand = nnAB.select(col("query_id").as("src_id"),
        col("neighbor_id").as("dst_id"), col("_bm_c").as("cos_x10000"))
      .join(sumA, Seq("src_id"))
      .join(sumB, Seq("dst_id"))
      // greatest(..., 1): a degenerate neighborhood whose cosine sum
      // is <= 0 (anti-correlated noise) must not divide by zero — the
      // margin goes huge-negative-or-meaningless and the threshold
      // drops it either way; the oracle mirrors the same guard
      .withColumn("margin_x10000", expr(
        s"CAST(cos_x10000 * ${2L * k} * 10000 DIV " +
          "greatest(_bm_sa + _bm_sb, 1) AS BIGINT)"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_x10000").desc, col("dst_id").asc)
    cand.withColumn("_bm_rn", row_number().over(w))
      .filter(col("_bm_rn") === 1 && col("margin_x10000") >= marginX10000)
      .select(col("src_id"), col("dst_id"), col("cos_x10000"),
        col("margin_x10000"))
  }
}
