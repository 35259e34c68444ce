package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-threshold calibration: the retention-vs-threshold sweep a
  * curation team runs before picking a quality-score cutoff ("what
  * fraction of documents/tokens survives at each candidate
  * threshold?").
  *
  * The naive shape is one corpus scan per candidate threshold; this
  * operator answers the WHOLE grid in ONE scan — each threshold is a
  * pair of conditional aggregates (doc count, weight mass), all
  * map-side combined into a single 1-row frame, then unpivoted
  * driver-free into one row per threshold. At 100 TB the cost is one
  * narrow pass regardless of grid size; there is no join, no window,
  * and the only "shuffle" is the scalar final aggregation.
  *
  * Ratios are integral x10000 (DIV on long counts), so the DuckDB
  * oracle matches exactly.
  */
object Calibration {

  /** Sweep `thresholds` over `scoreCol` (an integral score; rows kept
    * when score >= threshold), weighting retention by `weightCol`
    * (e.g. token counts — null weights count as 0).
    *
    * Output: threshold, n_docs, w_total, n_kept, w_kept,
    * docs_kept_x10000, w_kept_x10000 — one row per threshold,
    * ordered by the caller if needed.
    */
  def thresholdSweep(
      df: DataFrame,
      scoreCol: String,
      weightCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep: empty threshold grid")
    val w = coalesce(col(weightCol).cast("long"), lit(0L))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("_ts_n"), sum(w).as("_ts_w")) ++
        thresholds.zipWithIndex.flatMap { case (t, i) =>
          Seq(
            sum(when(col(scoreCol) >= t, 1L).otherwise(0L)).as(s"_ts_n_$i"),
            sum(when(col(scoreCol) >= t, w).otherwise(0L)).as(s"_ts_w_$i"))
        }
    df.agg(aggs.head, aggs.drop(1): _*)
      .select(explode(array(thresholds.zipWithIndex.map { case (t, i) =>
        struct(
          lit(t).as("threshold"),
          col("_ts_n").as("n_docs"),
          coalesce(col("_ts_w"), lit(0L)).as("w_total"),
          coalesce(col(s"_ts_n_$i"), lit(0L)).as("n_kept"),
          coalesce(col(s"_ts_w_$i"), lit(0L)).as("w_kept"))
      }: _*)).as("_r"))
      .select(col("_r.threshold").as("threshold"),
        col("_r.n_docs").as("n_docs"), col("_r.w_total").as("w_total"),
        col("_r.n_kept").as("n_kept"), col("_r.w_kept").as("w_kept"))
      .withColumn("docs_kept_x10000",
        expr("CAST(10000 * n_kept DIV greatest(n_docs, 1) AS BIGINT)"))
      .withColumn("w_kept_x10000",
        expr("CAST(10000 * w_kept DIV greatest(w_total, 1) AS BIGINT)"))
  }

  /** Exact percentile-rank normalization of a bounded non-negative
    * integral score — "this document's quality is better than X% of
    * the corpus", the score-comparability layer between differently
    * scaled signals. Ties order deterministically by a salted
    * [[DistinctSketch.hash60]] spread (then id), so equal scores get
    * distinct, reproducible ranks and the DuckDB oracle replays the
    * full order.
    *
    * 100 TB shape: the global rank is [[Budget.runningTotal]]'s
    * chunked two-phase cumsum over the composite key
    * `score·2^20 + hash20` — the 2^16 chunk width spreads a
    * concentrated score over 16 hash sub-buckets, so NO unpartitioned
    * window over data rows exists in the plan (the q56/q71
    * machinery on a new surface). `pct_x10000 = (rank−1)·10000 DIV
    * (n−1)` spans 0..10000 inclusive.
    */
  def percentileRank(
      df: DataFrame, idCol: Column, scoreCol: Column,
      salt: String = "prank:",
      outCol: String = "pct_x10000"): DataFrame = {
    val h20 = pmod(DistinctSketch.hash60(concat(lit(salt),
      idCol.cast("string"))), lit(1048576L))
    val keyed = df.withColumn("_pr_key",
      scoreCol.cast("long") * lit(1048576L) + h20)
    val ranked = Budget.runningTotal(
      keyed, col("_pr_key"), Seq(idCol), lit(1L), "rank", 1L << 16)
    val n = df.agg(count(lit(1)).as("_pr_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn(outCol,
        expr("CAST((rank - 1) * 10000 DIV greatest(_pr_n - 1, 1) AS BIGINT)"))
      .drop("_pr_key", "_pr_n")
  }
}
