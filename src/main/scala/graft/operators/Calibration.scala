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
}
