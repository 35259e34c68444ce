package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-volume anomaly monitoring — the "did yesterday's crawl
  * shrink" report: per time-bucket metric totals compared against the
  * TRAILING window's median (robust to the spikes it exists to
  * catch; a mean would chase them). A bucket is anomalous when
  *
  *   |metric − median| · 1000 > threshold_x1000 · median
  *
  * evaluated in exact integer arithmetic. The median is the middle
  * element of the sorted trailing values (odd window → exact
  * integer; the first `window` buckets have no full history and are
  * never flagged — `has_history` says why).
  *
  * 100 TB shape: one hash aggregation to the #buckets-row day frame;
  * the trailing-median window runs there (collect_list over `window`
  * longs per row — bounded by construction, the q165/q181 tiny-frame
  * argument).
  */
object IngestMonitor {

  /** (bucket, metric, trailing_median, deviation_x1000, has_history,
    * anomaly), one row per bucket ordered by bucket. `window` must be
    * odd so the median is exact.
    */
  def volumeAnomalies(
      df: DataFrame, bucketCol: Column, metricCol: Column,
      window: Int = 7, thresholdX1000: Long = 300L): DataFrame = {
    require(window >= 3 && window % 2 == 1,
      s"volumeAnomalies: window must be odd and >= 3, got $window")
    require(thresholdX1000 > 0, "volumeAnomalies: threshold must be positive")
    val byBucket = df.groupBy(bucketCol.as("bucket"))
      .agg(sum(metricCol).cast("long").as("metric"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket")).rowsBetween(-window, -1)
    val mid = (window + 1) / 2
    byBucket
      .withColumn("_im_trail", collect_list(col("metric")).over(w))
      .withColumn("has_history", size(col("_im_trail")) === window)
      .withColumn("trailing_median",
        when(col("has_history"),
          element_at(array_sort(col("_im_trail")), mid)))
      .withColumn("deviation_x1000",
        when(col("has_history") && col("trailing_median") > 0,
          expr("abs(metric - trailing_median) * 1000 DIV trailing_median")))
      .withColumn("anomaly",
        coalesce(col("deviation_x1000") > thresholdX1000, lit(false)))
      .select(col("bucket"), col("metric"), col("trailing_median"),
        col("deviation_x1000"), col("has_history"), col("anomaly"))
  }
}
