package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB physical layout (SURVEY §4.3 north star): raw text is
  * parsed once, then the normalized frame is staged as Parquet
  * partitioned by `(event_date, source)` and sorted within files by
  * `(ip, utc_timestamp)`.
  *
  * Why this layout:
  *  - F1 time-range and per-source filters become partition pruning —
  *    a day/source query touches only its directories;
  *  - min/max row-group statistics on `ip`/`status` serve F6/F9-style
  *    predicates without reading pages;
  *  - W1/W3's `(source, ip)` grouping reads arrive nearly clustered, so
  *    the sessionization shuffle moves co-located runs instead of a
  *    random permutation;
  *  - downstream interactive re-query (SURVEY §3 entry 3) re-reads the
  *    staged table instead of re-parsing text.
  */
object ParquetStage {

  /** Stage a normalized (post-parse, post-utc) frame. */
  def write(df: DataFrame, path: String): Unit =
    df.withColumn("event_date", to_date(col("utc_timestamp")))
      .repartition(col("event_date"), col("source"))
      .sortWithinPartitions(col("event_date"), col("source"), col("ip"), col("utc_timestamp"))
      .write
      .mode("overwrite")
      .partitionBy("event_date", "source")
      .parquet(path)

  /** Read the staged table; date/source predicates prune partitions. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Stage as a BUCKETED catalog table: both sides of a repeated
    * equi-join/aggregation keyed on `bucketCols` pre-hash into the same
    * `nBuckets` layout, so joins between tables bucketed alike (and
    * aggregations on the bucket key) plan with NO exchange — the
    * co-located-join layout for fact tables that are joined on the same
    * key query after query (ParquetStageSpec proves the exchange-free
    * plan). Requires a catalog table (bucket metadata lives in the
    * catalog, not the files); the in-memory session catalog suffices.
    */
  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
