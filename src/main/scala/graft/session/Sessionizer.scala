package graft.session

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** W1 — time-gap sessionization + A1 request_count (SURVEY §2.6, §2.4).
  *
  * Reference `_cluster` (dataframe.py:604-658): per `(source, ip)` in
  * epoch-second order, a row starts a new session iff the gap to the
  * previous row is `>= threshold` (strictly `delta < X` stays in the same
  * session — dataframe.py:633). The global `cluster` id is a dense
  * 0-based id in first-appearance order of `(source, ip, localId)` after
  * the sort — i.e. lexicographic `(source, ip, localId)` order
  * (pandas factorize at dataframe.py:639).
  *
  * Scale design: the per-group lag/cumsum is one hash-shuffle on
  * `(source, ip)`. The global dense id is NOT computed with a
  * single-partition window (`dense_rank` over an unpartitioned window
  * would serialize all rows through one task); instead the distinct
  * session keys — orders of magnitude fewer than rows — are sorted and
  * `zipWithIndex`ed, then joined back on the session key. AQE handles
  * skewed hot IPs.
  */
object Sessionizer {

  val DefaultThreshold = 60L

  /** Adds `cluster` (global dense session id). Requires columns
    * `source`, `ip`, `utc_timestamp`.
    */
  def withClusters(df: DataFrame, threshold: Long = DefaultThreshold): DataFrame = {
    val spark = df.sparkSession
    val epoch = col("utc_timestamp").cast(LongType)
    val grp = Window.partitionBy(col("source"), col("ip")).orderBy(epoch)

    val delta = epoch - lag(epoch, 1).over(grp)
    val newSession = when(delta.isNull || delta < threshold, 0L).otherwise(1L)
    val withLocal = df.withColumn("_epoch", epoch)
      .withColumn("_local_id",
        sum(newSession).over(grp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // Dense global ids in (source, ip, localId) order via zipWithIndex on
    // the (small) distinct session-key set — no single-partition window.
    val sessionKeys = withLocal
      .groupBy(col("source"), col("ip"), col("_local_id"))
      .agg(min(col("_epoch")).as("_session_start"))
    // Global (source, ip, localId) order for factorize-compatible numbering:
    val keyRows = sessionKeys.orderBy(col("source"), col("ip"), col("_local_id"))
    val indexed = zipWithIndexDF(keyRows, "cluster")

    // No broadcast hint on the id map: session count is usually orders of
    // magnitude below row count, but for sparse traffic (many IPs with few
    // requests, or tiny thresholds) it approaches row count, and a forced
    // broadcast would be unbounded at the 100 TB design point. AQE converts
    // the join to broadcast at runtime when the map measures small, and
    // degrades to a shuffled join (never a driver OOM) when it doesn't.
    withLocal
      .join(indexed, Seq("source", "ip", "_local_id"))
      .drop("_local_id", "_epoch")
  }

  /** Skew-proof two-phase variant of [[withClusters]] — identical output
    * (SessionizerChunkedSpec proves equality), different physical shape.
    *
    * [[withClusters]] sorts each whole `(source, ip)` group in one task;
    * one hot IP with billions of rows serializes there. Here the
    * per-task unit is a `(source, ip, epoch DIV chunkSeconds)` time
    * chunk:
    *
    *  1. lag/cumsum sessionize WITHIN each chunk (bounded work:
    *     chunk duration × peak rate);
    *  2. per-chunk summaries (first/last epoch, session count) — a tiny
    *     frame — get a window scan per (source, ip) over CHUNKS to
    *     decide boundary merges (gap < threshold joins the first session
    *     of chunk k to the last of chunk k-1) and running id offsets;
    *  3. offsets broadcast-join back; dense global numbering as in
    *     [[withClusters]].
    *
    * Chunk boundaries can only ever split a session, never join two, and
    * step 2 restores exactly the splits whose boundary gap is below the
    * threshold, so the grouping equals the single-scan result.
    */
  def withClustersChunked(
      df: DataFrame,
      threshold: Long = DefaultThreshold,
      chunkSeconds: Long = 3600L): DataFrame = {
    require(chunkSeconds >= threshold,
      "chunk must be at least the session gap or boundary merges could chain")
    val epoch = col("utc_timestamp").cast(LongType)
    val chunk = (epoch / chunkSeconds).cast(LongType)
    val inChunk = Window.partitionBy(col("source"), col("ip"), col("_chunk")).orderBy(col("_epoch"))

    val delta = col("_epoch") - lag(col("_epoch"), 1).over(inChunk)
    val newSession = when(delta.isNull || delta < threshold, 0L).otherwise(1L)
    val local = df
      .withColumn("_epoch", epoch)
      .withColumn("_chunk", chunk)
      .withColumn("_cls",
        sum(newSession).over(inChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // chunk summaries: tiny relative to the data
    val summaries = local.groupBy(col("source"), col("ip"), col("_chunk"))
      .agg(min(col("_epoch")).as("_first"), max(col("_epoch")).as("_last"),
        (max(col("_cls")) + 1).as("_n"))
    val overChunks = Window.partitionBy(col("source"), col("ip")).orderBy(col("_chunk"))
    val merged = when(
      col("_first") - lag(col("_last"), 1).over(overChunks) < threshold, 1L)
      .otherwise(0L)
    val offsets = summaries
      .withColumn("_m", merged)
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          overChunks.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          - sum(col("_m")).over(
            overChunks.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("source"), col("ip"), col("_chunk"), col("_offset"))

    val withLocal = local
      .join(offsets, Seq("source", "ip", "_chunk"))
      .withColumn("_local_id", col("_cls") + col("_offset"))
      .drop("_cls", "_chunk", "_offset")

    val sessionKeys = withLocal
      .groupBy(col("source"), col("ip"), col("_local_id"))
      .agg(min(col("_epoch")).as("_session_start"))
    val keyRows = sessionKeys.orderBy(col("source"), col("ip"), col("_local_id"))
    val indexed = zipWithIndexDF(keyRows, "cluster")

    // Same AQE-decides rationale as in withClusters: no forced broadcast.
    withLocal
      .join(indexed, Seq("source", "ip", "_local_id"))
      .drop("_local_id", "_epoch")
  }

  /** Orders rows the way the reference leaves them after clustering
    * (O2: by session start time, then event time — dataframe.py:643-646).
    */
  def clusterOrdered(df: DataFrame): DataFrame = {
    val epoch = col("utc_timestamp").cast(LongType)
    val w = Window.partitionBy(col("cluster"))
    df.withColumn("_cstart", min(epoch).over(w))
      .orderBy(col("_cstart"), epoch)
      .drop("_cstart")
  }

  /** A1/J1 — per-(source, ip, cluster, method, request_uri) repeat count
    * (reference dataframe.py:70-89). Implemented as a window count, which
    * avoids the reference's groupBy + merge-back self-join entirely.
    */
  def withRequestCount(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(
      col("source"), col("ip"), col("cluster"), col("method"), col("request_uri"))
    df.withColumn("request_count", count(lit(1)).over(w))
  }

  /** Deterministic dense 0-based index in the row order of `df`
    * (which must already be globally ordered). Distributed equivalent of
    * pandas `factorize` numbering.
    */
  private def zipWithIndexDF(df: DataFrame, idName: String): DataFrame = {
    val spark = df.sparkSession
    val indexed = df.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    val schema = StructType(df.schema.fields :+ StructField(idName, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
      .select(col("source"), col("ip"), col("_local_id"), col(idName))
  }
}
