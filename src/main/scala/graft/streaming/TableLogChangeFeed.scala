package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftInterop, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.TableLog

/** Streaming CHANGE-FEED SOURCE over a [[TableLog]] table — the read
  * side of the exactly-once story (the write side is
  * [[StreamingOps]]'s `tableLogSink`): every committed version's
  * row-level changes (`change` = "added" | "removed",
  * `_commit_version` = the committing version) stream to downstream
  * incremental consumers — index maintenance, dashboard refresh,
  * derived-table upkeep — as micro-batches, Delta's Change Data Feed
  * shape re-expressed over this log.
  *
  * Offsets ARE table versions: `getOffset` probes the latest
  * committed version (checkpoint + O(since-checkpoint) HEADs — no log
  * listing), `getBatch(start, end)` returns
  * [[TableLog.changes]]`(start, end]` — a chain of per-version
  * [[TableLog.diff]]s, each reading only that commit's CHANGED files.
  * Restart-safe by construction: versions are durable and immutable,
  * so a replayed offset range reproduces the identical batch
  * (prefix-equality pinned against the batch `changes` surface in
  * TableLogChangeFeedSpec).
  *
  * Options: `path` (the table), `fromVersion` (stream changes
  * committed AFTER this version; default: latest at stream start —
  * Delta CDF's "only new changes" default), `onSchemaChange`
  * ("drop" | "fail", default "drop").
  *
  * 100 TB shape: per micro-batch IO is proportional to the commit's
  * changed files, never the table; offset resolution rides the
  * round-13 checkpointed log. The column set is fixed at stream start
  * (the table's schema then + `change`, `_commit_version`) — the
  * structured-streaming contract. Columns added by later evolution
  * are dropped from batches under the default; `onSchemaChange=fail`
  * instead FAILS the batch before its offset commits (Delta CDF's
  * move), so a restart against the same checkpoint re-resolves the
  * now-wider table schema and REPLAYS the evolution commit with the
  * new columns populated — column evolution costs one restart, never
  * silent data loss (spec-pinned).
  */
class TableLogChangeFeed extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "tablelog-changes"

  private def feedSchema(spark: SparkSession, path: String): StructType = {
    val base = TableLog.read(spark, path).schema
    StructType(base.fields.map(_.copy(nullable = true)) ++
      Seq(StructField("change", StringType, nullable = true),
        StructField("_commit_version", LongType, nullable = true)))
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "tablelog-changes: 'path' option is required"))
    (shortName(), schema.getOrElse(feedSchema(sqlContext.sparkSession, path)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = parameters("path")
    val from = parameters.get("fromVersion").map(_.toLong)
      .getOrElse(TableLog.latestVersion(spark, path))
    val onSchemaChange = parameters.getOrElse("onSchemaChange", "drop")
    require(onSchemaChange == "drop" || onSchemaChange == "fail",
      s"tablelog-changes: onSchemaChange must be 'drop' or 'fail', got $onSchemaChange")
    new TableLogChangeFeedSource(spark, path, from,
      schema.getOrElse(feedSchema(spark, path)),
      failOnSchemaChange = onSchemaChange == "fail")
  }
}

/** One change-feed stream: versions are the offsets. */
class TableLogChangeFeedSource(
    spark: SparkSession,
    path: String,
    fromVersion: Long,
    override val schema: StructType,
    failOnSchemaChange: Boolean = false) extends Source {

  private case class VersionOffset(v: Long) extends OffsetV1 {
    override def json: String = v.toString
  }

  // any OffsetV1 round-trips through its json (restarted streams hand
  // back SerializedOffset)
  private def ver(o: OffsetV1): Long = o.json.trim.toLong

  override def getOffset: Option[OffsetV1] = {
    val latest = TableLog.latestVersion(spark, path)
    if (latest <= fromVersion) None else Some(VersionOffset(latest))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val lo = start.map(ver).getOrElse(fromVersion)
    val hi = ver(end)
    val batch =
      if (hi <= lo)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else TableLog.changes(spark, path, lo, hi)
    // later evolution may have widened the feed beyond the declared
    // columns: under onSchemaChange=fail, fail BEFORE this batch's
    // offset commits — the restart re-resolves the wider schema and
    // replays these versions with the new columns populated
    val extra = batch.columns.filterNot(schema.fieldNames.contains)
    if (failOnSchemaChange && extra.nonEmpty)
      throw new IllegalStateException(
        s"tablelog-changes: table schema at $path evolved mid-stream " +
          s"(new columns: ${extra.mkString(", ")}); restart the stream " +
          "to pick up the widened schema (onSchemaChange=fail)")
    // align to the declared columns (a fixed source schema is the
    // streaming contract; under the default, evolved columns drop)
    val aligned = batch.select(schema.fields.map { f =>
      if (batch.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    GraftInterop.streamingFrame(spark, aligned.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
