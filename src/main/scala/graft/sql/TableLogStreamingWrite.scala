package graft.sql

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{
  DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StructType}

import graft.operators.TableLog

/** `df.writeStream.toTable("tablelog.`/path`")` — STREAMING_WRITE for
  * the DSv2 catalog, closing the SQL surface so a streaming pipeline
  * never leaves the catalog (pair with `readStream.table` on the
  * source side).
  *
  * Write path (the Delta shape): EXECUTORS write finished parquet
  * part files directly under the table's `data/` dir with fresh UUID
  * names — invisible until a manifest references them, the same
  * staging discipline as every other commit, and [[TableLog.vacuum]]'s
  * age horizon protects them from a concurrent sweep. The driver's
  * epoch commit then publishes ONE tagged version referencing exactly
  * the files the epoch's tasks reported
  * ([[TableLog.commitStagedOptimistic]]: footer-stat harvest + the
  * lock-free version CAS). Exactly once: the tag is
  * `stream-<queryId>-<epochId>` — queryId is the STABLE streaming
  * query id (survives restarts via the checkpoint), so a restarted
  * query replaying an epoch writes fresh files, finds the tag already
  * committed, and deletes its duplicates instead of double-appending.
  * Aborted epochs delete their reported files; writer-task failures
  * before report leave age-gated vacuum orphans.
  *
  * Partitioned tables are refused (the row writer emits a flat
  * layout) — use `foreachBatch` + [[TableLog.appendPartitioned]].
  */
private[sql] final class TableLogStreamingWrite(
    path: String, queryId: String, dataSchema: StructType)
  extends StreamingWrite {

  private def spark = SparkSession.active

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // executor-side ParquetWriteSupport reads these from the hadoop
    // conf (prepareWrite's contract); snapshot the session's values
    val hconf = new Configuration(spark.sessionState.newHadoopConf())
    val sqlc = spark.sessionState.conf
    hconf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlc.writeLegacyParquetFormat.toString)
    hconf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlc.parquetOutputTimestampType.toString)
    hconf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlc.parquetFieldIdWriteEnabled.toString)
    hconf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    val codec =
      try CompressionCodecName.valueOf(
        sqlc.getConf(SQLConf.PARQUET_COMPRESSION).toUpperCase(
          java.util.Locale.ROOT))
      catch { case _: IllegalArgumentException => CompressionCodecName.SNAPPY }
    new TableLogStreamingWriterFactory(
      TableLog.dataPath(path), dataSchema.json, codec.name(),
      new SerializableWritable(hconf))
  }

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val names = messages.collect { case TableLogFileMessage(n) => n }.toSeq
    // empty epochs commit nothing (no version spam from idle
    // triggers); replaying an empty epoch appends nothing — exactly
    // once holds without a tag
    if (names.nonEmpty) {
      TableLog.commitStagedOptimistic(spark, path, names, dataSchema,
        s"stream-$queryId-$epochId")
      ()
    }
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case TableLogFileMessage(n) => n }.foreach { n =>
      try { f.delete(new Path(TableLog.dataPath(path), n), false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

/** One finished, flushed part file's data/-relative name. */
private[sql] final case class TableLogFileMessage(name: String)
  extends WriterCommitMessage

private[sql] final class TableLogStreamingWriterFactory(
    dataDir: String, schemaJson: String, codecName: String,
    conf: SerializableWritable[Configuration])
  extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new TableLogRowWriter(dataDir, schemaJson, codecName, conf.value,
      partitionId, epochId)
}

/** Executor-side parquet writer over Spark's own row-to-parquet
  * WriteSupport (the exact bytes a batch write would produce, footer
  * stats included — the driver's commit harvests them). The file name
  * carries a fresh UUID, so concurrent epochs/attempts never collide
  * and a speculative duplicate is just an unreferenced orphan.
  */
private[sql] final class TableLogRowWriter(
    dataDir: String, schemaJson: String, codecName: String,
    conf: Configuration, partitionId: Int, epochId: Long)
  extends DataWriter[InternalRow] {

  private val name =
    f"stream-e$epochId-p$partitionId%05d-${java.util.UUID.randomUUID()}.parquet"
  private val file = new Path(dataDir, name)
  private val writer: ParquetWriter[InternalRow] = {
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(
      DataType.fromJson(schemaJson).asInstanceOf[StructType], c)
    new TableLogParquetBuilder(file)
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.valueOf(codecName))
      .build()
  }
  private var closed = false

  override def write(row: InternalRow): Unit = writer.write(row)

  override def commit(): WriterCommitMessage = {
    writer.close()
    closed = true
    TableLogFileMessage(name)
  }

  override def abort(): Unit = {
    if (!closed) {
      try writer.close()
      catch { case scala.util.control.NonFatal(_) => () }
      closed = true
    }
    try { file.getFileSystem(conf).delete(file, false); () }
    catch { case scala.util.control.NonFatal(_) => () }
  }

  override def close(): Unit =
    if (!closed) {
      try writer.close()
      catch { case scala.util.control.NonFatal(_) => () }
      closed = true
    }
}

private final class TableLogParquetBuilder(file: Path)
  extends ParquetWriter.Builder[InternalRow, TableLogParquetBuilder](file) {
  override def self(): TableLogParquetBuilder = this
  override def getWriteSupport(conf: Configuration)
      : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
    new ParquetWriteSupport
}
