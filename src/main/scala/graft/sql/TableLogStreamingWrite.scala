package graft.sql

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo,
  WriterCommitMessage}
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
  * PARTITIONED tables stream too: rows route into their hive
  * partition dirs on the executors
  * ([[TableLogPartitionedRowWriter]]) and the epoch commit records
  * the per-file partition values — partition pruning works on the
  * streamed data like on any other commit.
  */
private[sql] final class TableLogStreamingWrite(
    path: String, queryId: String, dataSchema: StructType,
    partCols: Seq[String])
  extends StreamingWrite {

  private def spark = SparkSession.active

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val (hconf, codec) = TableLogWriteConf.snapshot(spark)
    new TableLogStreamingWriterFactory(
      TableLog.dataPath(path), dataSchema.json,
      partCols.mkString(","), codec,
      new SerializableWritable(hconf), TableLogWriteConf.maxOpen(spark))
  }

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (names, parts) = TableLogWriteConf.collectFiles(messages)
    // empty epochs commit nothing (no version spam from idle
    // triggers); replaying an empty epoch appends nothing — exactly
    // once holds without a tag
    if (names.nonEmpty) {
      TableLog.commitStagedOptimistic(spark, path, names, dataSchema,
        s"stream-$queryId-$epochId", parts)
      ()
    }
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    TableLogWriteConf.dropFiles(spark, path, messages)
}

/** Shared write-side plumbing: the hadoop-conf snapshot the
  * executor-side ParquetWriteSupport needs (prepareWrite's contract),
  * and message folding/cleanup for both the streaming and the
  * dynamic-overwrite writers.
  */
private[sql] object TableLogWriteConf {
  def snapshot(spark: SparkSession): (Configuration, String) = {
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
    (hconf, codec.name())
  }

  /** Per-task open-writer cap for partition-routing writers
    * (`spark.graft.tablelog.maxOpenPartitionWriters`, default 64):
    * beyond it the least-recently-written partition's file closes and
    * later rows of that partition open a fresh file.
    */
  def maxOpen(spark: SparkSession): Int = spark.conf
    .get("spark.graft.tablelog.maxOpenPartitionWriters", "64").toInt

  /** (all file names, per-file partition records) across messages. */
  def collectFiles(messages: Array[WriterCommitMessage])
      : (Seq[String], Map[String, Seq[String]]) = {
    val flat = messages.collect { case TableLogFileMessage(n) => n }.toSeq
    val part = messages.collect { case TableLogPartFilesMessage(fs) => fs }
      .flatten.toSeq
    (flat ++ part.map(_._1), part.toMap)
  }

  def dropFiles(spark: SparkSession, path: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    collectFiles(messages)._1.foreach { n =>
      try { f.delete(new Path(TableLog.dataPath(path), n), false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

/** `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic` — a real
  * V2 BatchWrite (Spark has no V1 fallback for
  * OverwritePartitionsDynamic): executors route rows into their hive
  * partition dirs under `data/` ([[TableLogPartitionedRowWriter]]),
  * the driver commits ONE version replacing exactly the partitions
  * present in the batch ([[TableLog.commitDynamicOverwriteStaged]] —
  * untouched partitions carry over by name). An empty batch replaces
  * nothing.
  */
private[sql] final class TableLogDynamicOverwriteWrite(
    path: String, dataSchema: StructType, partCols: Seq[String])
  extends BatchWrite {

  private def spark = SparkSession.active

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val (hconf, codec) = TableLogWriteConf.snapshot(spark)
    val factory = new TableLogStreamingWriterFactory(
      TableLog.dataPath(path), dataSchema.json, partCols.mkString(","),
      codec, new SerializableWritable(hconf), TableLogWriteConf.maxOpen(spark))
    new DataWriterFactory {
      override def createWriter(
          partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        factory.createWriter(partitionId, taskId, epochId = 0L)
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (names, parts) = TableLogWriteConf.collectFiles(messages)
    if (names.nonEmpty) {
      TableLog.commitDynamicOverwriteStaged(spark, path, parts, dataSchema)
      ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    TableLogWriteConf.dropFiles(spark, path, messages)
}

/** One finished, flushed part file's data/-relative name. */
private[sql] final case class TableLogFileMessage(name: String)
  extends WriterCommitMessage

private[sql] final class TableLogStreamingWriterFactory(
    dataDir: String, schemaJson: String, partColsCsv: String,
    codecName: String, conf: SerializableWritable[Configuration],
    maxOpenPartitions: Int = 64)
  extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    if (partColsCsv.isEmpty)
      new TableLogRowWriter(dataDir, schemaJson, codecName, conf.value,
        partitionId, epochId)
    else
      new TableLogPartitionedRowWriter(dataDir, schemaJson,
        partColsCsv.split(",").toSeq, codecName, conf.value,
        partitionId, epochId, maxOpenPartitions)
}

/** One finished part file per PARTITION VALUE touched by this task:
  * `files` pairs each data/-relative path with its partition values
  * (aligned with the table's partition columns).
  */
private[sql] final case class TableLogPartFilesMessage(
    files: Seq[(String, Seq[String])]) extends WriterCommitMessage

/** Partition-routing executor writer: rows arrive in the TABLE's
  * schema (partition columns LAST — the analyzer's by-name
  * alignment); each row lands in the parquet writer of its hive
  * partition dir, PROJECTED to the data columns (the hive layout
  * stores partition values in dir names) through ONE reused
  * `UnsafeProjection` — the 100 TB ingest hot loop allocates nothing
  * per row (the parquet write support consumes the projected values
  * synchronously, so the reused buffer never escapes).
  *
  * Writers are opened per distinct partition value up to
  * `maxOpenPartitions`; past the cap this switches to Spark's own
  * dynamic-writer discipline: overflow rows SPILL-SORT by partition
  * key ([[org.apache.spark.sql.execution.UnsafeExternalRowSorter]] —
  * task-memory-managed, disk-backed) and drain at commit as one
  * sequential writer per key run. A 1,000-partition epoch therefore
  * writes ≤ partitions + maxOpen files — never the O(evictions) file
  * churn an evict-and-reopen LRU produces on adversarially
  * interleaved input. (Driver-side use without a TaskContext — tests
  * constructing the writer directly — falls back to evict-and-reopen,
  * which is correct, just file-noisier.)
  */
private[sql] final class TableLogPartitionedRowWriter(
    dataDir: String, schemaJson: String, partCols: Seq[String],
    codecName: String, conf: Configuration, partitionId: Int, epochId: Long,
    maxOpenPartitions: Int = 64)
  extends DataWriter[InternalRow] {

  import org.apache.spark.sql.catalyst.expressions.{
    Ascending, BoundReference, InterpretedOrdering, SortOrder, UnsafeProjection,
    UnsafeRow}

  private val HiveNullPart = "__HIVE_DEFAULT_PARTITION__"
  private val full = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val partIdx = partCols.map(full.fieldIndex)
  private val dataFields =
    full.fields.zipWithIndex.filterNot { case (f, _) =>
      partCols.contains(f.name) }
  private val dataSchema = StructType(dataFields.map(_._1))
  private val dataIdx = dataFields.map(_._2)
  // reused projections: data columns for the parquet writer, partition
  // columns for the routing key, the full row for the spill sorter
  private def ref(i: Int) =
    BoundReference(i, full.fields(i).dataType, full.fields(i).nullable)
  private val dataProj = UnsafeProjection.create(dataIdx.map(ref).toSeq)
  private val partProj = UnsafeProjection.create(partIdx.map(ref).toSeq)
  private val fullProj = UnsafeProjection.create(
    full.fields.indices.map(ref).toSeq)
  private val open = new java.util.LinkedHashMap[
    UnsafeRow, (ParquetWriter[InternalRow], String, Seq[String])](16, 0.75f, true)
  private val done =
    scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
  private var closed = false
  private var spill: org.apache.spark.sql.execution.UnsafeExternalRowSorter = _

  private def newWriter(vals: Seq[String])
      : (ParquetWriter[InternalRow], String) = {
    val dir = partCols.zip(vals).map { case (c, v) =>
      s"$c=" + (if (v == null) HiveNullPart
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v))
    }.mkString("/")
    val name =
      f"$dir/stream-e$epochId-p$partitionId%05d-${java.util.UUID.randomUUID()}.parquet"
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(dataSchema, c)
    val w = new TableLogParquetBuilder(new Path(dataDir, name))
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.valueOf(codecName))
      .build()
    (w, name)
  }

  private def partVals(row: InternalRow): Seq[String] = partIdx.map { i =>
    if (row.isNullAt(i)) null
    else row.get(i, full.fields(i).dataType).toString
  }

  private def spillRow(row: InternalRow): Unit = {
    if (spill == null)
      spill = org.apache.spark.sql.execution.UnsafeExternalRowSorter.create(
        full,
        new InterpretedOrdering(partIdx.map(i =>
          SortOrder(ref(i), Ascending)).toSeq),
        org.apache.spark.util.collection.unsafe.sort.PrefixComparators.LONG,
        new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer {
          private val zero =
            new org.apache.spark.sql.execution.UnsafeExternalRowSorter
              .PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : org.apache.spark.sql.execution.UnsafeExternalRowSorter
                .PrefixComputer.Prefix = { zero.value = 0L; zero }
        },
        org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes,
        false)
    spill.insertRow(fullProj(row))
  }

  /** Drain the spill sorter at commit: rows arrive grouped by
    * partition key, so ONE writer is open at a time — one file per
    * overflow partition.
    */
  private def drainSpill(): Unit = if (spill != null) {
    var curKey: UnsafeRow = null
    var cur: (ParquetWriter[InternalRow], String, Seq[String]) = null
    val it = spill.sort()
    while (it.hasNext) {
      val row = it.next()
      val key = partProj(row)
      if (curKey == null || curKey != key) {
        if (cur != null) {
          cur._1.close()
          done += ((cur._2, cur._3))
        }
        val vals = partVals(row)
        val (w, name) = newWriter(vals)
        cur = (w, name, vals)
        curKey = key.copy()
      }
      cur._1.write(dataProj(row))
    }
    if (cur != null) {
      cur._1.close()
      done += ((cur._2, cur._3))
    }
    spill.cleanupResources()
    spill = null
  }

  override def write(row: InternalRow): Unit = {
    val key = partProj(row) // reused buffer; copied only on first sight
    val cached = open.get(key)
    if (cached != null) { cached._1.write(dataProj(row)); return }
    if (open.size >= maxOpenPartitions) {
      if (org.apache.spark.TaskContext.get() != null) { spillRow(row); return }
      // no task context (driver-side direct use): evict-and-reopen
      val eldest = open.entrySet().iterator().next()
      eldest.getValue._1.close()
      done += ((eldest.getValue._2, eldest.getValue._3))
      open.remove(eldest.getKey)
      ()
    }
    val vals = partVals(row)
    val fresh = newWriter(vals)
    open.put(key.copy(), (fresh._1, fresh._2, vals))
    fresh._1.write(dataProj(row))
  }

  private def allFiles: Seq[(String, Seq[String])] = {
    val stillOpen = scala.jdk.CollectionConverters
      .IteratorHasAsScala(open.entrySet().iterator()).asScala
      .map(e => (e.getValue._2, e.getValue._3)).toSeq
    (done ++ stillOpen).toSeq
  }

  override def commit(): WriterCommitMessage = {
    drainSpill()
    scala.jdk.CollectionConverters
      .IteratorHasAsScala(open.values().iterator()).asScala
      .foreach(_._1.close())
    closed = true
    TableLogPartFilesMessage(allFiles.map { case (name, vals) =>
      name -> vals.map(v => if (v == null) HiveNullPart else v)
    })
  }

  override def abort(): Unit = {
    close()
    val f = new Path(dataDir).getFileSystem(conf)
    allFiles.foreach { case (name, _) =>
      try { f.delete(new Path(dataDir, name), false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  override def close(): Unit =
    if (!closed) {
      if (spill != null) {
        try spill.cleanupResources()
        catch { case scala.util.control.NonFatal(_) => () }
        spill = null
      }
      scala.jdk.CollectionConverters
        .IteratorHasAsScala(open.values().iterator()).asScala
        .foreach { case (w, _, _) =>
          try w.close()
          catch { case scala.util.control.NonFatal(_) => () }
        }
      closed = true
    }
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
