package graft.sql

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{
  InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset => StreamOffset}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableLog

/** `spark.readStream.table("tablelog.\`/path$changes\`")` — the
  * change feed as a DSv2 STREAMING metadata table, Delta CDF's
  * `readChangeFeed` shape on the catalog path (the v1
  * `tablelog-changes` source remains for format-based reads). The
  * schema is the table's (all-nullable) plus `change`
  * ("added" | "removed") and `_commit_version` — fixed at stream
  * start, the structured-streaming contract.
  *
  * Offsets ARE versions. Per micro-batch, each version in
  * `(start, end]` plans as:
  *
  *  - its MATERIALIZED change dir (written when
  *    `spark.graft.tablelog.writeChangeFiles` was on at commit time — the
  *    path that serves deletion-vector and equality-delete commits as
  *    row-level removals): the dir's parquet files scan directly,
  *    `_commit_version` stamped per partition — no diff
  *    reconstruction, no regexp on paths;
  *  - a PURE-APPEND commit (no change dir needed — the dominant
  *    commit kind on a sink table): the appended data files scan with
  *    `change = 'added'` constant — IO proportional to the commit;
  *  - an UNMATERIALIZED change commit fails the batch loudly with the
  *    enable-the-conf pointer (Delta's "CDF not enabled for this
  *    range" rule): reconstruction belongs to the batch
  *    [[TableLog.changes]] surface, not a re-planned stream.
  *
  * 100 TB shape: per-batch IO is proportional to the commit's changed
  * rows, never the table; planning reads one manifest per gap version
  * and lists only the served change dirs.
  */
private[sql] final class TableLogChangesTable(path: String)
  extends Table with SupportsRead {

  private def spark = SparkSession.active
  private val base = TableLog.snapshot(spark, path)

  private val cdfSchema: StructType = StructType(
    base.schema.fields.map(_.copy(nullable = true)) ++
      Seq(StructField("change", StringType, nullable = true),
        StructField("_commit_version", LongType, nullable = true)))

  override def name(): String = s"tablelog.`$path$$changes`"
  override def schema(): StructType = cdfSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = cdfSchema
      override def description(): String = s"TableLogChangesStream($path)"
      override def toMicroBatchStream(
          checkpointLocation: String): MicroBatchStream =
        new TableLogCdfMicroBatchStream(path, base, cdfSchema, options)
    }
  }
}

private[sql] final class TableLogCdfMicroBatchStream(
    path: String, base: TableLog.Snapshot, cdfSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private def spark = SparkSession.active

  private case class VOffset(v: Long) extends StreamOffset {
    override def json: String = v.toString
  }
  private def ver(o: StreamOffset): Long = o.json.trim.toLong

  /** Default: only changes committed AFTER stream start (Delta CDF's
    * streaming default); `fromVersion=<n>` replays from version n+1;
    * `fromVersion=0` streams the full history (the CREATE commit
    * arrives as `added` rows).
    */
  private val fromV: Long = Option(options.get("fromVersion")) match {
    case Some("latest") | None => base.version
    case Some(s) => s.toLong
  }

  private val maxVersionsPerTrigger: Option[Long] =
    Option(options.get("maxVersionsPerTrigger")).map { s =>
      val v = s.toLong
      require(v > 0, s"maxVersionsPerTrigger must be positive, got $v")
      v
    }

  override def initialOffset(): StreamOffset = VOffset(fromV)
  override def latestOffset(): StreamOffset =
    VOffset(TableLog.latestVersion(spark, path))
  override def latestOffset(
      start: StreamOffset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : StreamOffset = {
    val latest = TableLog.latestVersion(spark, path)
    VOffset(maxVersionsPerTrigger match {
      case Some(m) => math.min(latest, ver(start) + m)
      case None => latest
    })
  }
  override def reportLatestOffset(): StreamOffset =
    VOffset(TableLog.latestVersion(spark, path))
  override def deserializeOffset(json: String): StreamOffset =
    VOffset(json.trim.toLong)
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()

  /** One (change-dir rows) scan shape shared by every version: the
    * table columns plus the materialized `change` column.
    */
  private val changeReadSchema: StructType = StructType(
    base.schema.fields.map(_.copy(nullable = true)) :+
      StructField("change", StringType, nullable = true))

  private def changeScan(roots: Seq[Path]): Scan = {
    val index = new InMemoryFileIndex(
      spark, roots, Map.empty, Some(changeReadSchema))
    ParquetScanBuilder(spark, index, changeReadSchema, changeReadSchema,
      CaseInsensitiveStringMap.empty()).build()
  }

  private def appendScan(files: Seq[String]): Scan =
    TableLogParquet.build(spark, path, base.copy(files = files), files)

  override def planInputPartitions(
      start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val (lo, hi) = (ver(start), ver(end))
    if (hi <= lo) return Array.empty
    val f = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    def snapAt(v: Long): Option[TableLog.Snapshot] =
      if (v <= 0L) None else Some(TableLog.snapshot(spark, path, Some(v)))
    (lo + 1 to hi).foreach { v =>
      val cp = new Path(TableLog.changesPath(path, v))
      if (f.exists(cp)) {
        changeScan(Seq(cp)).toBatch.planInputPartitions().foreach(ip =>
          out += CdfPartition(ip, fromChangeDir = true, v))
      } else {
        val prev = snapAt(v - 1)
        val cur = snapAt(v).get
        val prevFiles = prev.map(_.files.toSet).getOrElse(Set.empty)
        val pureAppend = prev.forall { p =>
          p.files.forall(cur.files.toSet.contains) &&
            p.dvs.filter(_._2.nonEmpty) == cur.dvs.filter(_._2.nonEmpty) &&
            p.eqd == cur.eqd
        }
        if (!pureAppend) throw new IllegalStateException(
          s"tablelog $$changes stream: version $v of $path is a change " +
            "commit with no materialized change files — enable " +
            "spark.graft.tablelog.writeChangeFiles at write time so " +
            "delete/update/merge-on-read commits stream as row-level " +
            "changes, or replay the range with the batch " +
            "TableLog.changes surface")
        val newFiles = cur.files.filterNot(prevFiles)
        if (newFiles.nonEmpty)
          appendScan(newFiles).toBatch.planInputPartitions().foreach(ip =>
            out += CdfPartition(ip, fromChangeDir = false, v))
      }
    }
    out.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdfReaderFactory(
      changeScan(Nil).toBatch.createReaderFactory(), changeReadSchema,
      appendScan(Nil).toBatch.createReaderFactory(),
      appendScan(Nil).readSchema(),
      cdfSchema)
}

/** One change-feed partition: the inner parquet partition, whether it
  * came from a materialized change dir (rows carry `change`) or a
  * pure-append commit (constant "added"), and the committing version.
  */
private[sql] final case class CdfPartition(
    inner: InputPartition, fromChangeDir: Boolean, version: Long)
  extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Row-based readers projecting each inner row to the CDF shape:
  * table columns by name, `change` from the materialized column or
  * the "added" constant, `_commit_version` from the partition — a
  * codegen'd UnsafeProjection per partition, no per-row allocation
  * beyond it.
  */
private[sql] final class CdfReaderFactory(
    changeF: PartitionReaderFactory, changeSchema: StructType,
    appendF: PartitionReaderFactory, appendSchema: StructType,
    cdfSchema: StructType)
  extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case CdfPartition(inner, fromChangeDir, version) =>
        val (factory, innerSchema) =
          if (fromChangeDir) (changeF, changeSchema)
          else (appendF, appendSchema)
        val base = factory.createReader(inner)
        val byName = innerSchema.fieldNames.zipWithIndex.toMap
        val proj = ce.UnsafeProjection.create(
          cdfSchema.fields.map { fld =>
            fld.name match {
              case "_commit_version" =>
                ce.Literal(version, LongType): ce.Expression
              case "change" if !fromChangeDir =>
                ce.Literal(UTF8String.fromString("added"), StringType)
              case other => byName.get(other) match {
                case Some(i) =>
                  ce.BoundReference(i, fld.dataType, nullable = true)
                case None => ce.Literal(null, fld.dataType)
              }
            }
          }.toIndexedSeq)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean =
            if (base.next()) { current = proj(base.get()); true } else false
          override def get(): InternalRow = current
          override def close(): Unit = base.close()
        }
      case other => throw new IllegalStateException(
        s"TableLogChangesStream: unexpected partition $other")
    }
}
