package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.connector.catalog.{
  Identifier, SupportsDelete, SupportsNamespaces, SupportsRead,
  SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{
  Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{
  Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, LocalScan, PartitionReader, PartitionReaderFactory,
  Scan, ScanBuilder, Statistics, SupportsPushDownAggregates,
  SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset => StreamOffset}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.TableLog

/** SQL surface over [[graft.operators.TableLog]] — a DataSource-v2
  * `TableCatalog` so the versioned table log participates in plain
  * Spark SQL:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.tablelog", classOf[TableLogCatalog].getName)
  *   spark.sql("SELECT * FROM tablelog.`/data/docs` WHERE n_chars BETWEEN 100 AND 300")
  *   spark.sql("SELECT * FROM tablelog.`/data/docs` VERSION AS OF 3")
  *   spark.sql("SELECT * FROM tablelog.`/data/docs` TIMESTAMP AS OF '2026-01-01'")
  *   spark.sql("INSERT INTO tablelog.`/data/docs` SELECT ...")
  *   spark.sql("CREATE TABLE tablelog.`/data/new` (doc_id BIGINT, lang STRING) PARTITIONED BY (lang)")
  * }}}
  *
  * The identifier IS the table path (backtick-quoted; multi-part
  * identifiers join with '/'). Reads are Spark-native end to end:
  * the scan builder receives Spark's pushed filters, cuts the file
  * list against the MANIFEST's per-file bounds and partition records
  * (zero footer opens — the same pruning [[TableLog.readBand]] and
  * [[TableLog.readPartition]] do, but driven by the optimizer's own
  * predicates), then delegates the surviving files to Spark's v2
  * parquet scan, so row-group pruning, bloom/dictionary filters,
  * vectorized decode, and whole-stage codegen all apply downstream
  * of the manifest cut. `VERSION AS OF` / `TIMESTAMP AS OF` map to
  * manifest versions ([[TableLog.versionAt]] binary search);
  * `INSERT INTO` commits through [[TableLog.append]] /
  * [[TableLog.appendPartitioned]] (schema evolution rules and the
  * optimistic-commit machinery unchanged). Time-traveled tables are
  * read-only.
  *
  * At 100 TB this is the read path that matters: the driver plans
  * from ONE manifest (or log checkpoint) read, hands Spark only the
  * surviving files, and never lists the data directory.
  */
class TableLogCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName = "tablelog"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def spark = SparkSession.active

  private def tablePath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def isTable(path: String): Boolean =
    try TableLog.versions(spark, path).nonEmpty
    catch { case _: Exception => false }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def tableExists(ident: Identifier): Boolean =
    isTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table =
    load(ident, None, timeTraveled = false)

  /** `VERSION AS OF <n>` (also accepts a tag name from the tag map).
    * Resolution order: a numeric string names that COMMITTED version
    * when its manifest exists; otherwise (non-numeric, or no such
    * version) the string is looked up as a tag — so an all-digit tag
    * (streaming sinks tag by batch id) is still reachable whenever it
    * doesn't collide with a live version number, instead of being
    * silently shadowed forever.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = splitMeta(ident).map(_._1).getOrElse(tablePath(ident))
    if (!isTable(path)) throw new NoSuchTableException(ident)
    val asNum =
      try Some(version.toLong) catch { case _: NumberFormatException => None }
    val v = asNum.filter(n => TableLog.versions(spark, path).contains(n))
      .orElse(TableLog.tags(spark, path).get(version))
      .orElse(asNum) // numeric but uncommitted and untagged: fail as a version
      .getOrElse(throw new NoSuchTableException(ident))
    load(ident, Some(v), timeTraveled = true)
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = splitMeta(ident).map(_._1).getOrElse(tablePath(ident))
    if (!isTable(path)) throw new NoSuchTableException(ident)
    load(ident, Some(TableLog.versionAt(spark, path, timestampMicros / 1000L)),
      timeTraveled = true)
  }

  /** Iceberg-style metadata tables: `tablelog.`/path$files`` (also
    * `$partitions`, `$history`, `$tags`) — the log's own state as
    * JOIN-able SQL relations, answered from manifests/checkpoints
    * with zero data IO. `$files`/`$partitions` honor VERSION AS OF.
    */
  private val MetaSuffixes =
    Set("files", "partitions", "history", "tags", "changes")

  private def splitMeta(ident: Identifier): Option[(String, String)] = {
    val raw = tablePath(ident)
    val i = raw.lastIndexOf('$')
    if (i <= 0) None
    else {
      val (p, s) = (raw.substring(0, i), raw.substring(i + 1))
      if (MetaSuffixes.contains(s) && isTable(p)) Some((p, s)) else None
    }
  }

  private def load(ident: Identifier, version: Option[Long],
      timeTraveled: Boolean): Table = {
    splitMeta(ident) match {
      case Some((p, "changes")) =>
        require(version.isEmpty,
          "TableLogCatalog: $changes does not time-travel — pick the " +
            "range with the fromVersion option")
        new TableLogChangesTable(p)
      case Some((p, suffix)) =>
        TableLogMetaTable(spark, p, suffix, version)
      case None =>
        val path = tablePath(ident)
        if (!isTable(path)) throw new NoSuchTableException(ident)
        new TableLogTable(path, TableLog.snapshot(spark, path, version),
          timeTraveled)
    }
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = tablePath(ident)
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"TableLogCatalog: only identity partitioning is supported, got $t")
      t.references().head.fieldNames().mkString(".")
    }
    TableLog.createEmpty(spark, path, schema, partCols)
    load(ident, None, timeTraveled = false)
  }

  /** `ALTER TABLE tablelog.` ADD COLUMN(S)` — a schema-only committed
    * version via [[TableLog.addColumns]] (zero data IO; old rows read
    * NULL, the add-only evolution rule appends already follow). Every
    * other TableChange (drop/retype/rename/position) keeps failing
    * loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = tablePath(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "TableLogCatalog: ALTER TABLE ADD COLUMN supports top-level " +
            s"columns only, got ${a.fieldNames().mkString(".")}")
        require(a.position() == null,
          "TableLogCatalog: column positions are not supported — new " +
            "columns append (the schema-evolution order)")
        org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), nullable = true)
      case other => throw new UnsupportedOperationException(
        s"TableLogCatalog: ALTER TABLE supports ADD COLUMN only, got $other " +
          "— retypes/drops/renames are a rewrite, not an ALTER")
    }
    TableLog.addColumns(spark, path, adds)
    load(ident, None, timeTraveled = false)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = tablePath(ident)
    if (!isTable(path)) false
    else {
      val p = new Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "TableLogCatalog: RENAME not supported — the identifier is the path")

  // --- maintenance procedures: CALL tablelog.optimize(...) etc. ---
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    TableLogProcedures.load(ident.name)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    TableLogProcedures.names.map(n => Identifier.of(namespace, n)).toArray

  // --- SupportsNamespaces: only the root namespace exists ---
  override def listNamespaces(): Array[Array[String]] = Array.empty
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean = true
  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = util.Collections.emptyMap()
  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("TableLogCatalog: no namespaces")
  override def alterNamespace(
      namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException("TableLogCatalog: no namespaces")
  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = false
}

/** One TableLog version as a DSv2 table: schema and partitioning from
  * the manifest, reads through [[TableLogScanBuilder]], inserts
  * through the V1 write fallback into [[TableLog.append]].
  */
private[graft] class TableLogTable(
    val path: String, val snap: TableLog.Snapshot, val timeTraveled: Boolean)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  override def name(): String =
    if (timeTraveled) s"tablelog.`$path` (v${snap.version})"
    else s"tablelog.`$path`"

  override def schema(): StructType = snap.schema

  override def partitioning(): Array[Transform] =
    snap.partCols.map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] =
    Map("path" -> path, "version" -> snap.version.toString).asJava

  override def capabilities(): util.Set[TableCapability] =
    if (timeTraveled) util.EnumSet.of(TableCapability.BATCH_READ)
    // BATCH_WRITE rides along with V1_BATCH_WRITE because the
    // dynamic-overwrite capability check demands it literally (the
    // append/truncate paths still take the V1 fallback — the planner
    // dispatches on the Write being a V1Write, not on capabilities)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_DYNAMIC)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TableLogScanBuilder(path, snap, options)

  /** `DELETE FROM tablelog.` — the analyzer's pushed conjunction maps
    * to [[TableLog.deleteWhere]] (a committed version: only files
    * possibly holding matches rewrite, the rest carry over by name;
    * partitioned tables route survivors through their hive dirs).
    * Refused when any filter doesn't translate — better an error
    * than a silent partial delete.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    !timeTraveled && filters.forall(f => TableLogSql.filterColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(!timeTraveled,
      s"TableLogCatalog: cannot DELETE from time-traveled version ${snap.version}")
    val spark = SparkSession.active
    // KEY-shaped deletes route to equality-delete sidecars under the
    // conf: `DELETE FROM t WHERE k IN (...)` / `WHERE k = v` commits
    // one key-list sidecar — zero data files read or written, no
    // discovery scan (cheaper than even the positional DV route).
    // The analyzer's companion IsNotNull(k) is implied by key
    // equality and is dropped; every other shape falls through to the
    // predicate paths below.
    if (spark.conf.get("spark.graft.tablelog.equalityDeletes", "false")
      .toBoolean) {
      def keyField(c: String) = snap.schema.fields.find(f =>
        f.name == c && TableLog.supportedEqType(f.dataType))
      def route(c: String, vs: Array[Any]): Boolean = keyField(c) match {
        case Some(fld) if vs.nonEmpty && !vs.contains(null) =>
          val df = spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](
              java.util.Arrays.asList(
                vs.map(v => org.apache.spark.sql.Row(v)): _*)),
            org.apache.spark.sql.types.StructType(Seq(fld.copy(
              nullable = false))))
          TableLog.deleteByKey(spark, path, df)
          true
        case _ => false
      }
      val rest = filters.filterNot(_.isInstanceOf[sources.IsNotNull])
      val restNames = rest.flatMap(_.references).distinct
      val notNullsOk = filters.collect {
        case sources.IsNotNull(c) => c
      }.forall(c => restNames.contains(c))
      val routed = notNullsOk && (rest match {
        case Array(sources.In(c, vs)) => route(c, vs)
        case Array(sources.EqualTo(c, v)) if v != null => route(c, Array(v))
        case _ => false
      })
      if (routed) return
    }
    val cols = filters.map(f => TableLogSql.filterColumn(f).getOrElse(
      throw new UnsupportedOperationException(
        s"TableLogCatalog: cannot translate DELETE predicate $f")))
    val pred = cols.reduceOption(_ && _)
      .getOrElse(throw new UnsupportedOperationException(
        "TableLogCatalog: unconditional DELETE — drop the table instead"))
    TableLog.deleteWhere(spark, path, pred)
  }

  /** INSERT INTO appends; INSERT OVERWRITE replaces — wholesale under
    * the default (truncate) mode, per-present-partition under
    * `partitionOverwriteMode=dynamic` (Spark plans
    * OverwritePartitionsDynamic and calls
    * [[SupportsDynamicOverwrite.overwriteDynamicPartitions]]); both
    * are committed versions, time travel intact.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!timeTraveled,
      s"TableLogCatalog: cannot write to time-traveled version ${snap.version}")
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate
      with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      private var mode: String = "append"
      override def truncate(): WriteBuilder = { mode = "truncate"; this }
      override def overwriteDynamicPartitions(): WriteBuilder = {
        mode = "dynamic"; this
      }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val s = SparkSession.active
              mode match {
                case "dynamic" =>
                  TableLog.overwritePartitionsDynamic(s, path, data)
                case "truncate" => TableLog.overwrite(s, path, data)
                case _ =>
                  if (snap.partCols.isEmpty) TableLog.append(s, path, data)
                  else TableLog.appendPartitioned(s, path, data)
              }
              ()
            }
          }
        // writeStream.toTable: epoch-committed exactly-once appends
        // (see TableLogStreamingWrite); the queryId in the tag is the
        // STABLE streaming query id, so restarts replay idempotently.
        // Only APPEND mode streams: the table advertises TRUNCATE for
        // batch INSERT OVERWRITE, so a complete-mode streaming
        // aggregation passes Spark's capability check and calls
        // truncate() on this builder — appending those epochs would
        // silently accumulate duplicate full snapshots. Fail loudly
        // instead.
        override def toStreaming: org.apache.spark.sql.connector.write
            .streaming.StreamingWrite = {
          if (mode != "append")
            throw new UnsupportedOperationException(
              "TableLogCatalog: streaming writes support only APPEND " +
                s"output mode (got a $mode streaming write — a " +
                "complete/update-mode aggregation would re-append every " +
                "epoch's full snapshot)")
          new TableLogStreamingWrite(path, info.queryId(), info.schema(),
            snap.partCols)
        }
        // INSERT OVERWRITE under partitionOverwriteMode=dynamic has
        // NO V1 fallback in Spark — a real V2 BatchWrite routes rows
        // into their hive dirs on the executors and the driver
        // replaces exactly the partitions present in the batch
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
          if (mode == "dynamic")
            new TableLogDynamicOverwriteWrite(path, info.schema(),
              snap.partCols)
          else throw new UnsupportedOperationException(
            s"TableLogCatalog: unexpected V2 batch write in mode $mode")
      }
    }
  }
}

/** The catalog's planner: Spark pushes its filters here; files whose
  * manifest bounds / partition records cannot match are cut BEFORE
  * the parquet scan is built (the decision reads zero footers), then
  * the pushed predicates are re-pushed into the delegated v2 parquet
  * scan so row-group statistics, dictionary, and bloom filters keep
  * working inside the surviving files. All filters are also reported
  * back as residual — bounds are per-file, not per-row.
  */
private[sql] class TableLogScanBuilder(
    path: String, snap: TableLog.Snapshot,
    scanOptions: CaseInsensitiveStringMap)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates with SupportsPushDownLimit {

  private val spark = SparkSession.active
  private var filters: Array[Filter] = Array.empty
  private var required: Option[StructType] = None
  private var pushedAgg: Option[Aggregation] = None

  /** Every file in the snapshot carries a partition record, so a
    * partition-equality filter decides each file EXACTLY (all rows of
    * a file share its partition values) — such filters are fully
    * enforced by the manifest cut and need no residual re-check,
    * which is also what lets Spark push aggregates below them.
    */
  private def partRecordsComplete: Boolean =
    snap.partCols.nonEmpty && snap.files.forall(snap.parts.contains)

  private def trustedPartCol(c: String): Boolean =
    snap.partCols.contains(c) &&
      snap.schema.fields.find(_.name == c).exists(_.dataType match {
        case StringType | IntegerType | LongType | ShortType => true
        case _ => false
      })

  /** NULL partition values land under hive's default-partition
    * directory; the record carries the sentinel. A real string value
    * equal to the sentinel is ambiguous — then nothing about the
    * column is exact.
    */
  private val HiveNullPart = "__HIVE_DEFAULT_PARTITION__"

  private def isExactPartitionFilter(f: Filter): Boolean =
    partRecordsComplete && (f match {
      case sources.EqualTo(c, v) => v != null && trustedPartCol(c) &&
        v.toString != HiveNullPart
      case sources.In(c, vs) => vs.nonEmpty && vs.forall(_ != null) &&
        trustedPartCol(c) && vs.forall(_.toString != HiveNullPart)
      case sources.IsNotNull(c) => trustedPartCol(c)
      case sources.IsNull(c) => trustedPartCol(c)
      case _ => false
    })

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    // exact partition filters are fully served by the manifest cut;
    // everything else stays residual (bounds are per-file, not per-row)
    fs.filterNot(isExactPartitionFilter)
  }

  override def pushedFilters(): Array[Filter] =
    filters.filter(f => isExactPartitionFilter(f) || toCatalyst(f).isDefined)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  // --- manifest-only aggregates: COUNT(*) from per-file row counts,
  // MIN/MAX from per-file bounds, GROUP BY partition columns from the
  // partition record — one manifest read, zero data IO ---

  private def aggColName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }

  private def nullsOf(file: String, c: String): Option[Long] =
    snap.stats.get(file).flatMap(_.get(TableLog.nullsKey(c)))
      .map(_.min.toLong)

  private def rowsIn(file: String): Option[Long] =
    snap.stats.get(file).flatMap(_.get(TableLog.RowsKey)).map(_.min.toLong)

  /** Integral/floating bounds are always exact in parquet footers.
    * STRING bounds serve only when every file recorded them with the
    * footer's exactness flags intact (kind "s"; a possibly-TRUNCATED
    * bound — kind "t", from a writer configured with
    * parquet.statistics.truncate.length — still prunes as a superset
    * range but must never be served as the MIN/MAX answer itself).
    */
  private def boundServable(c: String): Boolean = {
    val isString = snap.schema.fields.find(_.name == c)
      .exists(_.dataType == StringType)
    snap.schema.fields.find(_.name == c).exists(_.dataType match {
      case org.apache.spark.sql.types.ByteType | ShortType | IntegerType |
           LongType | org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType | StringType => true
      case _ => false
    }) && snap.files.forall { n =>
      // every file decides: a bound for the column (exact, for
      // strings), provably empty, or provably ALL NULL in the column
      // (contributes no values)
      snap.stats.get(n).exists(st =>
        st.get(c).exists(b => !isString || b.kind == "s") ||
          st.get(TableLog.RowsKey).exists(_.min.toLong == 0L) ||
          (for { nl <- nullsOf(n, c); r <- rowsIn(n) } yield nl >= r)
            .getOrElse(false))
    }
  }

  private def countServable: Boolean =
    snap.files.forall(n =>
      snap.stats.get(n).exists(_.contains(TableLog.RowsKey)))

  /** COUNT(col) = rows - nulls per file; servable when every file
    * recorded both.
    */
  private def countColServable(c: String): Boolean =
    snap.files.forall(n => snap.stats.get(n).exists(st =>
      st.contains(TableLog.RowsKey) && st.contains(TableLog.nullsKey(c))))

  private def canPushAgg(a: Aggregation): Boolean = {
    // live deletion vectors / equality deletes make per-file
    // counts/bounds describe PHYSICAL rows, some of which are dead:
    // never serve aggregates from the manifest then (the compensated
    // scan answers instead)
    if (snap.hasDvs || snap.hasEqDeletes) return false
    val groupsOk = a.groupByExpressions.forall(e =>
      aggColName(e).exists(trustedPartCol)) &&
      (a.groupByExpressions.isEmpty || partRecordsComplete)
    val aggsOk = a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case _: CountStar => countServable
        case m: Min => aggColName(m.column).exists(boundServable) && countServable
        case m: Max => aggColName(m.column).exists(boundServable) && countServable
        case ct: Count if !ct.isDistinct =>
          aggColName(ct.column).exists(countColServable)
        case _ => false
      }
    groupsOk && aggsOk
  }

  // --- LIMIT pushdown: keep only enough files (by manifest row
  // counts) to cover the limit — `SELECT * FROM t LIMIT 100` on a
  // 100k-file table plans one file. Partial push: Spark's own Limit
  // stays on top and trims the surplus rows of the last file.
  private var limit: Option[Int] = None

  override def pushLimit(l: Int): Boolean =
    // merge-on-read-deleted files' manifest counts overstate visible
    // rows, so a file prefix covering the limit could come up short —
    // don't push
    if (countServable && !snap.hasDvs && !snap.hasEqDeletes) {
      limit = Some(l); true
    } else false

  override def isPartiallyPushed(): Boolean = true

  override def supportCompletePushDown(a: Aggregation): Boolean = canPushAgg(a)

  override def pushAggregation(a: Aggregation): Boolean =
    if (canPushAgg(a)) { pushedAgg = Some(a); true } else false

  private def buildAggScan(kept: Seq[String], a: Aggregation): Scan = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    val groupCols = a.groupByExpressions.toSeq.map(e => aggColName(e).get)
    val partIdx = snap.partCols.zipWithIndex.toMap
    def dt(c: String): DataType =
      snap.schema.fields.find(_.name == c).get.dataType
    // rows written with a NULL partition value land under hive's
    // default-partition directory and the record carries the sentinel
    // — the group key is NULL (what Spark's own partition recovery
    // reads back), for every type: returning the literal sentinel
    // string would be a silently wrong group, and integral columns
    // would crash parsing it
    def partInternal(c: String, v: String): Any =
      if (v == HiveNullPart) null
      else dt(c) match {
        case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(v)
        case LongType => v.toLong
        case IntegerType => v.toInt
        case ShortType => v.toShort
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    def boundInternal(c: String, v: String): Any = dt(c) match {
      case LongType => v.toLong
      case IntegerType => v.toLong.toInt
      case ShortType => v.toLong.toShort
      case ByteType => v.toLong.toByte
      case DoubleType => v.toDouble
      case FloatType => v.toFloat
      // exactness gated by boundServable (kind "s" in every file)
      case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(v)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    def rowsOf(n: String): Long = snap.stats(n)(TableLog.RowsKey).min.toLong
    // all-null files (boundServable admits them) carry no bound and
    // contribute no values
    def nonEmptyBounds(files: Seq[String], c: String): Seq[TableLog.ColBound] =
      files.filter(rowsOf(_) > 0L).flatMap(n => snap.stats(n).get(c))
    val groups: Seq[(Seq[String], Seq[String])] =
      if (groupCols.isEmpty) Seq(Seq.empty[String] -> kept)
      else kept.groupBy(n => groupCols.map(c => snap.parts(n)(partIdx(c))))
        .toSeq
    val rows = groups.map { case (gvals, files) =>
      val out = new Array[Any](groupCols.size + a.aggregateExpressions.length)
      groupCols.zip(gvals).zipWithIndex.foreach { case ((c, v), i) =>
        out(i) = partInternal(c, v)
      }
      a.aggregateExpressions.zipWithIndex.foreach { case (ae, i) =>
        out(groupCols.size + i) = ae match {
          case _: CountStar => files.map(rowsOf).sum
          case ct: Count =>
            val c = aggColName(ct.column).get
            files.map(n => rowsOf(n) -
              snap.stats(n)(TableLog.nullsKey(c)).min.toLong).sum
          case m: Min =>
            val c = aggColName(m.column).get
            val bs = nonEmptyBounds(files, c)
            if (bs.isEmpty) null
            else bs.map(b => boundInternal(c, b.min)).min(anyNumOrdering(dt(c)))
          case m: Max =>
            val c = aggColName(m.column).get
            val bs = nonEmptyBounds(files, c)
            if (bs.isEmpty) null
            else bs.map(b => boundInternal(c, b.max)).max(anyNumOrdering(dt(c)))
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
      }
      new GenericInternalRow(out): org.apache.spark.sql.catalyst.InternalRow
    }
    val schema = StructType(
      groupCols.map(c => StructField(c, dt(c), nullable = true)) ++
        a.aggregateExpressions.toSeq.map {
          case _: CountStar =>
            StructField("count(*)", LongType, nullable = false)
          case ct: Count =>
            StructField(s"count(${aggColName(ct.column).get})", LongType,
              nullable = false)
          case m: Min =>
            val c = aggColName(m.column).get
            StructField(s"min($c)", dt(c), nullable = true)
          case m: Max =>
            val c = aggColName(m.column).get
            StructField(s"max($c)", dt(c), nullable = true)
          case other => throw new IllegalStateException(s"unreachable: $other")
        })
    TableLogSql.recordAggServed(path)
    new TableLogLocalScan(schema, rows.toArray,
      "TableLogAggScan (manifest-only aggregates)")
  }

  private def anyNumOrdering(dt: org.apache.spark.sql.types.DataType)
      : Ordering[Any] = {
    import org.apache.spark.sql.types._
    (dt match {
      case LongType => Ordering.Long
      case IntegerType => Ordering.Int
      case ShortType => Ordering.Short
      case ByteType => Ordering.Byte
      case DoubleType => Ordering.Double.TotalOrdering
      case FloatType => Ordering.Float.TotalOrdering
      // UTF8String.compareTo is unsigned-byte order — the order the
      // parquet footer min/max were computed in, and Spark's own
      // string MIN/MAX order
      case StringType =>
        Ordering.comparatorToOrdering(
          java.util.Comparator.naturalOrder[
            org.apache.spark.unsafe.types.UTF8String]())
      case other => throw new IllegalStateException(s"unreachable: $other")
    }).asInstanceOf[Ordering[Any]]
  }

  override def build(): Scan = {
    val matched = snap.files.filter(n => filters.forall(mayMatch(n, _)))
    val kept = limit match {
      case Some(l) if pushedAgg.isEmpty =>
        // prefix of files whose recorded rows cover the limit
        // (countServable gated pushLimit, so every file has a count)
        var acc = 0L
        val keep = Seq.newBuilder[String]
        val it = matched.iterator
        while (it.hasNext && acc < l) {
          val n = it.next()
          keep += n
          acc += snap.stats(n)(TableLog.RowsKey).min.toLong
        }
        keep.result()
      case _ => matched
    }
    TableLogSql.recordPlanned(path, kept.size, snap.files.size)
    if (pushedAgg.isDefined) buildAggScan(kept, pushedAgg.get)
    else {
      val dvKept = kept.filter(n => snap.dvs.get(n).exists(_.nonEmpty))
      val eqKept = kept.filter(n => snap.eqFor(n).nonEmpty)
      val inner: Scan =
        if (kept.isEmpty) new TableLogEmptyScan(required.getOrElse(snap.schema))
        else if (dvKept.isEmpty && eqKept.isEmpty)
          TableLogParquet.build(spark, path, snap, kept, required,
            filters.toSeq.flatMap(toCatalyst))
        else
          // deletion vectors / equality deletes live in the kept set:
          // the scan ITSELF compensates (dead positions and matched
          // key tuples filtered inside the batch readers) —
          // correctness holds for every plan shape, with or without
          // the optimizer rewrite rule
          TableLogDvScan.build(spark, path, snap, kept, dvKept, eqKept,
            required, filters.toSeq.flatMap(toCatalyst))
      new TableLogScan(path, snap, inner, scanOptions)
    }
  }

  private def attr(name: String): Option[ce.AttributeReference] =
    snap.schema.fields.find(_.name == name)
      .map(f => ce.AttributeReference(f.name, f.dataType, f.nullable)())

  /** v1 Filter -> resolved catalyst predicate, for re-pushing into
    * the delegated parquet scan builder (its `pushFilters` wants
    * catalyst expressions; it splits partition vs data filters by
    * attribute NAME and translates back itself). Unsupported shapes
    * map to None and simply aren't re-pushed — they were already
    * returned as residual.
    */
  private def toCatalyst(f: Filter): Option[ce.Expression] = f match {
    case sources.EqualTo(a, v) if v != null =>
      attr(a).map(ar => ce.EqualTo(ar, ce.Literal.create(v, ar.dataType)))
    case sources.EqualNullSafe(a, v) if v != null =>
      attr(a).map(ar => ce.EqualNullSafe(ar, ce.Literal.create(v, ar.dataType)))
    case sources.GreaterThan(a, v) =>
      attr(a).map(ar => ce.GreaterThan(ar, ce.Literal.create(v, ar.dataType)))
    case sources.GreaterThanOrEqual(a, v) =>
      attr(a).map(ar => ce.GreaterThanOrEqual(ar, ce.Literal.create(v, ar.dataType)))
    case sources.LessThan(a, v) =>
      attr(a).map(ar => ce.LessThan(ar, ce.Literal.create(v, ar.dataType)))
    case sources.LessThanOrEqual(a, v) =>
      attr(a).map(ar => ce.LessThanOrEqual(ar, ce.Literal.create(v, ar.dataType)))
    case sources.In(a, vs) if vs.forall(_ != null) =>
      attr(a).map(ar =>
        ce.In(ar, vs.toSeq.map(v => ce.Literal.create(v, ar.dataType))))
    case sources.IsNull(a) => attr(a).map(ce.IsNull)
    case sources.IsNotNull(a) => attr(a).map(ce.IsNotNull)
    case sources.StringStartsWith(a, p) =>
      attr(a).map(ar => ce.StartsWith(ar, ce.Literal.create(p, StringType)))
    case sources.And(l, r) =>
      for { cl <- toCatalyst(l); cr <- toCatalyst(r) } yield ce.And(cl, cr)
    case sources.Or(l, r) =>
      for { cl <- toCatalyst(l); cr <- toCatalyst(r) } yield ce.Or(cl, cr)
    case sources.Not(c) => toCatalyst(c).map(ce.Not)
    case _ => None
  }

  /** May `file` contain a row matching `f`? Decides from the
    * manifest's per-file bounds and partition record only —
    * conservative keep on anything unknown. Partition-value equality
    * compares the recorded hive value; it is only trusted for string
    * and integral partition columns (other types' literal-to-dirname
    * round trips aren't canonical).
    */
  private def mayMatch(file: String, f: Filter): Boolean = {
    def bound(c: String) = snap.stats.get(file).flatMap(_.get(c))
    def partVal(c: String): Option[String] = {
      val i = snap.partCols.indexOf(c)
      if (i < 0) None
      else snap.parts.get(file).flatMap(_.lift(i)).filter(_ =>
        snap.schema.fields.find(_.name == c).exists(_.dataType match {
          case StringType | IntegerType | LongType | ShortType => true
          case _ => false
        }))
    }
    def eqMatch(c: String, v: Any): Boolean = partVal(c) match {
      case Some(pv) => pv == v.toString
      case None => bound(c).forall(b =>
        TableLog.boundReachesUpTo(b, v) && TableLog.boundReachesDownTo(b, v))
    }
    f match {
      case sources.EqualTo(c, v) if v != null => eqMatch(c, v)
      case sources.EqualNullSafe(c, v) if v != null => eqMatch(c, v)
      case sources.GreaterThan(c, v) if v != null =>
        bound(c).forall(TableLog.boundReachesUpTo(_, v))
      case sources.GreaterThanOrEqual(c, v) if v != null =>
        bound(c).forall(TableLog.boundReachesUpTo(_, v))
      case sources.LessThan(c, v) if v != null =>
        bound(c).forall(TableLog.boundReachesDownTo(_, v))
      case sources.LessThanOrEqual(c, v) if v != null =>
        bound(c).forall(TableLog.boundReachesDownTo(_, v))
      case sources.In(c, vs) =>
        vs.filter(_ != null) match {
          case Array() => true
          case nn => nn.exists(eqMatch(c, _))
        }
      // on partition columns NULL-ness is file-level truth (the hive
      // default-partition sentinel); on data columns the recorded
      // null counts decide: an all-null file can't satisfy IsNotNull,
      // a null-free file can't satisfy IsNull
      case sources.IsNotNull(c) => partVal(c) match {
        case Some(pv) => pv != HiveNullPart
        case None =>
          !(for { n <- nullsOf(file, c); r <- rowsIn(file) }
            yield n >= r).getOrElse(false)
      }
      case sources.IsNull(c) => partVal(c) match {
        case Some(pv) => pv == HiveNullPart
        case None => nullsOf(file, c).forall(_ > 0L)
      }
      case sources.And(l, r) => mayMatch(file, l) && mayMatch(file, r)
      case sources.Or(l, r) => mayMatch(file, l) || mayMatch(file, r)
      case _ => true // conservative: unknown shapes never prune
    }
  }
}

/** One metadata table: a read-only relation over the log's own state
  * (file list, partition rollup, history, tag map), computed lazily
  * at scan build and served as driver-local rows.
  */
private[sql] object TableLogMetaTable {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  private def row(vals: Any*): org.apache.spark.sql.catalyst.InternalRow =
    new GenericInternalRow(vals.toArray[Any])

  private def out(fields: (String, org.apache.spark.sql.types.DataType)*) =
    StructType(fields.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, t, nullable = true) })

  def apply(spark: SparkSession, path: String, suffix: String,
      version: Option[Long]): Table = {
    import org.apache.spark.sql.types.{LongType, StringType}
    def snap = TableLog.snapshot(spark, path, version)
    def rowsOf(s: TableLog.Snapshot, n: String): Any =
      s.stats.get(n).flatMap(_.get(TableLog.RowsKey))
        .map(b => b.min.toLong: Any).orNull
    def partStr(s: TableLog.Snapshot, n: String): Any =
      s.parts.get(n).map(vals =>
        UTF8String.fromString(
          s.partCols.zip(vals).map { case (c, v) => s"$c=$v" }
            .mkString("/")): Any).orNull
    val (tblSchema, rowsFn): (StructType,
        () => Array[org.apache.spark.sql.catalyst.InternalRow]) =
      suffix match {
        case "files" =>
          (out("file" -> StringType, "rows" -> LongType,
            "partition" -> StringType),
            () => {
              val s = snap
              s.files.map(n => row(UTF8String.fromString(n),
                rowsOf(s, n), partStr(s, n))).toArray
            })
        case "partitions" =>
          (out("partition" -> StringType, "n_files" -> LongType,
            "n_rows" -> LongType),
            () => {
              val s = snap
              s.files.groupBy(n => partStr(s, n)).toSeq.map {
                case (p, fs) =>
                  val counts = fs.map(rowsOf(s, _))
                  val total =
                    if (counts.contains(null)) null
                    else counts.map(_.asInstanceOf[Long]).sum: Any
                  row(p, fs.size.toLong, total)
              }.toArray
            })
        case "history" =>
          (out("version" -> LongType, "n_rows" -> LongType),
            () => TableLog.history(spark, path).collect()
              .map(r => row(r.getLong(0), r.getLong(1))))
        case "tags" =>
          (out("tag" -> StringType, "version" -> LongType),
            () => TableLog.tags(spark, path).toSeq.sortBy(_._2)
              .map { case (t, v) => row(UTF8String.fromString(t), v) }.toArray)
        case other =>
          throw new IllegalArgumentException(s"unknown metadata table $other")
      }
    new Table with SupportsRead {
      override def name(): String = s"tablelog.`$path$$$suffix`"
      override def schema(): StructType = tblSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan =
            new TableLogLocalScan(tblSchema, rowsFn(),
              s"TableLogMetaScan($suffix)")
        }
    }
  }
}

/** Shared construction of the delegated v2 parquet scan over an
  * explicit file list (batch reads and streaming micro-batches build
  * through here). For a PARTITIONED table with an empty file list the
  * partition schema is forced explicitly — inference has no
  * directories to see, and a reader factory built without the
  * partition columns would silently mis-shape later batches.
  */
private[sql] object TableLogParquet {
  def build(
      spark: SparkSession, path: String, snap: TableLog.Snapshot,
      files: Seq[String],
      required: Option[StructType] = None,
      catalystFilters: Seq[ce.Expression] = Nil,
      rowIndex: Boolean = false): Scan = {
    // parquet's reserved temp column: both the vectorized and the
    // parquet-mr readers FILL it with the row's file-absolute index
    // (correct under row-group pruning — generated from the block
    // metadata's starting index, not by counting returned rows)
    val extra =
      if (!rowIndex) Array.empty[org.apache.spark.sql.types.StructField]
      else Array(org.apache.spark.sql.types.StructField(
        TableLogDvScan.RowIndexCol, LongType, nullable = true))
    val dataSchema = StructType(
      snap.schema.fields.filterNot(f => snap.partCols.contains(f.name)) ++
        extra)
    val params: Map[String, String] =
      if (snap.partCols.isEmpty) Map.empty
      else Map("basePath" -> TableLog.dataPath(path))
    val spec =
      if (snap.partCols.isEmpty || files.nonEmpty) None
      else Some(org.apache.spark.sql.execution.datasources.PartitionSpec(
        StructType(snap.partCols.map(c =>
          snap.schema.fields(snap.schema.fieldIndex(c)))),
        Nil))
    val index = new InMemoryFileIndex(
      spark,
      files.map(n => new Path(TableLog.dataPath(path), n)),
      params, Some(snap.schema),
      userSpecifiedPartitionSpec = spec)
    val psb = ParquetScanBuilder(
      spark, index, StructType(snap.schema.fields ++ extra), dataSchema,
      new CaseInsensitiveStringMap(params.asJava))
    if (catalystFilters.nonEmpty) psb.pushFilters(catalystFilters)
    required.map(r =>
      if (rowIndex) StructType(r.fields ++ extra) else r)
      .orElse(if (rowIndex) Some(StructType(snap.schema.fields ++ extra))
        else None)
      .foreach(psb.pruneColumns)
    psb.build()
  }
}

/** The scan handed to Spark: batch work delegates to the inner v2
  * parquet scan (or the empty scan under total pruning) unchanged —
  * statistics included, so join planning still sees the real size —
  * and `toMicroBatchStream` turns the SAME table into a streaming
  * source ([[TableLogMicroBatchStream]]).
  */
private[sql] final class TableLogScan(
    path: String, snap: TableLog.Snapshot, inner: Scan,
    options: CaseInsensitiveStringMap)
  extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = inner.toBatch
  override def description(): String = inner.description()
  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TableLogMicroBatchStream(path, snap, options)
}

/** `spark.readStream.table("tablelog.\`path\`")` — the table itself
  * as a streaming source. Offsets ARE versions: the initial batch is
  * the table snapshot at `fromVersion` semantics (default 0 = the
  * whole current table; `fromVersion=latest` = only new commits;
  * `fromVersion=<n>` = commits after n), and every later micro-batch
  * reads exactly the files APPENDED in `(start, end]` — per-batch IO
  * proportional to the commit, never the table. A version range that
  * REWROTE or removed files (delete/optimize/restore) fails the
  * stream with a pointer to the change feed (Delta's non-append
  * rule); `skipChangeCommits=true` streams only the appended files
  * through such ranges. Restart-safe: versions are durable and
  * immutable, so a replayed offset range reproduces the identical
  * batch. The schema is fixed at stream start; wider later files
  * project down, narrower read NULL.
  */
private[sql] final class TableLogMicroBatchStream(
    path: String, snap: TableLog.Snapshot, options: CaseInsensitiveStringMap)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private def spark = SparkSession.active

  private case class VOffset(v: Long) extends StreamOffset {
    override def json: String = v.toString
  }
  private def ver(o: StreamOffset): Long = o.json.trim.toLong

  private val fromV: Long = Option(options.get("fromVersion")) match {
    case Some("latest") => snap.version
    case Some(s) => s.toLong
    case None => 0L
  }
  private val skipChangeCommits: Boolean =
    options.getBoolean("skipChangeCommits", false)

  /** Rate limiting: at most `maxVersionsPerTrigger` commits advance
    * per micro-batch, so a long-down consumer catching up on a busy
    * table replays in bounded batches instead of one giant one.
    */
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

  private def filesAt(v: Long): Seq[String] =
    if (v <= 0L) Nil else TableLog.files(spark, path, Some(v))

  /** Live deletion vectors + equality-delete sidecars at version `v`
    * — either kind of merge-on-read delete changes VISIBLE rows
    * without touching the file list, so append-only detection must
    * compare these alongside the file sets.
    */
  private def dvsAt(v: Long): (Map[String, Set[String]], Seq[String]) =
    if (v <= 0L) (Map.empty, Nil)
    else {
      val s = TableLog.snapshot(spark, path, Some(v))
      (s.dvs.collect { case (n, ds) if ds.nonEmpty => n -> ds.toSet },
        s.eqd.map(_.dir))
    }

  override def planInputPartitions(
      start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val (lo, hi) = (ver(start), ver(end))
    if (hi <= lo) return Array.empty
    val newFiles: Seq[String] =
      if (!skipChangeCommits) {
        // endpoint diff suffices: file names are fresh UUIDs, so ANY
        // rewrite/removal in the range shows at the endpoints — and a
        // deletion-vector delete (same files, fewer visible rows)
        // shows as a dv-map change
        val before = filesAt(lo).toSet
        val after = filesAt(hi)
        val removed = before -- after.toSet
        if (removed.nonEmpty || dvsAt(lo) != dvsAt(hi))
          throw new IllegalStateException(
            s"tablelog streaming read: versions ($lo, $hi] of $path rewrote, " +
              "removed, or merge-on-read-deleted rows (deletion vectors / " +
              "equality deletes; delete/optimize/restore) — the table " +
              "stream serves APPENDS. Use the change feed " +
              "(format graft.streaming.TableLogChangeFeed) for row-level " +
              "changes, or skipChangeCommits=true to skip change commits")
        after.filterNot(before)
      } else {
        // Delta's skipChangeCommits: a version that removed files OR
        // grew a deletion vector is a CHANGE commit — its additions
        // (survivor rewrites) are NOT appends and are skipped wholesale
        (lo + 1 to hi).flatMap { v =>
          val prev = filesAt(v - 1).toSet
          val cur = filesAt(v)
          if ((prev -- cur.toSet).nonEmpty || dvsAt(v - 1) != dvsAt(v)) Nil
          else cur.filterNot(prev)
        }
      }
    if (newFiles.isEmpty) Array.empty
    else TableLogParquet.build(spark, path, snap.copy(files = newFiles), newFiles)
      .toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // file-independent for parquet: built once over an empty index
    // (explicit partition spec keeps partitioned shapes correct)
    TableLogParquet.build(spark, path, snap.copy(files = Nil), Nil)
      .toBatch.createReaderFactory()
}

/** Complete aggregate pushdown served from the MANIFEST: COUNT(*)
  * from per-file row counts, MIN/MAX from per-file column bounds,
  * GROUP BY partition columns from the partition record. A
  * [[LocalScan]], so the plan collapses to a LocalTableScan — zero
  * data files opened, zero Spark jobs; at a 100k-file 100 TB table
  * this is the difference between one manifest read and a full scan.
  */
private[sql] final class TableLogLocalScan(
    schema: StructType,
    result: Array[org.apache.spark.sql.catalyst.InternalRow],
    desc: String)
  extends LocalScan {
  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = result
  override def readSchema(): StructType = schema
  override def description(): String = desc
}

/** Zero-partition scan in the pruned schema's shape — what total
  * manifest pruning returns: the planner never enumerates (or
  * footer-reads) a single pruned file.
  */
private[sql] final class TableLogEmptyScan(schema: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = Array.empty
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        throw new IllegalStateException("TableLogEmptyScan has no partitions")
    }
  override def description(): String = "TableLogEmptyScan (total manifest prune)"
}

/** Registration + test-visible planning counters. */
object TableLogSql {
  private val planned =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

  private[sql] def recordPlanned(path: String, kept: Int, total: Int): Unit =
    planned.put(path, (kept, total))

  /** (files planned, files in manifest) for the most recent scan
    * build over `path` — pins manifest pruning with counted files
    * instead of wall-clock.
    */
  def lastPlanned(path: String): Option[(Int, Int)] =
    Option(planned.get(path))

  private val aggServed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[sql] def recordAggServed(path: String): Unit = { aggServed.add(path); () }

  /** True iff the most recent scan build over `path` served a
    * complete aggregate from the manifest (cleared on read).
    */
  def tookAggServed(path: String): Boolean = aggServed.remove(path)

  /** Register the catalog under `spark.sql.catalog.<name>`. */
  def register(spark: SparkSession, catalogName: String = "tablelog"): Unit =
    spark.conf.set(s"spark.sql.catalog.$catalogName",
      classOf[TableLogCatalog].getName)

  /** v1 Filter -> Column, for the DELETE path ([[TableLog.deleteWhere]]
    * takes a Column predicate). None on shapes that don't translate —
    * the caller must refuse rather than under-delete.
    */
  private[sql] def filterColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case sources.EqualTo(a, v) if v != null => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) if v != null => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) if v != null => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) if v != null => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) if v != null => Some(col(a) <= lit(v))
      case sources.In(a, vs) if vs.forall(_ != null) =>
        Some(col(a).isInCollection(vs.toSeq))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, p) => Some(col(a).startsWith(p))
      case sources.StringEndsWith(a, p) => Some(col(a).endsWith(p))
      case sources.StringContains(a, p) => Some(col(a).contains(p))
      case sources.And(l, r) =>
        for { cl <- filterColumn(l); cr <- filterColumn(r) } yield cl && cr
      case sources.Or(l, r) =>
        for { cl <- filterColumn(l); cr <- filterColumn(r) } yield cl || cr
      case sources.Not(c) => filterColumn(c).map(!_)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }
}
