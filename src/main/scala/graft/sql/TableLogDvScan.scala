package graft.sql

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BoundReference, Expression, UnsafeProjection}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.operators.TableLog

/** DELETION-VECTOR compensation inside the DSv2 scan itself — the
  * correctness floor for SQL reads of a DV-carrying table.
  *
  * The round-15 design compensated ONLY via an optimizer rewrite
  * ([[TableLogDvReadRewrite]]) whose soundness depended on recognizing
  * "write target" relations by plan shape; one wrong pattern (a
  * blanket Command-direct-child exemption) silently resurrected
  * deleted rows in `CREATE TABLE ... AS SELECT *`, bare
  * `INSERT INTO ... SELECT *`, and `df.write`. This scan removes the
  * structural dependency: dead positions are filtered INSIDE the
  * batch readers, so no plan shape above the relation — commands,
  * subqueries, V1-fallback re-plans, or a session missing the graft
  * extensions entirely — can skip compensation. The rewrite rule
  * remains as the PERF path (a distributed anti-join that also
  * restores columnar reads); when it fires the relation is replaced
  * and this scan is never built.
  *
  * Mechanics: files WITHOUT vectors scan exactly as before; files
  * WITH vectors scan with parquet's reserved row-index column
  * ([[ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME]]) appended —
  * both the vectorized and parquet-mr readers fill it with the row's
  * FILE-ABSOLUTE index (correct under row-group pruning and pushed
  * filters: it is generated from block-metadata start offsets, not by
  * counting returned rows). Each DV'd file plans as its OWN input
  * partition (splits of one file may share a partition; two files
  * never do), so the reader knows exactly which dead set applies; it
  * loads its file's positions from the sidecar dirs EXECUTOR-SIDE
  * (never a driver collect — scales to arbitrarily large vectors),
  * binary-searches each row's index, and projects the temp column
  * away. At 100 TB the cost model is: per DV'd-file task, one scan of
  * that file's sidecar dirs (shared dirs are re-read by the files of
  * one delete commit — `compactDvs`/OPTIMIZE bound the stack); clean
  * files pay only the loss of columnar OUTPUT on mixed scans (Spark
  * refuses mixed row/columnar partitions), while parquet DECODE stays
  * vectorized inside the row-returning readers.
  */
private[sql] object TableLogDvScan {

  /** Parquet's reserved temp column name — the readers fill it with
    * the file-absolute row index when it appears in the read schema.
    */
  val RowIndexCol: String = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** A file's data/-relative name from its absolute path — the scan's
    * JVM twin of the `substring_index(file_path, "/data/", -1)` the
    * sidecar writer used (sound: hive components escape slashes, so
    * "/data/" cannot occur inside the relative part).
    */
  def relName(abs: String): String = {
    val i = abs.lastIndexOf("/data/")
    require(i >= 0, s"TableLogDvScan: $abs is not under a data/ dir")
    abs.substring(i + "/data/".length)
  }

  /** One equality-delete sidecar as the executor sees it: the
    * ABSOLUTE dir of key tuples plus each key column's name and
    * (serializable) Spark type — enough to load the key set and
    * extract comparable tuples from data rows without a
    * SparkSession.
    */
  final case class EqSpec(
      dir: String,
      keys: Seq[(String, org.apache.spark.sql.types.DataType)])

  /** Build the compensated scan over `kept` (⊇ `dvKept` ∪ `eqKept`,
    * the files carrying live deletion vectors / applicable equality
    * deletes). All sub-scans share the pushed filters and pruned
    * columns, so pushdown semantics match the plain path; equality
    * key columns missing from the pruned schema are FORCED into the
    * special scan's read schema (the reader needs them to evaluate
    * key membership) and projected away before rows leave.
    */
  def build(
      spark: SparkSession, path: String, snap: TableLog.Snapshot,
      kept: Seq[String], dvKept: Seq[String], eqKept: Seq[String],
      required: Option[StructType],
      catalystFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Scan = {
    val specialFiles = (dvKept ++ eqKept).distinct
    val specialSet = specialFiles.toSet
    val clean = kept.filterNot(specialSet)
    val cleanScan =
      if (clean.isEmpty) None
      else Some(TableLogParquet.build(spark, path, snap, clean, required,
        catalystFilters))
    val eqKeyCols: Seq[String] =
      eqKept.flatMap(n => snap.eqFor(n).flatMap(_.keyCols)).distinct
    val requiredPlus: Option[StructType] = required.map { r =>
      val missing = eqKeyCols.filterNot(r.fieldNames.contains)
      if (missing.isEmpty) r
      else StructType(r.fields ++ missing.map(c =>
        snap.schema.fields.find(_.name == c).get))
    }
    val dvScan = TableLogParquet.build(spark, path, snap, specialFiles,
      requiredPlus, catalystFilters, rowIndex = true)
    val dvRowSchema = dvScan.readSchema()
    val keepNames: String => Boolean = required match {
      case Some(r) => val s = r.fieldNames.toSet; n => s.contains(n)
      case None => _ != RowIndexCol
    }
    val output = StructType(dvRowSchema.fields.filter(f =>
      f.name != RowIndexCol && keepNames(f.name)))
    val dirsByRel: Map[String, Seq[String]] =
      specialFiles.map(n => n -> snap.dvs.getOrElse(n, Nil)
        .map(d => TableLog.dvPath(path, d))).toMap
    val eqByRel: Map[String, Seq[EqSpec]] =
      specialFiles.map(n => n -> snap.eqFor(n).map(e =>
        EqSpec(TableLog.eqPath(path, e.dir),
          e.keyCols.map(c => c ->
            snap.schema.fields.find(_.name == c).get.dataType)))).toMap
    new TableLogDvCompensatedScan(cleanScan, dvScan, output, dvRowSchema,
      dirsByRel, eqByRel,
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
  }

  /** One clean-file partition, passed through to the inner factory. */
  final case class CleanPartition(inner: InputPartition)
    extends InputPartition {
    override def preferredLocations(): Array[String] =
      inner.preferredLocations()
  }

  /** One compensated-file partition: exactly one file's split(s), its
    * relative name, the ABSOLUTE deletion-vector sidecar dirs, and
    * the equality-delete specs that apply to it.
    */
  final case class DvPartition(
      inner: FilePartition, rel: String, dvDirs: Seq[String],
      eqSpecs: Seq[EqSpec])
    extends InputPartition {
    override def preferredLocations(): Array[String] =
      inner.preferredLocations()
  }

  /** The key tuples of one equality-delete sidecar, loaded with the
    * bare parquet-hadoop reader (executors have no SparkSession) and
    * normalized to Long (integral) / String — the same normalization
    * [[rowKey]] applies to data rows, so set membership is exact.
    */
  def loadKeySet(
      conf: Configuration, spec: EqSpec): java.util.HashSet[List[Any]] = {
    val set = new java.util.HashSet[List[Any]]()
    val dp = new Path(spec.dir)
    val fsys = dp.getFileSystem(conf)
    fsys.listStatus(dp).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
        val rdr = ParquetReader.builder(new GroupReadSupport(), st.getPath)
          .withConf(conf).build()
        try {
          var g = rdr.read()
          while (g != null) {
            val tuple = spec.keys.map { case (name, dt) =>
              dt match {
                case org.apache.spark.sql.types.LongType =>
                  g.getLong(name, 0): Any
                case org.apache.spark.sql.types.StringType =>
                  g.getString(name, 0): Any
                case _ => g.getInteger(name, 0).toLong: Any
              }
            }.toList
            set.add(tuple)
            g = rdr.read()
          }
        } finally rdr.close()
      }
    }
    set
  }

  /** The dead positions of file `rel`: scan every sidecar dir with
    * the bare parquet-hadoop reader (executors have no SparkSession),
    * keep `pos` where `file == rel`, sorted for binary search. Shared
    * dirs carry other files' positions too — filtered here, exactly
    * like the anti-join path's key match.
    */
  def loadDeadPositions(
      conf: Configuration, dirs: Seq[String], rel: String): Array[Long] = {
    val buf = ArrayBuffer.empty[Long]
    dirs.foreach { d =>
      val dp = new Path(d)
      val fsys = dp.getFileSystem(conf)
      fsys.listStatus(dp).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
          val rdr = ParquetReader.builder(new GroupReadSupport(), st.getPath)
            .withConf(conf).build()
          try {
            var g = rdr.read()
            while (g != null) {
              if (g.getFieldRepetitionCount("file") > 0 &&
                g.getString("file", 0) == rel &&
                g.getFieldRepetitionCount("pos") > 0)
                buf += g.getLong("pos", 0)
              g = rdr.read()
            }
          } finally rdr.close()
        }
      }
    }
    val a = buf.toArray
    java.util.Arrays.sort(a)
    a
  }
}

/** The Scan handed to [[TableLogScan]] when live vectors survive the
  * manifest cut: clean files delegate untouched, DV'd files filter
  * dead positions in their readers. Reports the un-extended schema —
  * everything above sees exactly the plain scan's shape.
  */
private[sql] final class TableLogDvCompensatedScan(
    cleanScan: Option[Scan], dvScan: Scan, output: StructType,
    dvRowSchema: StructType, dirsByRel: Map[String, Seq[String]],
    eqByRel: Map[String, Seq[TableLogDvScan.EqSpec]],
    hconf: SerializableConfiguration)
  extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = output

  override def description(): String =
    s"TableLogDvScan(compensatedFiles=${dirsByRel.size}, " +
      s"eqFiles=${eqByRel.count(_._2.nonEmpty)}, " +
      s"cleanScan=${cleanScan.isDefined})"

  /** Physical-size statistics still add up (join planning sees the
    * real bytes); row counts stay unknown — manifest counts describe
    * PHYSICAL rows, some of which are dead.
    */
  override def estimateStatistics(): Statistics = {
    def sizeOf(s: Scan): java.util.OptionalLong = s match {
      case r: SupportsReportStatistics => r.estimateStatistics().sizeInBytes()
      case _ => java.util.OptionalLong.empty()
    }
    val sizes = (cleanScan.toSeq :+ dvScan).map(sizeOf)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (sizes.forall(_.isPresent))
          java.util.OptionalLong.of(sizes.map(_.getAsLong).sum)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = new Batch {
    private val cleanBatch = cleanScan.map(_.toBatch)
    private val dvBatch = dvScan.toBatch

    override def planInputPartitions(): Array[InputPartition] = {
      val cleanParts: Array[InputPartition] =
        cleanBatch.map(_.planInputPartitions()).getOrElse(Array.empty)
          .map(p => TableLogDvScan.CleanPartition(p): InputPartition)
      // one partition per PartitionedFile: the reader must know
      // EXACTLY which file (hence which dead set) its rows come from
      val dvParts: Array[InputPartition] =
        dvBatch.planInputPartitions().iterator.flatMap {
          case fp: FilePartition => fp.files
          case other => throw new IllegalStateException(
            s"TableLogDvScan: unexpected non-file partition $other")
        }.zipWithIndex.map { case (pf, i) =>
          val rel = TableLogDvScan.relName(pf.filePath.toPath.toString)
          TableLogDvScan.DvPartition(FilePartition(i, Array(pf)), rel,
            dirsByRel.getOrElse(rel, Nil),
            eqByRel.getOrElse(rel, Nil)): InputPartition
        }.toArray
      cleanParts ++ dvParts
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new TableLogDvReaderFactory(cleanBatch.map(_.createReaderFactory()),
        dvBatch.createReaderFactory(), output, dvRowSchema, hconf)
  }
}

/** Row-based readers throughout: Spark refuses MIXED row/columnar
  * partitions in one scan, and the DV readers must see individual
  * rows to filter positions — parquet DECODE inside the delegated
  * readers stays vectorized regardless.
  */
private[sql] final class TableLogDvReaderFactory(
    cleanF: Option[PartitionReaderFactory], dvF: PartitionReaderFactory,
    output: StructType, dvRowSchema: StructType,
    hconf: SerializableConfiguration)
  extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case TableLogDvScan.CleanPartition(inner) => cleanF.get.createReader(inner)
      case TableLogDvScan.DvPartition(inner, rel, dirs, eqSpecs) =>
        val base = dvF.createReader(inner)
        val dead =
          if (dirs.isEmpty) Array.emptyLongArray
          else TableLogDvScan.loadDeadPositions(hconf.value, dirs, rel)
        val idx = dvRowSchema.fieldIndex(TableLogDvScan.RowIndexCol)
        // equality-delete key sets + per-key (row index, type)
        // extractors, loaded once per partition executor-side
        val eqSets = eqSpecs.map { spec =>
          (TableLogDvScan.loadKeySet(hconf.value, spec),
            spec.keys.map { case (n, dt) =>
              (dvRowSchema.fieldIndex(n), dt)
            })
        }
        def eqAlive(r: InternalRow): Boolean = eqSets.forall {
          case (set, extract) =>
            var nullKey = false
            val tuple = extract.map { case (i, dt) =>
              if (r.isNullAt(i)) { nullKey = true; null }
              else dt match {
                case org.apache.spark.sql.types.LongType => r.getLong(i): Any
                case org.apache.spark.sql.types.StringType =>
                  r.getUTF8String(i).toString: Any
                case org.apache.spark.sql.types.IntegerType =>
                  r.getInt(i).toLong: Any
                case org.apache.spark.sql.types.ShortType =>
                  r.getShort(i).toLong: Any
                case _ => r.getByte(i).toLong: Any
              }
            }.toList
            // NULL keys never match (delete keys are non-null)
            nullKey || !set.contains(tuple)
        }
        val proj = UnsafeProjection.create(
          output.fields.map(f => BoundReference(
            dvRowSchema.fieldIndex(f.name), f.dataType,
            nullable = true): Expression).toIndexedSeq)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            while (base.next()) {
              val r = base.get()
              if ((dead.length == 0 ||
                java.util.Arrays.binarySearch(dead, r.getLong(idx)) < 0) &&
                (eqSets.isEmpty || eqAlive(r))) {
                current = proj(r)
                return true
              }
            }
            false
          }
          override def get(): InternalRow = current
          override def close(): Unit = base.close()
        }
      case other => throw new IllegalStateException(
        s"TableLogDvScan: unexpected partition $other")
    }
}
