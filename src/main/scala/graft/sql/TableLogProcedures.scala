package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableLog

/** Maintenance as SQL — `CALL tablelog.<proc>(...)` (the Spark 4
  * `ProcedureCatalog` surface, Iceberg's procedure shape):
  *
  * {{{
  *   CALL tablelog.optimize('/data/docs', 'doc_id', 64)
  *   CALL tablelog.zorder('/data/docs', 'x,y', 64)
  *   CALL tablelog.compact('/data/docs', 500000)
  *   CALL tablelog.bloom('/data/docs', 'url_hash', 64, 1000000)
  *   CALL tablelog.vacuum('/data/docs', 2)
  *   CALL tablelog.restore('/data/docs', 3)
  *   CALL tablelog.history('/data/docs')
  *   CALL tablelog.tags('/data/docs')
  * }}}
  *
  * Each mutating procedure routes to the corresponding [[TableLog]]
  * operation (committed versions, mutation lock, steal-retry — all
  * unchanged) and returns its result as driver-local rows; `history`
  * and `tags` answer from manifests/checkpoints (zero data IO).
  */
private[sql] object TableLogProcedures {

  private def spark = SparkSession.active

  private def row(vals: Any*): InternalRow =
    new GenericInternalRow(vals.toArray[Any])

  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  /** One procedure: statically-typed parameters, driver-side body,
    * rows back as a LocalScan (no jobs for the result itself).
    */
  private abstract class TlProc(
      override val name: String,
      override val description: String,
      params: Seq[(String, DataType)],
      outSchema: StructType)
    extends UnboundProcedure with BoundProcedure {

    protected def run(a: InternalRow): Seq[InternalRow]

    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, t) => ProcedureParameter.in(n, t).build() }.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      java.util.Collections.singletonList[Scan](
        new TableLogLocalScan(outSchema, run(input).toArray,
          s"TableLogProcedure($name)")).iterator()
  }

  private def str(a: InternalRow, i: Int): String = a.getUTF8String(i).toString
  private def csv(a: InternalRow, i: Int): Seq[String] =
    str(a, i).split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private val versionOut = out("version" -> LongType)

  private val all: Seq[TlProc] = Seq(
    new TlProc("optimize",
      "recluster the table's files range-sorted on a column (OPTIMIZE)",
      Seq("table" -> StringType, "cluster_by" -> StringType,
        "num_files" -> IntegerType), versionOut) {
      override def run(a: InternalRow): Seq[InternalRow] =
        Seq(row(TableLog.optimizeRange(spark, str(a, 0), str(a, 1), a.getInt(2))))
    },
    new TlProc("zorder",
      "recluster on k>=2 numeric columns, Morton-interleaved (OPTIMIZE ZORDER)",
      Seq("table" -> StringType, "cluster_by" -> StringType,
        "num_files" -> IntegerType), versionOut) {
      override def run(a: InternalRow): Seq[InternalRow] =
        Seq(row(TableLog.optimizeZOrder(spark, str(a, 0), csv(a, 1), a.getInt(2))))
    },
    new TlProc("compact",
      "compact the current version's files toward a row target",
      Seq("table" -> StringType, "target_rows" -> LongType), versionOut) {
      override def run(a: InternalRow): Seq[InternalRow] =
        Seq(row(TableLog.compact(spark, str(a, 0), a.getLong(1))))
    },
    new TlProc("bloom",
      "rewrite with parquet-native bloom filters on the given columns",
      Seq("table" -> StringType, "columns" -> StringType,
        "num_files" -> IntegerType, "expected_ndv" -> LongType), versionOut) {
      override def run(a: InternalRow): Seq[InternalRow] =
        Seq(row(TableLog.optimizeBloom(
          spark, str(a, 0), csv(a, 1), a.getInt(2), a.getLong(3))))
    },
    new TlProc("auto_optimize",
      "profile the table and apply the layout advisor's plan",
      Seq("table" -> StringType, "clusterable" -> StringType,
        "num_files" -> IntegerType),
      out("version" -> LongType, "action" -> StringType,
        "columns" -> StringType)) {
      override def run(a: InternalRow): Seq[InternalRow] = {
        val (v, action, cols) = TableLog.autoOptimize(
          spark, str(a, 0), csv(a, 1), a.getInt(2))
        Seq(row(v, UTF8String.fromString(action),
          UTF8String.fromString(cols.mkString(","))))
      }
    },
    new TlProc("restore",
      "re-commit an old version's exact state as the new latest",
      Seq("table" -> StringType, "version" -> LongType), versionOut) {
      override def run(a: InternalRow): Seq[InternalRow] =
        Seq(row(TableLog.restore(spark, str(a, 0), a.getLong(1))))
    },
    new TlProc("vacuum",
      "drop unreferenced files and manifests older than keep_versions",
      Seq("table" -> StringType, "keep_versions" -> IntegerType),
      out("watermark" -> LongType)) {
      override def run(a: InternalRow): Seq[InternalRow] = {
        val path = str(a, 0)
        TableLog.vacuum(spark, path, a.getInt(1))
        Seq(row(TableLog.vacuumWatermark(spark, path)))
      }
    },
    new TlProc("compact_dvs",
      "merge all deletion-vector sidecars into one (zero data-file IO)",
      Seq("table" -> StringType),
      out("version" -> LongType)) {
      override def run(a: InternalRow): Seq[InternalRow] =
        Seq(row(TableLog.compactDvs(spark, str(a, 0))))
    },
    new TlProc("history",
      "(version, n_rows) per readable version — answered from manifests",
      Seq("table" -> StringType),
      out("version" -> LongType, "n_rows" -> LongType)) {
      override def run(a: InternalRow): Seq[InternalRow] =
        TableLog.history(spark, str(a, 0)).collect().toSeq
          .map(r => row(r.getLong(0), r.getLong(1)))
    },
    new TlProc("tags",
      "the tag map — answered from checkpoints + recent manifests",
      Seq("table" -> StringType),
      out("tag" -> StringType, "version" -> LongType)) {
      override def run(a: InternalRow): Seq[InternalRow] =
        TableLog.tags(spark, str(a, 0)).toSeq.sortBy(_._2)
          .map { case (t, v) => row(UTF8String.fromString(t), v) }
    },
    new TlProc("recover_transactions",
      "roll forward pending multi-table transaction intents anchored " +
        "at this table (idempotent)",
      Seq("table" -> StringType),
      out("recovered" -> IntegerType)) {
      override def run(a: InternalRow): Seq[InternalRow] =
        Seq(row(TableLog.recoverTransactions(spark, str(a, 0))))
    })

  private val byName: Map[String, TlProc] = all.map(p => p.name -> p).toMap

  def names: Seq[String] = all.map(_.name)

  def load(name: String): UnboundProcedure =
    byName.getOrElse(name.toLowerCase(java.util.Locale.ROOT),
      throw new UnsupportedOperationException(
        s"TableLogCatalog: unknown procedure '$name' " +
          s"(available: ${names.mkString(", ")})"))
}
