package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical storage layout for shuffle-free / scan-pruned reads — the
  * layout moves that matter most at 100 TB:
  *
  *  - **Bucketed tables** ([[writeBucketed]]): both sides of a
  *    recurring equi-join written with the same bucket count on the
  *    join key make the join a zero-exchange sort-merge — the shuffle
  *    is paid ONCE at write time and amortized over every subsequent
  *    join/aggregation on that key (the classic warehouse fact/dim
  *    layout). `StorageLayoutSpec` plan-asserts the absence of
  *    `ShuffleExchange` on the joined read.
  *  - **Partitioned directories** ([[writePartitioned]]): low-
  *    cardinality filter columns as directory partitions turn
  *    predicate pushdown into file pruning — a `lang = 'en'` read
  *    touches 1/k of the files before a single row is decoded.
  *    `StorageLayoutSpec` asserts the pushed `PartitionFilters`.
  *  - **Range clustering** ([[writeRangeClustered]]): high-cardinality
  *    filter columns can't be directory partitions; range-partitioned
  *    + sorted files give each file a tight min/max for the column,
  *    so the pushed predicate skips whole row groups (the parquet
  *    footer-stats path). `StorageLayoutSpec` pins the skip
  *    differentially via the executed scan's row metric.
  *  - **Z-order clustering** ([[writeZOrdered]]): interleaving the
  *    bits of two equi-depth bucket ranks yields a single cluster key
  *    whose file ranges are tight in BOTH dimensions — predicates on
  *    either column skip row groups, where range clustering serves
  *    only its one column (the Delta/Iceberg OPTIMIZE ZORDER move).
  *  - **Small-file compaction** ([[compactSmallFiles]]): streaming /
  *    incremental ingest accretes thousands of tiny files whose
  *    per-file open cost dominates scans; compaction coalesces them
  *    to a target row count WITHOUT a shuffle and swaps the directory
  *    ledger-first (tmp + verify, then swap via a `.old` hop, never a
  *    delete-before-replace window).
  *
  * Spark-only mechanics worth noting: bucket metadata lives in the
  * session catalog, so bucketed data round-trips through
  * `saveAsTable`/`spark.table` (plain `parquet(path)` reads lose the
  * bucket spec); table names are caller-scoped and re-written with
  * overwrite semantics so repeated runs in one JVM are idempotent.
  */
object StorageLayout {

  /** Write `df` as a bucketed+sorted external parquet table (replacing
    * any previous incarnation) and return the re-read frame, which
    * carries the bucket spec for downstream join planning.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      numBuckets: Int,
      bucketCol: String): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
    spark.table(tableName)
  }

  /** Equi-join of two identically-bucketed tables on their bucket
    * key, pinned to sort-merge (a broadcast would also be
    * exchange-free but hides the layout win this operator exists
    * for). With equal bucket counts on both sides the planned join
    * has NO ShuffleExchange on either input.
    */
  def colocatedJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.hint("merge").join(right, key)

  /** Write `df` partitioned by a low-cardinality column; reads
    * through [[readPartitioned]] prune directories on that column.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write `df` range-partitioned + sorted on `col` across `numFiles`
    * files: each file carries a tight, near-disjoint [min,max] for
    * the column, so a later pushed range predicate skips whole row
    * groups. `numFiles` is user-specified partitioning — AQE never
    * coalesces it.
    */
  def writeRangeClustered(
      df: DataFrame, path: String, colName: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(colName))
      .sortWithinPartitions(colName)
      .write.mode("overwrite").parquet(path)

  /** Morton/Z value of k bucket ranks in [0, 2^bits): bit i of
    * dimension d lands at position i·k + d. Pure codegen'd shift/mask
    * algebra; k·bits must fit a Long.
    */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val k = dims.size
    require(k >= 2, "zValueN: need at least two dimensions")
    require(k * bits <= 62, s"zValueN: $k dims x $bits bits overflow a Long")
    (for { i <- 0 until bits; (c, d) <- dims.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + d))
      .reduce(_ bitwiseOR _)
  }

  /** Two-dimensional [[zValueN]] (bit i of `a` at 2i, of `b` at
    * 2i+1).
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    zValueN(Seq(a, b), bits)

  /** Write `df` clustered on the Z-order curve over two NUMERIC
    * columns: each column is rank-bucketed into 2^bits equi-depth
    * buckets (cut points from one bounded `approxQuantile` pass —
    * 2^bits-1 doubles on the driver, never data rows), the bucket
    * ranks bit-interleaved into a Morton value, and the frame
    * range-partitioned + sorted on it. Files end up tight in BOTH
    * dimensions, so pushed predicates on either column skip row
    * groups. Equi-depth (not min/max-linear) bucketing keeps the
    * curve balanced under skewed value distributions.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      numFiles: Int,
      bits: Int = 8): Unit =
    writeZOrderedN(df, path, Seq(colA, colB), numFiles, bits)

  /** [[writeZOrdered]] over k ≥ 2 numeric columns: one cluster key
    * serving band predicates on ANY of them. Skip selectivity per
    * dimension degrades as k grows (each dimension owns 1/k of the
    * key's bits) — 2–4 dims is the useful range, same as
    * Delta/Iceberg practice.
    */
  def writeZOrderedN(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      numFiles: Int,
      bits: Int = 8): Unit = {
    require(bits >= 1 && bits <= 20, s"writeZOrderedN: bits=$bits out of range")
    val zv = zValueN(cols.map(c => equiDepthBucket(df, c, bits)), bits)
    df.withColumn("_sl_z", zv)
      .repartitionByRange(numFiles, col("_sl_z"))
      .sortWithinPartitions("_sl_z")
      .drop("_sl_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Equi-depth bucket rank in [0, 2^bits) for a numeric column:
    * count of quantile cut points <= the value, via a literal-array
    * higher-order filter (codegen'd; the array is 2^bits-1 doubles).
    */
  private[operators] def equiDepthBucket(df: DataFrame, colName: String, bits: Int): Column = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val cuts = df.stat.approxQuantile(colName, probs, 0.001)
    val cutsLit = typedLit(cuts.toSeq)
    size(filter(cutsLit, c => c <= col(colName).cast("double"))).cast("long")
  }

  /** Compaction report: parquet data files and rows before/after. */
  final case class CompactReport(
      filesBefore: Long, filesAfter: Long, rows: Long)

  /** Coalesce the parquet directory at `path` down to
    * ceil(rows / targetRowsPerFile) files WITHOUT a shuffle
    * (`coalesce` merges partitions narrowly — at 100 TB the rewrite
    * is IO-bound, never exchange-bound), then swap directories
    * ledger-first: write to `<path>.compact.tmp`, VERIFY the tmp row
    * count equals the source, hop the old directory to `<path>.old`,
    * rename tmp into place, drop the hop. Crash safety: nothing is
    * deleted before its replacement is verified, so a crash mid-swap
    * leaves either the original or the verified compacted directory
    * (plus debris directories a re-run clears) — but between the two
    * renames the table path briefly does not exist, so a CONCURRENT
    * reader in that window fails; single-accessor during maintenance
    * is the contract ([[TableLog.compact]] is the
    * concurrent-reader-safe versioned twin).
    */
  /** Layout advisor — turns a [[TableProfile.profile]] report into
    * clustering recommendations, closing the loop between the stats
    * pass and the physical-design writers above. Deterministic
    * integer/string rules (oracle-replayable):
    *
    *  - `partition`: 1 < n_distinct ≤ maxPartitions and zero nulls —
    *    a directory per value stays cheap and prunes files outright
    *    ([[writePartitioned]]);
    *  - `range_cluster`: the highest-cardinality remaining column —
    *    the best row-group-skip payoff per sort
    *    ([[writeRangeClustered]]);
    *  - `zorder_with`: the runner-up — pair it with the first via
    *    [[writeZOrdered]] when the workload filters both;
    *  - `none`: everything else.
    *
    * Cluster roles are only assigned among `clusterable` columns (the
    * caller declares which columns order meaningfully — the profile
    * renders min/max as strings, so it cannot tell a sortable numeric
    * from a long text payload). Ranking ties break by column name.
    * The advisor sees only the #columns-row profile frame; at 100 TB
    * the expensive part is the profile (one pass), not this.
    */
  def adviseLayout(
      profile: DataFrame, clusterable: Seq[String],
      maxPartitions: Long = 20L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(clusterable.nonEmpty, "adviseLayout: declare clusterable columns")
    val isPart = col("n_distinct") > 1L &&
      col("n_distinct") <= maxPartitions && col("n_null") === 0L
    val isClu = !isPart && col("col_name").isin(clusterable: _*)
    val w = Window.partitionBy(col("_sl_grp"))
      .orderBy(col("n_distinct").desc, col("col_name"))
    profile
      .withColumn("_sl_part", isPart)
      .withColumn("_sl_grp",
        when(isPart, lit("p")).when(isClu, lit("c")).otherwise(lit("n")))
      .withColumn("_sl_rank", row_number().over(w))
      .withColumn("role",
        when(col("_sl_part"), lit("partition"))
          .when(col("_sl_grp") === "c" && col("_sl_rank") === 1,
            lit("range_cluster"))
          .when(col("_sl_grp") === "c" && col("_sl_rank") === 2,
            lit("zorder_with"))
          .otherwise(lit("none")))
      .select(col("col_name"), col("n_distinct"), col("n_null"), col("role"))
  }

  /** Delete report: parquet data files in the table, how many
    * contained matches (and were rewritten), rows before, rows
    * deleted.
    */
  final case class DeleteReport(
      filesTotal: Long, filesRewritten: Long,
      rowsBefore: Long, rowsDeleted: Long)

  /** Delete-where table maintenance (GDPR erasure, TTL retention):
    * rewrite the directory at `path` without the rows matching
    * `predicate`, with rewrite IO proportional to the files that
    * actually CONTAIN a match — one bounded job groups matches by
    * `_metadata.file_path` (#files rows, never data rows), matched
    * files are re-read and filtered, untouched files are hard-linked
    * (copy fallback) into the new directory unread. Swap is the
    * [[compactSmallFiles]] ledger-first discipline: build tmp, verify
    * the row accounting, hop the old directory aside, move tmp into
    * place. Crash safety: at every point either the original or the
    * verified output is recoverable (nothing is deleted before its
    * replacement is verified) — but between the two renames the table
    * path briefly does not exist, so a CONCURRENT reader in that
    * window fails; single-accessor during maintenance is the
    * contract (the versioned [[TableLog.deleteWhere]] is the
    * concurrent-reader-safe twin). A predicate matching nothing is a
    * metadata-only no-op.
    *
    * At 100 TB this is the Delta/Iceberg DELETE shape minus the
    * manifest: clustering the table on the delete key first
    * ([[writeRangeClustered]]) is what keeps the touched-file set —
    * and therefore the rewrite — small.
    */
  def deleteWhere(
      spark: SparkSession, path: String, predicate: Column): DeleteReport = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val dataFiles = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq
    val df = spark.read.parquet(path)
    val rowsBefore = df.count()
    // one bounded job: matched rows per containing file (#files rows)
    val perFile = df.where(predicate)
      .groupBy(col("_metadata.file_path").as("_sl_f"))
      .agg(count(lit(1)).as("_sl_n")).collect()
    val rowsDeleted = perFile.map(_.getLong(1)).sum
    if (perFile.isEmpty)
      return DeleteReport(dataFiles.size.toLong, 0L, rowsBefore, 0L)
    // a predicate matching EVERYTHING is almost always a bug, and an
    // all-rows-deleted parquet directory would not read back (no part
    // file carries the schema) — refuse, like the k-anonymity
    // safe-by-default rule
    require(rowsDeleted < rowsBefore,
      s"deleteWhere: predicate matches all $rowsBefore rows — refusing; " +
        "drop the directory instead")
    // compare by basename: _metadata.file_path and listStatus render
    // the same file with different URI schemes
    val touchedNames = perFile
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    val (touched, untouched) =
      dataFiles.partition(f => touchedNames.contains(f.getName))
    val tmp = new org.apache.hadoop.fs.Path(path + ".delete.tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(tmp, true); fs.delete(old, true)
    // survivors = NOT(matched): rows where the predicate evaluates to
    // NULL (nullable delete column) did NOT match and must be KEPT —
    // a bare !predicate is NULL for them too and the filter would drop
    // them silently. coalesce(pred, false) makes NULL an explicit
    // keep, and the tmpRows accounting below then passes instead of
    // aborting the swap whenever a touched file has NULL-predicate rows.
    spark.read.parquet(touched.map(_.toString): _*)
      .where(!coalesce(predicate, lit(false)))
      .write.mode("overwrite").parquet(tmp.toString)
    untouched.foreach { f =>
      val dst = new org.apache.hadoop.fs.Path(tmp, f.getName)
      val srcFile = java.nio.file.Paths.get(f.toUri.getPath)
      val dstFile = java.nio.file.Paths.get(dst.toUri.getPath)
      try java.nio.file.Files.createLink(dstFile, srcFile)
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        org.apache.hadoop.fs.FileUtil.copy(fs, f, fs, dst, false, hconf)
      }
    }
    val tmpRows = spark.read.parquet(tmp.toString).count()
    require(tmpRows == rowsBefore - rowsDeleted,
      s"deleteWhere: tmp has $tmpRows rows, want ${rowsBefore - rowsDeleted} — aborting swap")
    require(fs.rename(p, old), s"deleteWhere: could not hop $path aside")
    require(fs.rename(tmp, p), s"deleteWhere: could not move tmp into $path")
    fs.delete(old, true)
    DeleteReport(dataFiles.size.toLong, touched.size.toLong, rowsBefore, rowsDeleted)
  }

  def compactSmallFiles(
      spark: SparkSession, path: String, targetRowsPerFile: Long): CompactReport = {
    require(targetRowsPerFile > 0, "compactSmallFiles: target must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    def dataFiles(dir: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(dir).count(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet")).toLong
    val before = dataFiles(p)
    val rows = spark.read.parquet(path).count()
    val k = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact.tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(tmp, true); fs.delete(old, true)
    val src = spark.read.parquet(path)
    // coalesce (narrow) when the reader's merged splits are finer than
    // the target — the 100 TB path; if the reader already merged the
    // tiny files COARSER than the target (small total data), coalesce
    // cannot widen, so fall back to an even round-robin repartition
    val compacted =
      if (src.rdd.getNumPartitions >= k) src.coalesce(k) else src.repartition(k)
    compacted.write.mode("overwrite").parquet(tmp.toString)
    val tmpRows = spark.read.parquet(tmp.toString).count()
    require(tmpRows == rows,
      s"compactSmallFiles: tmp has $tmpRows rows, source has $rows — aborting swap")
    require(fs.rename(p, old), s"compactSmallFiles: could not hop $path aside")
    require(fs.rename(tmp, p), s"compactSmallFiles: could not move tmp into $path")
    fs.delete(old, true)
    CompactReport(before, dataFiles(p), rows)
  }
}
