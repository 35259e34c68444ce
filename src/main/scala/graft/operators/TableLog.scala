package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned table layer — the manifest/snapshot log that unifies the
  * [[StorageLayout]] maintenance moves (append, compact, delete) into
  * ATOMIC table versions with time travel, the Delta/Iceberg log
  * shape reduced to its load-bearing core:
  *
  *  - data files are immutable and live flat under `<path>/data/`;
  *  - version N is a manifest `<path>/_log/vNNNNNNN.json` listing the
  *    file names that make up the table at N;
  *  - every commit writes its NEW data files first, then publishes
  *    the manifest via a write-to-tmp + rename (the ledger-first
  *    rule): a crash mid-commit leaves orphan data files and NO
  *    manifest, so readers never see a partial version and a re-run
  *    simply re-commits;
  *  - old versions stay readable (time travel) until [[vacuum]]
  *    drops files no retained manifest references.
  *
  * Contrast with the directory-swap maintenance ops
  * ([[StorageLayout.compactSmallFiles]]/[[StorageLayout.deleteWhere]]):
  * those mutate a plain parquet directory in place (no history, works
  * on any existing data); this layer buys atomic multi-reader
  * versioning and time travel for the price of owning the directory
  * layout. Single-writer by contract (no optimistic-concurrency CAS —
  * object-store conditional-put is deployment-specific; the rename
  * publish point is where it would slot in).
  *
  * 100 TB shape: manifests carry file NAMES (bytes proportional to
  * file count, never data); reads hand Spark the exact file list, so
  * scan planning never lists the directory; compact/delete rewrite
  * IO is bounded exactly as in the directory-swap twins (delete's
  * touched-file discovery is the same bounded `_metadata.file_path`
  * job).
  */
object TableLog {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logDir(path: String) = new Path(s"$path/_log")
  private def dataDir(path: String) = new Path(s"$path/data")
  private def manifestPath(path: String, v: Long) =
    new Path(logDir(path), f"v$v%07d.json")

  /** Committed versions, ascending; empty if no table exists. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    if (!f.exists(logDir(path))) Nil
    else f.listStatus(logDir(path)).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }.sorted
  }

  def latestVersion(spark: SparkSession, path: String): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"TableLog: no committed version at $path")
    vs.last
  }

  private def manifestBody(spark: SparkSession, path: String, v: Long): String = {
    val f = fs(spark, path)
    val mp = manifestPath(path, v)
    require(f.exists(mp), s"TableLog: version $v not committed at $path")
    val in = f.open(mp)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def filesField(body: String): String = {
    val t = body.trim
    if (t.startsWith("{")) {
      val i = t.indexOf('['); val j = t.lastIndexOf(']')
      t.substring(i, j + 1)
    } else t
  }

  private def readManifest(spark: SparkSession, path: String, v: Long): Seq[String] = {
    // either a bare JSON string array or {"tag":"...","files":[...]}
    filesField(manifestBody(spark, path, v))
      .stripPrefix("[").stripSuffix("]").split(",")
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
  }

  /** Idempotency tags of all committed versions (see [[appendBatch]]). */
  def tags(spark: SparkSession, path: String): Map[String, Long] =
    versions(spark, path).flatMap { v =>
      val t = manifestBody(spark, path, v).trim
      if (!t.startsWith("{")) None
      else {
        val m = "\"tag\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(t)
        m.map(_.group(1) -> v)
      }
    }.toMap

  /** Publish `files` as version `v`: tmp write, fsync-close, rename.
    * The rename is the commit point; an optional idempotency `tag`
    * rides INSIDE the manifest, so tag and version become visible
    * atomically.
    */
  private def commit(
      spark: SparkSession, path: String, v: Long, files: Seq[String],
      tag: Option[String] = None): Long = {
    require(files.nonEmpty, "TableLog: refusing to commit an empty file list " +
      "(an all-rows delete; drop the table instead)")
    // no quotes (JSON embedding) and no brackets: filesField parses
    // the manifest by slicing from the first '[' to the last ']', so
    // a bracketed tag would corrupt file-list parsing for every later
    // readManifest/read/vacuum of the version
    require(tag.forall(t => !t.exists(c => c == '"' || c == '[' || c == ']')),
      "TableLog: tag must not contain quotes or square brackets")
    val f = fs(spark, path)
    f.mkdirs(logDir(path))
    val tmp = new Path(logDir(path), f"_tmp_v$v%07d.json")
    val out = f.create(tmp, true)
    val arr = files.sorted.map(n => "\"" + n + "\"").mkString("[", ",", "]")
    val body = tag match {
      case Some(t) => s"""{"tag":"$t","files":$arr}"""
      case None => arr
    }
    out.write(body.getBytes("UTF-8"))
    out.close()
    require(f.rename(tmp, manifestPath(path, v)),
      s"TableLog: commit rename failed for v$v (concurrent writer?)")
    v
  }

  /** Write `df`'s rows as new immutable data files under the table's
    * data dir and return their file names. Files are staged through a
    * scratch dir and renamed in (same volume), so a crash leaves
    * orphans in scratch, never half-visible names in data/.
    */
  private def writeDataFiles(spark: SparkSession, path: String, df: DataFrame): Seq[String] = {
    val f = fs(spark, path)
    val scratch = new Path(s"$path/_scratch_${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(scratch.toString)
    f.mkdirs(dataDir(path))
    val names = f.listStatus(scratch).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val n = s.getPath.getName
        require(f.rename(s.getPath, new Path(dataDir(path), n)),
          s"TableLog: could not stage data file $n")
        n
      }
    f.delete(scratch, true)
    names
  }

  /** Create the table (version 1). Fails if a log already exists. */
  def create(spark: SparkSession, path: String, df: DataFrame): Long = {
    require(versions(spark, path).isEmpty,
      s"TableLog: table already exists at $path")
    commit(spark, path, 1L, writeDataFiles(spark, path, df))
  }

  /** Append rows as a new version (old files + new files). */
  def append(spark: SparkSession, path: String, df: DataFrame): Long = {
    val v = latestVersion(spark, path)
    val cur = readManifest(spark, path, v)
    commit(spark, path, v + 1, cur ++ writeDataFiles(spark, path, df))
  }

  /** Read the table at `version` (default: latest). Hands Spark the
    * manifest's exact file list — no directory listing, orphans and
    * other versions' files invisible.
    */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, path))
    val files = readManifest(spark, path, v)
      .map(n => new Path(dataDir(path), n).toString)
    spark.read.parquet(files: _*)
  }

  /** Compact the current version's files toward a row target as a new
    * version. Old files stay (time travel) until [[vacuum]].
    */
  def compact(spark: SparkSession, path: String, targetRowsPerFile: Long): Long = {
    require(targetRowsPerFile > 0, "TableLog.compact: target must be positive")
    val v = latestVersion(spark, path)
    val cur = read(spark, path, Some(v))
    val rows = cur.count()
    val k = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val src = read(spark, path, Some(v))
    val compacted = if (src.rdd.getNumPartitions >= k) src.coalesce(k)
      else src.repartition(k)
    commit(spark, path, v + 1, writeDataFiles(spark, path, compacted))
  }

  /** Delete matching rows as a new version: untouched files carry
    * over BY NAME (zero IO — the manifest layer's advantage over the
    * directory-swap [[StorageLayout.deleteWhere]], which must link or
    * copy them), touched files are rewritten without their matches.
    */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Long = {
    val v = latestVersion(spark, path)
    val cur = readManifest(spark, path, v)
    val df = read(spark, path, Some(v))
    val perFile = df.where(predicate)
      .groupBy(col("_metadata.file_path").as("_tl_f"))
      .agg(count(lit(1)).as("_tl_n")).collect()
    val touchedNames =
      perFile.map(r => new Path(r.getString(0)).getName).toSet
    if (touchedNames.isEmpty) return commit(spark, path, v + 1, cur)
    val rowsDeleted = perFile.map(_.getLong(1)).sum
    val (touched, untouched) = cur.partition(touchedNames.contains)
    val touchedPaths = touched.map(n => new Path(dataDir(path), n).toString)
    val touchedDf = spark.read.parquet(touchedPaths: _*)
    val touchedRows = touchedDf.count()
    // survivors = NOT(matched): NULL-predicate rows did not match and
    // must be kept — bare !predicate is NULL for them and would drop
    // them silently (the StorageLayout.deleteWhere discipline)
    val survivors = touchedDf.where(!coalesce(predicate, lit(false)))
    val newFiles =
      if (survivors.isEmpty) Nil else writeDataFiles(spark, path, survivors)
    // row accounting BEFORE the commit rename: a survivor filter that
    // dropped more than the matched rows (e.g. a non-deterministic
    // predicate) aborts here, leaving only orphan data files for
    // vacuum — never a committed wrong version
    val survivorRows =
      if (newFiles.isEmpty) 0L
      else spark.read.parquet(
        newFiles.map(n => new Path(dataDir(path), n).toString): _*).count()
    require(survivorRows == touchedRows - rowsDeleted,
      s"TableLog.deleteWhere: survivors have $survivorRows rows, want " +
        s"${touchedRows - rowsDeleted} — aborting commit (orphans go to vacuum)")
    commit(spark, path, v + 1, untouched ++ newFiles)
  }

  /** Tagged idempotent append — the exactly-once unit for streaming
    * sinks: if a committed version already carries `tag`, return it
    * WITHOUT writing (the replayed-batch path); otherwise append as a
    * new version carrying the tag. Tag and version commit atomically
    * (the tag lives in the manifest the rename publishes), so there is
    * no crash window where the batch's data is visible but its replay
    * marker is not, or vice versa. A crash after the data-file stage
    * but before the commit leaves orphans for [[vacuum]]; the replay
    * re-stages and commits fresh files.
    */
  def appendBatch(
      spark: SparkSession, path: String, df: DataFrame, tag: String): Long =
    tags(spark, path).get(tag) match {
      case Some(v) => v
      case None =>
        val v = latestVersion(spark, path)
        val cur = readManifest(spark, path, v)
        commit(spark, path, v + 1, cur ++ writeDataFiles(spark, path, df),
          Some(tag))
    }

  /** History report: (version, n_rows) per committed version — the
    * DESCRIBE HISTORY surface. Row counts come from parquet footers
    * (count(*) over an exact file list), so the report costs metadata
    * reads, not data scans.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    versions(spark, path)
      .map(v => (v, read(spark, path, Some(v)).count()))
      .toDF("version", "n_rows")
  }

  /** Drop data files referenced by NO retained manifest and all
    * manifests older than `keepVersions` back from latest. Orphans
    * from crashed commits go with them.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 2): Unit = {
    require(keepVersions >= 1, "TableLog.vacuum: must keep at least the latest")
    val f = fs(spark, path)
    val vs = versions(spark, path)
    val keep = vs.takeRight(keepVersions)
    val referenced = keep.flatMap(readManifest(spark, path, _)).toSet
    if (f.exists(dataDir(path)))
      f.listStatus(dataDir(path)).foreach { s =>
        if (s.isFile && !referenced.contains(s.getPath.getName))
          f.delete(s.getPath, false)
      }
    vs.dropRight(keepVersions).foreach(v => f.delete(manifestPath(path, v), false))
    // crashed-commit scratch dirs are orphans too
    f.listStatus(new Path(path)).foreach { s =>
      if (s.isDirectory && s.getPath.getName.startsWith("_scratch_"))
        f.delete(s.getPath, true)
    }
  }
}
