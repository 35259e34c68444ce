package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{Callable, Executors}

import scala.jdk.CollectionConverters._
// parquet's ColumnChunkMetaData.getStatistics returns Statistics[T forSome T]
import scala.language.existentials

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Versioned table layer — the manifest/snapshot log that unifies the
  * [[StorageLayout]] maintenance moves (append, compact, delete,
  * recluster) into ATOMIC table versions with time travel, the
  * Delta/Iceberg log shape reduced to its load-bearing core:
  *
  *  - data files are immutable and live flat under `<path>/data/`;
  *  - version N is a manifest `<path>/_log/vNNNNNNN.json` listing the
  *    file names that make up the table at N, plus per-file per-column
  *    min/max bounds harvested from the parquet FOOTERS at write time
  *    (zero data IO — the stats the writer already paid for);
  *  - every commit writes its NEW data files first, then publishes
  *    the manifest via a write-to-tmp + rename (the ledger-first
  *    rule): a crash mid-commit leaves orphan data files and NO
  *    manifest, so readers never see a partial version and a re-run
  *    simply re-commits;
  *  - old versions stay readable (time travel) until [[vacuum]]
  *    drops files no retained manifest references — and vacuum
  *    records its retention watermark FIRST, so a reader of a
  *    dropped version fails fast with "version vacuumed", never a
  *    mid-job FileNotFound;
  *  - all MUTATIONS serialize behind [[IndexOps.withMutationLock]]:
  *    a second concurrent committer fails loudly instead of racing
  *    the version counter and stranding orphan data files.
  *
  * Contrast with the directory-swap maintenance ops
  * ([[StorageLayout.compactSmallFiles]]/[[StorageLayout.deleteWhere]]):
  * those mutate a plain parquet directory in place (no history, works
  * on any existing data); this layer buys atomic multi-reader
  * versioning and time travel for the price of owning the directory
  * layout. [[optimizeRange]]/[[optimizeZOrder]] are the committed-
  * version twins of the StorageLayout layout writers (Delta's
  * OPTIMIZE ZORDER): a recluster is a table version, time-travelable
  * and vacuumable like any other.
  *
  * 100 TB shape: manifests carry file NAMES + footer bounds (bytes
  * proportional to file count, never data); reads hand Spark the
  * exact file list, so scan planning never lists the directory;
  * [[readBand]] prunes that list against the manifest bounds BEFORE
  * Spark opens a single footer — at object-store latency the
  * difference between one manifest read and 100k footer GETs.
  * Per-file driver work (staging renames, footer harvests) runs on a
  * bounded thread pool, not a serial loop.
  */
object TableLog {

  /** Per-file column bound from the parquet footer. `kind`: "l"
    * (integral), "d" (floating), "s" (UTF8 string); min/max carried
    * as strings so 64-bit longs survive JSON exactly.
    */
  final case class ColBound(kind: String, min: String, max: String)

  private final case class Manifest(
      tag: Option[String],
      files: Seq[String],
      stats: Map[String, Map[String, ColBound]],
      schema: Option[org.apache.spark.sql.types.StructType] = None)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logDir(path: String) = new Path(s"$path/_log")
  private def dataDir(path: String) = new Path(s"$path/data")
  private def manifestPath(path: String, v: Long) =
    new Path(logDir(path), f"v$v%07d.json")
  private def watermarkPath(path: String) =
    new Path(logDir(path), "_vacuum_watermark")

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

  private def readSmallFile(spark: SparkSession, path: String, p: Path): String = {
    val f = fs(spark, path)
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def manifestBody(spark: SparkSession, path: String, v: Long): String = {
    val f = fs(spark, path)
    val mp = manifestPath(path, v)
    require(f.exists(mp), s"TableLog: version $v not committed at $path")
    readSmallFile(spark, path, mp)
  }

  /** Parse a manifest; accepts all historical formats (bare JSON
    * string array; {"tag","files"}; {"tag","files","stats"}).
    */
  private def parseManifest(body: String): Manifest =
    JsonMethods.parse(body) match {
      case JArray(vs) =>
        Manifest(None, vs.collect { case JString(s) => s }, Map.empty)
      case o: JObject =>
        val tag = o \ "tag" match { case JString(t) => Some(t); case _ => None }
        val files = o \ "files" match {
          case JArray(vs) => vs.collect { case JString(s) => s }
          case _ => Nil
        }
        val stats = o \ "stats" match {
          case JObject(byFile) => byFile.map { case (fname, cols) =>
            fname -> (cols match {
              case JObject(byCol) => byCol.collect {
                case (cn, JArray(List(JString(k), JString(mn), JString(mx)))) =>
                  cn -> ColBound(k, mn, mx)
              }.toMap
              case _ => Map.empty[String, ColBound]
            })
          }.toMap
          case _ => Map.empty[String, Map[String, ColBound]]
        }
        val schema = o \ "schema" match {
          case JString(s) => Some(org.apache.spark.sql.types.DataType
            .fromJson(s).asInstanceOf[org.apache.spark.sql.types.StructType])
          case _ => None
        }
        Manifest(tag, files, stats, schema)
      case other =>
        throw new IllegalStateException(s"TableLog: unparseable manifest: $other")
    }

  private def renderManifest(m: Manifest): String = {
    val filesJ = JArray(m.files.sorted.map(JString(_): JValue).toList)
    val statsJ = JObject(m.stats.toList.sortBy(_._1).map { case (f, cols) =>
      f -> (JObject(cols.toList.sortBy(_._1).map { case (c, b) =>
        c -> (JArray(List(JString(b.kind), JString(b.min), JString(b.max))): JValue)
      }): JValue)
    })
    val fields: List[(String, JValue)] =
      m.tag.map(t => "tag" -> (JString(t): JValue)).toList ++
        m.schema.map(s => "schema" -> (JString(s.json): JValue)).toList :+
        ("files" -> (filesJ: JValue)) :+ ("stats" -> (statsJ: JValue))
    JsonMethods.compact(JsonMethods.render(JObject(fields)))
  }

  private def readManifestFull(
      spark: SparkSession, path: String, v: Long): Manifest =
    parseManifest(manifestBody(spark, path, v))

  private def readManifest(spark: SparkSession, path: String, v: Long): Seq[String] =
    readManifestFull(spark, path, v).files

  /** Write a tag checkpoint every this many versions (amortizes
    * [[tags]] from O(#versions) manifest reads to O(1) checkpoint +
    * O(K) recent manifests — the Delta checkpoint move applied to the
    * one derived map this log maintains).
    */
  val TagCheckpointEvery: Long = 32L

  private def ckptPath(path: String, v: Long) =
    new Path(logDir(path), f"_ckpt_v$v%07d.json")

  /** Newest tag checkpoint: (covered-through version, tag map). */
  private def newestCkpt(
      spark: SparkSession, path: String): Option[(Long, Map[String, Long])] = {
    val f = fs(spark, path)
    if (!f.exists(logDir(path))) None
    else f.listStatus(logDir(path)).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_ckpt_v") && n.endsWith(".json") =>
        n.stripPrefix("_ckpt_v").stripSuffix(".json").toLong
      }.sorted.lastOption.map { v =>
        val tags = JsonMethods.parse(
          readSmallFile(spark, path, ckptPath(path, v))) \ "tags" match {
          case JObject(fields) => fields.collect {
            case (k, JInt(n)) => k -> n.toLong
          }.toMap
          case _ => Map.empty[String, Long]
        }
        (v, tags)
      }
  }

  /** Checkpoint the full tag map as of version `v` (tmp + rename;
    * derived data — a stale or missing checkpoint only costs manifest
    * reads). Older checkpoints are dropped.
    */
  private def writeCkpt(
      spark: SparkSession, path: String, v: Long,
      tagMap: Map[String, Long]): Unit = {
    val f = fs(spark, path)
    val body = JsonMethods.compact(JsonMethods.render(JObject(List(
      "version" -> (JInt(v): JValue),
      "tags" -> (JObject(tagMap.toList.sortBy(_._1).map { case (k, n) =>
        k -> (JInt(n): JValue)
      }): JValue)))))
    val tmp = new Path(logDir(path), "_tmp_ckpt.json")
    val out = f.create(tmp, true)
    out.write(body.getBytes(UTF_8))
    out.close()
    f.delete(ckptPath(path, v), false)
    require(f.rename(tmp, ckptPath(path, v)),
      "TableLog: tag checkpoint publish failed")
    f.listStatus(logDir(path)).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("_ckpt_v") && n.endsWith(".json") &&
        n.stripPrefix("_ckpt_v").stripSuffix(".json").toLong < v)
        f.delete(s.getPath, false)
    }
  }

  /** Idempotency tags of all committed versions (see [[appendBatch]]):
    * the newest checkpoint plus the manifests committed after it —
    * O(1) + O(versions-since-checkpoint) reads, not O(#versions).
    * Because [[vacuum]] checkpoints BEFORE dropping manifests, tags
    * of vacuumed versions survive — a replayed ancient batch is still
    * recognized instead of silently double-appending.
    */
  def tags(spark: SparkSession, path: String): Map[String, Long] = {
    val base = newestCkpt(spark, path)
    val from = base.map(_._1).getOrElse(0L)
    val inc = versions(spark, path).filter(_ > from).flatMap { v =>
      readManifestFull(spark, path, v).tag.map(_ -> v)
    }.toMap
    base.map(_._2).getOrElse(Map.empty[String, Long]) ++ inc
  }

  /** File names making up `version` (default latest) — the manifest's
    * list, exposed for maintenance policies (e.g. a streaming sink's
    * compaction threshold) without planning a read.
    */
  def files(spark: SparkSession, path: String,
      version: Option[Long] = None): Seq[String] = {
    val v = version.getOrElse(latestVersion(spark, path))
    readManifest(spark, path, v)
  }

  /** Per-file column bounds recorded in version `v`'s manifest
    * (empty map per file for pre-stats manifests).
    */
  def fileStats(spark: SparkSession, path: String, v: Long)
      : Map[String, Map[String, ColBound]] =
    readManifestFull(spark, path, v).stats

  /** Publish `files` (+ per-file footer bounds) as version `v`: tmp
    * write, fsync-close, rename. The rename is the commit point; an
    * optional idempotency `tag` rides INSIDE the manifest, so tag and
    * version become visible atomically.
    */
  private def commit(
      spark: SparkSession, path: String, v: Long, files: Seq[String],
      stats: Map[String, Map[String, ColBound]],
      tag: Option[String] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Long = {
    require(files.nonEmpty, "TableLog: refusing to commit an empty file list " +
      "(an all-rows delete; drop the table instead)")
    // no quotes or brackets: defense in depth for any downstream
    // consumer that greps manifests textually (the JSON layer itself
    // escapes correctly since the stats upgrade)
    require(tag.forall(t => !t.exists(c => c == '"' || c == '[' || c == ']')),
      "TableLog: tag must not contain quotes or square brackets")
    val f = fs(spark, path)
    f.mkdirs(logDir(path))
    val tmp = new Path(logDir(path), f"_tmp_v$v%07d.json")
    val out = f.create(tmp, true)
    out.write(renderManifest(Manifest(tag, files, stats, schema)).getBytes(UTF_8))
    out.close()
    require(f.rename(tmp, manifestPath(path, v)),
      s"TableLog: commit rename failed for v$v (concurrent writer?)")
    v
  }

  /** Run `n` per-file driver tasks on a bounded pool (object-store
    * metadata latency makes a serial loop O(#files · RTT); 16-wide
    * keeps a 100k-file commit in seconds). Exceptions propagate.
    */
  private def perFile[A, B](items: Seq[A], width: Int = 16)(f: A => B): Seq[B] = {
    if (items.isEmpty) Nil
    else if (items.size == 1) Seq(f(items.head))
    else {
      val pool = Executors.newFixedThreadPool(math.min(width, items.size))
      try {
        val futures = items.map(a => pool.submit(new Callable[B] {
          override def call(): B = f(a)
        }))
        futures.map(_.get())
      } finally pool.shutdown()
    }
  }

  /** Reserved stats key carrying the file's ROW COUNT (from the
    * footer's block metadata): [[history]] and any count-only reader
    * answer from the manifest without opening a single file. '#' is
    * not legal in this layer's column names, so it cannot collide.
    */
  val RowsKey = "#rows"

  /** Min/max bounds per TOP-LEVEL primitive column from one parquet
    * file's footer — metadata IO only, merged across row groups — plus
    * the file row count under [[RowsKey]]. A column whose chunks lack
    * usable stats in any block is omitted (readers treat missing
    * bounds as "cannot prune": conservative).
    */
  private def footerBounds(
      spark: SparkSession, file: Path): Map[String, ColBound] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, hconf))
    try {
      val acc = scala.collection.mutable.Map.empty[String, ColBound]
      val dead = scala.collection.mutable.Set.empty[String]
      val nRows = reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      acc(RowsKey) = ColBound("l", nRows.toString, nRows.toString)
      for (b <- reader.getFooter.getBlocks.asScala;
           c <- b.getColumns.asScala if c.getPath.size == 1) {
        require(c.getPath.toDotString != RowsKey,
          s"TableLog: column name $RowsKey is reserved")
        val name = c.getPath.toDotString
        val st = c.getStatistics
        if (st == null || st.isEmpty || !st.hasNonNullValue) dead += name
        else {
          val pt = c.getPrimitiveType
          val bound: Option[ColBound] = pt.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
              Some(ColBound("l",
                st.genericGetMin.toString, st.genericGetMax.toString))
            case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
              Some(ColBound("d",
                st.genericGetMin.toString, st.genericGetMax.toString))
            case PrimitiveTypeName.BINARY
                if pt.getLogicalTypeAnnotation ==
                  LogicalTypeAnnotation.stringType() =>
              Some(ColBound("s",
                st.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8,
                st.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8))
            case _ => None
          }
          bound match {
            case None => dead += name
            case Some(nb) =>
              acc.get(name) match {
                case None => acc(name) = nb
                case Some(prev) => acc(name) = mergeBounds(prev, nb)
              }
          }
        }
      }
      acc.toMap.filterNot { case (k, _) => dead.contains(k) }
    } finally reader.close()
  }

  private def mergeBounds(a: ColBound, b: ColBound): ColBound = a.kind match {
    case "l" => ColBound("l",
      math.min(a.min.toLong, b.min.toLong).toString,
      math.max(a.max.toLong, b.max.toLong).toString)
    case "d" => ColBound("d",
      math.min(a.min.toDouble, b.min.toDouble).toString,
      math.max(a.max.toDouble, b.max.toDouble).toString)
    case _ => ColBound("s",
      if (a.min <= b.min) a.min else b.min,
      if (a.max >= b.max) a.max else b.max)
  }

  /** Write `df`'s rows as new immutable data files under the table's
    * data dir; returns their names and per-file footer bounds. Files
    * are staged through a scratch dir and renamed in (same volume),
    * so a crash leaves orphans in scratch, never half-visible names
    * in data/. Renames and footer harvests run on the bounded pool.
    */
  private def writeDataFiles(
      spark: SparkSession, path: String, df: DataFrame)
      : (Seq[String], Map[String, Map[String, ColBound]]) = {
    val f = fs(spark, path)
    val scratch = new Path(s"$path/_scratch_${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(scratch.toString)
    f.mkdirs(dataDir(path))
    val staged = f.listStatus(scratch).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    val names = perFile(staged) { p =>
      val n = p.getName
      require(f.rename(p, new Path(dataDir(path), n)),
        s"TableLog: could not stage data file $n")
      n
    }
    val stats = perFile(names) { n =>
      n -> footerBounds(spark, new Path(dataDir(path), n))
    }.toMap
    f.delete(scratch, true)
    (names, stats)
  }

  private def withLock[A](spark: SparkSession, path: String, op: String)(
      body: => A): A =
    IndexOps.withMutationLock(spark, path, s"TableLog.$op")(body)

  /** Schema evolution rule: appends may ADD columns; same-name
    * columns must keep their type (retypes/renames are a rewrite,
    * not an append). Everything goes nullable — old rows lack the
    * new columns, and an evolved batch may omit old ones.
    */
  private def mergedSchema(
      cur: Option[org.apache.spark.sql.types.StructType],
      incoming: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = cur match {
    case None => incoming
    case Some(base) =>
      val byName = base.fields.map(f => f.name -> f).toMap
      incoming.fields.foreach { f =>
        byName.get(f.name).foreach { ex =>
          require(ex.dataType == f.dataType,
            s"TableLog: column ${f.name} type would change " +
              s"${ex.dataType} -> ${f.dataType} — appends add columns, " +
              "never retype; rewrite the table instead")
        }
      }
      val added = incoming.fields.filterNot(f => byName.contains(f.name))
      org.apache.spark.sql.types.StructType(
        (base.fields ++ added).map(_.copy(nullable = true)))
  }

  /** Create the table (version 1). Fails if a log already exists. */
  def create(spark: SparkSession, path: String, df: DataFrame): Long =
    withLock(spark, path, "create") {
      require(versions(spark, path).isEmpty,
        s"TableLog: table already exists at $path")
      val (names, stats) = writeDataFiles(spark, path, df)
      commit(spark, path, 1L, names, stats, schema = Some(df.schema))
    }

  /** Append rows as a new version (old files + new files). The batch
    * may carry NEW columns (schema evolution): the committed schema
    * is the by-name union, old rows read back NULL in the added
    * columns, and a batch missing old columns reads back NULL there —
    * types never silently change ([[mergedSchema]]).
    */
  def append(spark: SparkSession, path: String, df: DataFrame): Long =
    withLock(spark, path, "append") {
      val v = latestVersion(spark, path)
      val cur = readManifestFull(spark, path, v)
      val base = cur.schema.orElse(
        Some(readFiles(spark, path, cur, cur.files).schema))
      val (names, stats) = writeDataFiles(spark, path, df)
      commit(spark, path, v + 1, cur.files ++ names, cur.stats ++ stats,
        schema = Some(mergedSchema(base, df.schema)))
    }

  /** Lowest version still readable after the last vacuum (1 if never
    * vacuumed). Written BEFORE vacuum deletes anything, so the guard
    * in [[read]] holds even across a mid-vacuum crash.
    */
  def vacuumWatermark(spark: SparkSession, path: String): Long = {
    val f = fs(spark, path)
    val wp = watermarkPath(path)
    if (!f.exists(wp)) 1L
    else readSmallFile(spark, path, wp).trim.toLong
  }

  private def checkNotVacuumed(spark: SparkSession, path: String, v: Long): Unit = {
    val wm = vacuumWatermark(spark, path)
    require(v >= wm,
      s"TableLog: version $v vacuumed (oldest readable version is $wm) — " +
        "its manifest may survive a crashed vacuum but its data files are gone")
  }

  /** Read a file subset under a manifest's recorded schema: with a
    * schema in the log, Spark never opens a footer to plan (missing
    * columns — schema evolution — come back NULL); without one
    * (pre-schema manifests) the reader infers from footers as before.
    */
  private def readFiles(
      spark: SparkSession, path: String, m: Manifest,
      names: Seq[String]): DataFrame = {
    val files = names.map(n => new Path(dataDir(path), n).toString)
    m.schema match {
      case Some(sc) => spark.read.schema(sc).parquet(files: _*)
      case None => spark.read.parquet(files: _*)
    }
  }

  /** Read the table at `version` (default: latest). Hands Spark the
    * manifest's exact file list — no directory listing, orphans and
    * other versions' files invisible. A version below the vacuum
    * watermark fails fast here instead of mid-job FileNotFound.
    */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, path))
    checkNotVacuumed(spark, path, v)
    val m = readManifestFull(spark, path, v)
    readFiles(spark, path, m, m.files)
  }

  /** Manifest-level file pruning: names of version `v`'s files whose
    * recorded [min,max] for `colName` overlaps [lower, upper] — plus
    * every file with no recorded bound for the column (conservative).
    * Decided entirely from the manifest: zero parquet footer opens.
    */
  def bandFiles(
      spark: SparkSession, path: String, colName: String,
      lower: Any, upper: Any, version: Option[Long] = None): Seq[String] = {
    val v = version.getOrElse(latestVersion(spark, path))
    checkNotVacuumed(spark, path, v)
    val m = readManifestFull(spark, path, v)
    m.files.filter { n =>
      m.stats.get(n).flatMap(_.get(colName)) match {
        case None => true
        case Some(b) => overlaps(b, lower, upper)
      }
    }
  }

  private def overlaps(b: ColBound, lower: Any, upper: Any): Boolean =
    try b.kind match {
      case "l" =>
        b.min.toLong <= anyToLong(upper) && b.max.toLong >= anyToLong(lower)
      case "d" =>
        b.min.toDouble <= anyToDouble(upper) && b.max.toDouble >= anyToDouble(lower)
      case _ =>
        b.min <= upper.toString && b.max >= lower.toString
    } catch {
      // band value not convertible to the recorded kind: never prune
      case _: NumberFormatException => true
    }

  private def anyToLong(a: Any): Long = a match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case s: String => s.toLong
    case other => throw new NumberFormatException(other.toString)
  }

  private def anyToDouble(a: Any): Double = a match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: String => s.toDouble
    case other => throw new NumberFormatException(other.toString)
  }

  /** Band read served through manifest pruning: semantically equal to
    * `read(version).where(colName between lower and upper)`, but the
    * file list is cut against the manifest bounds BEFORE Spark plans
    * the scan. On a table clustered on `colName`
    * ([[optimizeRange]]/[[optimizeZOrder]]), a narrow band reads a
    * handful of files out of 100k without opening the rest's footers.
    * The residual predicate still applies (bounds are per-file, not
    * per-row).
    */
  def readBand(
      spark: SparkSession, path: String, colName: String,
      lower: Any, upper: Any, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, path))
    val pred = col(colName) >= lit(lower) && col(colName) <= lit(upper)
    val kept = bandFiles(spark, path, colName, lower, upper, Some(v))
    val m = readManifestFull(spark, path, v)
    if (kept.isEmpty) readFiles(spark, path, m, m.files).where(lit(false))
    else readFiles(spark, path, m, kept).where(pred)
  }

  /** Compact the current version's files toward a row target as a new
    * version. Old files stay (time travel) until [[vacuum]].
    */
  def compact(spark: SparkSession, path: String, targetRowsPerFile: Long): Long =
    withLock(spark, path, "compact") {
      require(targetRowsPerFile > 0, "TableLog.compact: target must be positive")
      val v = latestVersion(spark, path)
      val cur = read(spark, path, Some(v))
      val rows = cur.count()
      val k = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      val src = read(spark, path, Some(v))
      val compacted = if (src.rdd.getNumPartitions >= k) src.coalesce(k)
        else src.repartition(k)
      val (names, stats) = writeDataFiles(spark, path, compacted)
      commit(spark, path, v + 1, names, stats,
        schema = readManifestFull(spark, path, v).schema)
    }

  /** OPTIMIZE, range flavor: rewrite the latest version's rows
    * range-partitioned + sorted on `colName` as a NEW COMMITTED
    * VERSION — the [[StorageLayout.writeRangeClustered]] layout win
    * (tight near-disjoint per-file bounds; [[readBand]] then prunes
    * from the manifest) without the out-of-band directory rewrite:
    * the recluster is time-travelable and concurrent readers keep
    * reading the old version throughout.
    */
  def optimizeRange(
      spark: SparkSession, path: String, colName: String, numFiles: Int): Long =
    withLock(spark, path, "optimizeRange") {
      require(numFiles > 0, "TableLog.optimizeRange: numFiles must be positive")
      val v = latestVersion(spark, path)
      val clustered = read(spark, path, Some(v))
        .repartitionByRange(numFiles, col(colName))
        .sortWithinPartitions(colName)
      val (names, stats) = writeDataFiles(spark, path, clustered)
      commit(spark, path, v + 1, names, stats,
        schema = readManifestFull(spark, path, v).schema)
    }

  /** OPTIMIZE, z-order flavor over k ≥ 2 numeric columns (Delta's
    * OPTIMIZE ZORDER as a committed version): equi-depth bucket
    * ranks, Morton-interleaved, range-partitioned + sorted — files
    * end up tight in EVERY listed dimension, so [[readBand]] on any
    * of them prunes from the manifest.
    */
  def optimizeZOrder(
      spark: SparkSession, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 8): Long =
    withLock(spark, path, "optimizeZOrder") {
      require(numFiles > 0, "TableLog.optimizeZOrder: numFiles must be positive")
      val v = latestVersion(spark, path)
      val df = read(spark, path, Some(v))
      val zv = StorageLayout.zValueN(
        cols.map(c => StorageLayout.equiDepthBucket(df, c, bits)), bits)
      val clustered = df.withColumn("_tl_z", zv)
        .repartitionByRange(numFiles, col("_tl_z"))
        .sortWithinPartitions("_tl_z")
        .drop("_tl_z")
      val (names, stats) = writeDataFiles(spark, path, clustered)
      commit(spark, path, v + 1, names, stats,
        schema = readManifestFull(spark, path, v).schema)
    }

  /** Incremental OPTIMIZE (Delta's `OPTIMIZE WHERE`): recluster ONLY
    * the files whose recorded bounds overlap [lower, upper] on
    * `colName` (plus files with no recorded bound — conservative),
    * range-partitioned + sorted on the column; every other file
    * carries over BY NAME with its stats, zero IO. Whole files are
    * rewritten, so content is exactly preserved even when a touched
    * file also holds rows outside the band. This is the only
    * OPTIMIZE a 100 TB table can afford on a steady-state ingest
    * tail: the rewrite cost is proportional to the MESSY REGION
    * (yesterday's appends), not the table.
    */
  def optimizeRangeWhere(
      spark: SparkSession, path: String, colName: String,
      lower: Any, upper: Any, numFiles: Int): Long =
    withLock(spark, path, "optimizeRangeWhere") {
      require(numFiles > 0, "TableLog.optimizeRangeWhere: numFiles must be positive")
      val v = latestVersion(spark, path)
      checkNotVacuumed(spark, path, v)
      val m = readManifestFull(spark, path, v)
      val touchedSet = m.files.filter { n =>
        m.stats.get(n).flatMap(_.get(colName)) match {
          case None => true
          case Some(b) => overlaps(b, lower, upper)
        }
      }.toSet
      if (touchedSet.isEmpty)
        commit(spark, path, v + 1, m.files, m.stats, schema = m.schema)
      else {
        val (touched, untouched) = m.files.partition(touchedSet.contains)
        val clustered = readFiles(spark, path, m, touched)
          .repartitionByRange(numFiles, col(colName))
          .sortWithinPartitions(colName)
        val (names, stats) = writeDataFiles(spark, path, clustered)
        commit(spark, path, v + 1, untouched ++ names,
          m.stats.filterNot { case (k, _) => touchedSet.contains(k) } ++ stats,
          schema = m.schema)
      }
    }

  /** The advisor loop closed (round-11 q184 → a committed version):
    * profile the CURRENT version, ask
    * [[StorageLayout.adviseLayout]] for the physical design, and
    * APPLY it — [[optimizeZOrder]] on (range_cluster, zorder_with)
    * when the advisor names a partner, [[optimizeRange]] on the
    * range_cluster column alone otherwise. Returns the new version,
    * the applied mode ("zorder" | "range") and the columns used.
    * Deterministic: the advisor's rules are integer/string ranks, so
    * the same table state always yields the same rewrite.
    */
  def autoOptimize(
      spark: SparkSession, path: String, clusterable: Seq[String],
      numFiles: Int, maxPartitions: Long = 20L,
      bits: Int = 8): (Long, String, Seq[String]) = {
    val cur = read(spark, path)
    val prof = TableProfile.profile(cur, cur.columns.toSeq)
    val advice = StorageLayout
      .adviseLayout(prof, clusterable, maxPartitions)
      .select(col("col_name"), col("role")).collect()
    val rc = advice.find(_.getString(1) == "range_cluster").map(_.getString(0))
    val zw = advice.find(_.getString(1) == "zorder_with").map(_.getString(0))
    (rc, zw) match {
      case (Some(a), Some(b)) =>
        (optimizeZOrder(spark, path, Seq(a, b), numFiles, bits),
          "zorder", Seq(a, b))
      case (Some(a), None) =>
        (optimizeRange(spark, path, a, numFiles), "range", Seq(a))
      case _ =>
        throw new IllegalArgumentException(
          "TableLog.autoOptimize: the advisor found no clusterable " +
            s"column among ${clusterable.mkString(", ")} — nothing to apply")
    }
  }

  /** Delete matching rows as a new version: untouched files carry
    * over BY NAME with their recorded bounds (zero IO — the manifest
    * layer's advantage over the directory-swap
    * [[StorageLayout.deleteWhere]], which must link or copy them),
    * touched files are rewritten without their matches.
    */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Long =
    withLock(spark, path, "deleteWhere") {
      val v = latestVersion(spark, path)
      val cur = readManifestFull(spark, path, v)
      deleteCore(spark, path, v, cur, cur.files, predicate)
    }

  /** [[deleteWhere]] specialized to a band on a stats column: the
    * CANDIDATE file set comes from the MANIFEST bounds (files whose
    * [min,max] overlaps the band, plus unbounded files —
    * conservative), so the match-discovery job scans only the band's
    * neighborhood instead of the whole table. On a table clustered on
    * `colName`, a TTL/GDPR delete's discovery cost is proportional to
    * the band — the difference between touching yesterday's files and
    * re-reading 100 TB.
    */
  def deleteBand(
      spark: SparkSession, path: String, colName: String,
      lower: Any, upper: Any): Long =
    withLock(spark, path, "deleteBand") {
      val v = latestVersion(spark, path)
      checkNotVacuumed(spark, path, v)
      val cur = readManifestFull(spark, path, v)
      val candidates = cur.files.filter { n =>
        cur.stats.get(n).flatMap(_.get(colName)) match {
          case None => true
          case Some(b) => overlaps(b, lower, upper)
        }
      }
      val pred = col(colName) >= lit(lower) && col(colName) <= lit(upper)
      if (candidates.isEmpty)
        commit(spark, path, v + 1, cur.files, cur.stats, schema = cur.schema)
      else deleteCore(spark, path, v, cur, candidates, pred)
    }

  /** Shared delete engine: find files containing matches WITHIN the
    * candidate set (one bounded `_metadata.file_path` job), rewrite
    * only those without their matches, carry everything else by name.
    */
  private def deleteCore(
      spark: SparkSession, path: String, v: Long, cur: Manifest,
      candidates: Seq[String], predicate: Column): Long = {
    val df = readFiles(spark, path, cur, candidates)
    val perFileMatches = df.where(predicate)
      .groupBy(col("_metadata.file_path").as("_tl_f"))
      .agg(count(lit(1)).as("_tl_n")).collect()
    val touchedNames =
      perFileMatches.map(r => new Path(r.getString(0)).getName).toSet
    if (touchedNames.isEmpty)
      commit(spark, path, v + 1, cur.files, cur.stats, schema = cur.schema)
    else {
      val rowsDeleted = perFileMatches.map(_.getLong(1)).sum
      val (touched, untouched) = cur.files.partition(touchedNames.contains)
      val touchedDf = readFiles(spark, path, cur, touched)
      val touchedRows = touchedDf.count()
      // survivors = NOT(matched): NULL-predicate rows did not match
      // and must be kept — bare !predicate is NULL for them and
      // would drop them silently (StorageLayout.deleteWhere
      // discipline)
      val survivors = touchedDf.where(!coalesce(predicate, lit(false)))
      val (newFiles, newStats) =
        if (survivors.isEmpty) (Nil, Map.empty[String, Map[String, ColBound]])
        else writeDataFiles(spark, path, survivors)
      // row accounting BEFORE the commit rename: a survivor filter
      // that dropped more than the matched rows (e.g. a
      // non-deterministic predicate) aborts here, leaving only
      // orphan data files for vacuum — never a committed wrong
      // version
      val survivorRows =
        if (newFiles.isEmpty) 0L
        else spark.read.parquet(
          newFiles.map(n => new Path(dataDir(path), n).toString): _*).count()
      require(survivorRows == touchedRows - rowsDeleted,
        s"TableLog.deleteWhere: survivors have $survivorRows rows, want " +
          s"${touchedRows - rowsDeleted} — aborting commit (orphans go to vacuum)")
      commit(spark, path, v + 1, untouched ++ newFiles,
        cur.stats.filterNot { case (k, _) => touchedNames.contains(k) } ++ newStats,
        schema = cur.schema)
    }
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
        withLock(spark, path, "appendBatch") {
          // re-check under the lock: a concurrent committer may have
          // landed this tag between the lock-free probe and here
          tags(spark, path).get(tag) match {
            case Some(v) => v
            case None =>
              val v = latestVersion(spark, path)
              val cur = readManifestFull(spark, path, v)
              val base = cur.schema.orElse(
                Some(readFiles(spark, path, cur, cur.files).schema))
              val (names, stats) = writeDataFiles(spark, path, df)
              val committed = commit(spark, path, v + 1, cur.files ++ names,
                cur.stats ++ stats, Some(tag),
                schema = Some(mergedSchema(base, df.schema)))
              // amortized tag checkpoint (derived data; crash-safe to
              // skip or repeat) keeps tags() O(1)+O(K) as a streaming
              // sink accretes thousands of tagged versions
              if (committed % TagCheckpointEvery == 0L)
                writeCkpt(spark, path, committed, tags(spark, path))
              committed
          }
        }
    }

  /** RESTORE: re-commit version `v`'s exact state (files, bounds,
    * schema) as the NEW latest version — the Delta RESTORE shape.
    * Zero data IO: the manifest is copied forward, the bad versions
    * stay readable for forensics until [[vacuum]], and the restore
    * itself is time-travelable like any commit. Fails fast if `v`
    * was vacuumed (its files are gone).
    */
  def restore(spark: SparkSession, path: String, v: Long): Long =
    withLock(spark, path, "restore") {
      checkNotVacuumed(spark, path, v)
      val m = readManifestFull(spark, path, v)
      val latest = latestVersion(spark, path)
      commit(spark, path, latest + 1, m.files, m.stats, schema = m.schema)
    }

  /** Version diff — CDC between two table versions with IO
    * proportional to CHANGED FILES: files listed by BOTH manifests
    * cancel without being read (immutability makes name equality
    * content equality); only each side's exclusive files are scanned,
    * and the row-level diff is a multiset `exceptAll` over those
    * bounded frames. Output: the `to` version's schema + a `change`
    * column ("added" | "removed"); rows from pre-evolution files read
    * NULL in added columns. A delete that rewrote 2 of 100k files
    * diffs by reading 2 + their survivors — never the table.
    */
  def diff(spark: SparkSession, path: String, fromV: Long, toV: Long): DataFrame = {
    checkNotVacuumed(spark, path, fromV)
    checkNotVacuumed(spark, path, toV)
    val a = readManifestFull(spark, path, fromV)
    val b = readManifestFull(spark, path, toV)
    val shared = a.files.toSet intersect b.files.toSet
    val onlyA = a.files.filterNot(shared)
    val onlyB = b.files.filterNot(shared)
    // both sides read under the TO version's schema: evolution only
    // ADDS columns, so it is the superset and old rows align with
    // NULLs (mergedSchema's retype refusal guarantees compatibility)
    val mTo = b
    def side(names: Seq[String]): DataFrame =
      if (names.isEmpty) readFiles(spark, path, mTo, b.files).where(lit(false))
      else readFiles(spark, path, mTo, names)
    val avail = side(onlyA)
    val bvail = side(onlyB)
    bvail.exceptAll(avail).withColumn("change", lit("added"))
      .unionByName(avail.exceptAll(bvail).withColumn("change", lit("removed")))
  }

  /** History report: (version, n_rows) per READABLE version (vacuumed
    * versions are excluded) — the DESCRIBE HISTORY surface. Versions
    * whose manifest carries [[RowsKey]] counts for every file answer
    * from the MANIFEST alone (zero file opens — at 100k files the
    * difference between one small read and 100k footer GETs per
    * version); pre-stats manifests fall back to a count scan.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val wm = vacuumWatermark(spark, path)
    versions(spark, path).filter(_ >= wm)
      .map { v =>
        val m = readManifestFull(spark, path, v)
        val known = m.files
          .flatMap(n => m.stats.get(n).flatMap(_.get(RowsKey)))
          .map(_.min.toLong)
        val rows =
          if (known.size == m.files.size) known.sum
          else readFiles(spark, path, m, m.files).count()
        (v, rows)
      }
      .toDF("version", "n_rows")
  }

  /** Drop data files referenced by NO retained manifest and all
    * manifests older than `keepVersions` back from latest. Orphans
    * from crashed commits go with them. Ordering is crash-safe for
    * READERS: the retention watermark is published FIRST (tmp +
    * rename), then manifests are deleted, then files — so at every
    * crash point a dropped version either fails [[read]]'s watermark
    * guard or has no manifest, never a manifest whose files are gone.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 2): Unit =
    withLock(spark, path, "vacuum") {
      require(keepVersions >= 1, "TableLog.vacuum: must keep at least the latest")
      val f = fs(spark, path)
      val vs = versions(spark, path)
      val keep = vs.takeRight(keepVersions)
      val referenced = keep.flatMap(readManifest(spark, path, _)).toSet
      // 0. checkpoint the tag map BEFORE dropping manifests: a
      // replayed batch whose version was vacuumed must still be
      // recognized as committed (exactly-once survives retention)
      if (vs.nonEmpty) writeCkpt(spark, path, vs.last, tags(spark, path))
      // 1. watermark first (atomic tmp+rename, monotone non-decreasing)
      if (keep.nonEmpty && keep.head > vacuumWatermark(spark, path)) {
        val tmp = new Path(logDir(path), "_tmp_watermark")
        val out = f.create(tmp, true)
        out.write(keep.head.toString.getBytes(UTF_8))
        out.close()
        f.delete(watermarkPath(path), false)
        require(f.rename(tmp, watermarkPath(path)),
          "TableLog.vacuum: watermark publish failed")
      }
      // 2. expired manifests
      vs.dropRight(keepVersions).foreach(v => f.delete(manifestPath(path, v), false))
      // 3. unreferenced data files (parallel: object-store deletes are
      // per-file RPCs)
      if (f.exists(dataDir(path))) {
        val doomed = f.listStatus(dataDir(path)).toSeq
          .filter(s => s.isFile && !referenced.contains(s.getPath.getName))
          .map(_.getPath)
        perFile(doomed) { p => f.delete(p, false) }
      }
      // crashed-commit scratch dirs are orphans too
      f.listStatus(new Path(path)).foreach { s =>
        if (s.isDirectory && s.getPath.getName.startsWith("_scratch_"))
          f.delete(s.getPath, true)
      }
      ()
    }
}
