package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[TableLog]]'s scale infrastructure, round 13:
  *
  *  - log-state CHECKPOINTS: after 100+ versions, the read path
  *    (latestVersion / read / tags / history) does O(since-checkpoint)
  *    manifest reads and ZERO `_log/` lists (counted IO, not
  *    wall-clock), with content identical to the walk;
  *  - executor-side footer-stats harvest: the Spark-job path above
  *    [[TableLog.StatsJobThreshold]] files produces stats identical
  *    to the driver-pool path;
  *  - optimistic concurrency: concurrent lock-free appenders BOTH
  *    land, with both file sets, as consecutive versions;
  *  - UTF-8 string-bound pruning: supplementary-plane values must not
  *    be wrongly pruned (Java UTF-16 order disagrees with parquet's
  *    UTF-8 byte order past the basic plane);
  *  - total-prune reads: a no-overlap band returns an empty frame
  *    WITHOUT enumerating (or footer-reading) the pruned files;
  *  - diff across RESTORE: a row whose only change sits in a column
  *    the restore dropped must NOT cancel silently.
  */
class TableLogScaleSpec extends GraftSparkSpec {

  import spark.implicits._

  private def freshPath(stem: String): String = {
    val p = graft.SparkEntry.perProcessTmpDir(stem)
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    p
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("checkpointed log: 100+ versions, read path is O(since-checkpoint) reads, zero lists") {
    val path = freshPath("graft-spec-tlog-ckpt")
    TableLog.create(spark, path,
      Seq((0L, 0L)).toDF("id", "w").coalesce(1))
    // 104 versions: tagged appends (the streaming-sink shape) cross
    // three CheckpointEvery boundaries (32, 64, 96)
    (1L until 104L).foreach { i =>
      TableLog.appendBatch(spark, path,
        Seq((i, i)).toDF("id", "w").coalesce(1), s"b$i")
    }
    val latest = TableLog.latestVersion(spark, path)
    assert(latest === 104L)

    def ioDelta[A](body: => A): (A, Long, Long) = {
      val r0 = TableLog.LogIo.manifestReads(path)
      val l0 = TableLog.LogIo.logLists(path)
      val a = body
      (a, TableLog.LogIo.manifestReads(path) - r0,
        TableLog.LogIo.logLists(path) - l0)
    }

    // last checkpoint at v96 -> 8 versions since
    val sinceCkpt = 104L - 96L
    val (_, rLat, lLat) = ioDelta(TableLog.latestVersion(spark, path))
    assert(rLat === 0L, s"latestVersion did $rLat manifest reads")
    assert(lLat === 0L, s"latestVersion listed _log/ $lLat times")

    val (tagMap, rTags, lTags) = ioDelta(TableLog.tags(spark, path))
    assert(rTags <= sinceCkpt, s"tags did $rTags manifest reads")
    assert(lTags === 0L)
    assert(tagMap.size === 103 && tagMap("b1") === 2L && tagMap("b103") === 104L)

    val (hist, rHist, lHist) = ioDelta(
      TableLog.history(spark, path).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1))
    assert(rHist <= sinceCkpt, s"history did $rHist manifest reads")
    assert(lHist === 0L)
    assert(hist.length === 104 && hist.head === ((1L, 1L)) &&
      hist.last === ((104L, 104L)), s"history wrong: ${hist.take(3).toSeq}")

    val (cnt, rRead, lRead) = ioDelta(TableLog.read(spark, path).count())
    assert(rRead <= 1L, s"read(latest) did $rRead manifest reads")
    assert(lRead === 0L)
    assert(cnt === 104L)

    // content is xor-equal to the walk: an explicit-version read (the
    // non-checkpoint path) sees the same table
    assert(rows(TableLog.read(spark, path)) ===
      rows(TableLog.read(spark, path, Some(104L))))

    // vacuum / restore / tag semantics unchanged under checkpoints
    TableLog.vacuum(spark, path, keepVersions = 3)
    assert(TableLog.versions(spark, path) === Seq(102L, 103L, 104L))
    assert(TableLog.appendBatch(spark, path,
      Seq((999L, 999L)).toDF("id", "w"), "b17") === 18L,
      "vacuumed tag must still be recognized (no double-append)")
    assert(TableLog.latestVersion(spark, path) === 104L)
    val v105 = TableLog.restore(spark, path, 103L)
    assert(v105 === 105L)
    assert(TableLog.read(spark, path).count() === 103L)
    // read-at-latest after restore still cheap
    val (_, rAfter, lAfter) = ioDelta(TableLog.read(spark, path).count())
    assert(rAfter <= 9L && lAfter === 0L,
      s"post-restore read: $rAfter reads, $lAfter lists")
  }

  test("executor-side stats harvest: identical to the driver pool; bulk create carries full stats") {
    val path = freshPath("graft-spec-tlog-harvest")
    val nFiles = TableLog.StatsJobThreshold + 8
    val data = (0L until 7200L).map(i => (i, i * 3, s"s$i")).toDF("id", "w", "s")
    TableLog.create(spark, path, data.repartition(nFiles))
    val m = TableLog.read(spark, path).inputFiles
    assert(m.length === nFiles, s"expected $nFiles files, got ${m.length}")
    val names = m.map(f => new org.apache.hadoop.fs.Path(f).getName).toSeq

    // the committed manifest's stats came from the JOB path (> threshold);
    // the driver-pool path must agree bound-for-bound
    val committed = TableLog.fileStats(spark, path, 1L)
    val hconf = spark.sparkContext.hadoopConfiguration
    val viaDriver = names.map { n =>
      n -> TableLog.footerBounds(hconf,
        new org.apache.hadoop.fs.Path(s"$path/data/$n"))
    }.toMap
    assert(committed === viaDriver,
      "job-harvested stats must be identical to the driver-pool harvest")
    // and they are real: every file carries id/w/s bounds + rows
    assert(committed.values.forall(c =>
      c.contains("id") && c.contains("w") && c.contains("s") &&
        c.contains(TableLog.RowsKey)))
    // pruning works off them end-to-end
    TableLog.optimizeRange(spark, path, "id", numFiles = nFiles)
    assert(TableLog.bandFiles(spark, path, "id", 0L, 99L).size <= 2)
  }

  test("optimistic appends: concurrent lock-free appenders both land") {
    val path = freshPath("graft-spec-tlog-optim")
    TableLog.create(spark, path, (0L until 10L).map(i => (i, i)).toDF("id", "w"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { t =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            TableLog.appendOptimistic(spark, path,
              (0L until 5L).map(i => (1000L * t + i, i)).toDF("id", "w")
                .coalesce(1))
        })
      }
      val landed = futures.map(_.get()).sorted
      assert(landed === Seq(2L, 3L, 4L, 5L),
        s"all four appends must land as consecutive versions, got $landed")
    } finally pool.shutdown()
    assert(TableLog.read(spark, path).count() === 30L,
      "every appender's rows must be present")
    assert(TableLog.versions(spark, path) === Seq(1L, 2L, 3L, 4L, 5L))
    // each intermediate version is a consistent superset chain
    assert((2L to 5L).map(v => TableLog.read(spark, path, Some(v)).count())
      === Seq(15L, 20L, 25L, 30L))
    // retype still refused BEFORE any IO
    intercept[IllegalArgumentException] {
      TableLog.appendOptimistic(spark, path, Seq(("x", 1L)).toDF("id", "w"))
    }
  }

  test("optimistic tagged appends: concurrent same-tag sinks land exactly once") {
    val path = freshPath("graft-spec-tlog-optag")
    TableLog.create(spark, path, (0L until 10L).map(i => (i, i)).toDF("id", "w"))
    val batch = (100L until 120L).map(i => (i, i)).toDF("id", "w")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      // 4 sinks replay the SAME batch tag concurrently: one commit
      val sameTag = (0 until 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = TableLog.appendBatchOptimistic(
            spark, path, batch.coalesce(1), "batch-42")
        })
      }.map(_.get()).toSet
      assert(sameTag.size === 1, s"same tag must land once, got $sameTag")
      assert(TableLog.read(spark, path).count() === 30L,
        "the batch's rows must be present exactly once")
      // different tags from concurrent sinks all land
      val diffTags = (0 until 3).map { t =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = TableLog.appendBatchOptimistic(
            spark, path,
            (0L until 5L).map(i => (2000L * t + i, i)).toDF("id", "w")
              .coalesce(1), s"b-$t")
        })
      }.map(_.get()).sorted
      assert(diffTags.distinct.size === 3,
        s"distinct tags must land as distinct versions, got $diffTags")
      assert(TableLog.read(spark, path).count() === 45L)
      assert(TableLog.tags(spark, path).keySet ===
        Set("batch-42", "b-0", "b-1", "b-2"))
      // replay after the fact is still a no-op
      assert(TableLog.appendBatchOptimistic(spark, path, batch, "batch-42")
        === sameTag.head)
      assert(TableLog.read(spark, path).count() === 45L)
    } finally pool.shutdown()
  }

  test("UTF-8 string bounds: supplementary-plane rows are never wrongly pruned") {
    val path = freshPath("graft-spec-tlog-utf8")
    // one file holding U+FFFD and U+1F600: Java UTF-16 order ranks the
    // emoji BELOW �, parquet's UTF-8 order above — comparing
    // bounds with String.compareTo would prune the file for an
    // emoji-only band
    val data = Seq((1L, "�"), (2L, "😀")).toDF("id", "s")
    TableLog.create(spark, path, data.coalesce(1))
    val got = TableLog.readBand(
      spark, path, "s", "😀", "😀")
    assert(got.count() === 1L, "the emoji row must survive bound pruning")
    assert(got.collect().head.getLong(0) === 2L)
    // and the full-read filter agrees
    assert(rows(got) === rows(TableLog.read(spark, path)
      .where(col("s") === "😀")))
  }

  test("total prune returns an empty frame without enumerating pruned files") {
    val path = freshPath("graft-spec-tlog-emptyband")
    val data = (0L until 2000L).map(i => (i, s"p$i")).toDF("id", "p")
    TableLog.create(spark, path, data.repartition(8))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)
    val out = TableLog.readBand(spark, path, "id", 100000L, 200000L)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("id", "p"))
    assert(out.inputFiles.isEmpty,
      s"total prune must not plan over files, saw ${out.inputFiles.length}")
  }

  test("partitioned table: hive layout, manifest partition pruning, band composition") {
    val path = freshPath("graft-spec-tlog-part")
    val data = (0L until 3000L).map(i =>
      (i, Seq("en", "de", "zh")(((i % 3L)).toInt), i % 500L))
      .toDF("id", "lang", "w")
    TableLog.createPartitioned(spark, path, data.repartition(4), Seq("lang"))
    // read recovers the partition column from the hive dirs, one scan
    val full = TableLog.read(spark, path)
    assert(full.count() === 3000L)
    assert(full.columns.toSeq === Seq("id", "w", "lang"),
      "partition column recovered, at the end")
    assert(rows(full.select("id", "lang", "w")) ===
      rows(data.select("id", "lang", "w")))

    // partition pruning: only en files planned, decided from the manifest
    val allFiles = TableLog.files(spark, path)
    val enFiles = TableLog.partitionFiles(spark, path, Map("lang" -> "en"))
    assert(enFiles.nonEmpty && enFiles.size < allFiles.size,
      s"en partition kept ${enFiles.size} of ${allFiles.size}")
    assert(enFiles.forall(_.startsWith("lang=en/")))
    val en = TableLog.readPartition(spark, path, Map("lang" -> "en"))
    assert(en.count() === 1000L)
    assert(en.inputFiles.toSeq.map(f =>
      f.substring(f.indexOf("data/") + 5)).sorted === enFiles.sorted,
      "files planned must be exactly the partition's pruned set")

    // appendPartitioned lands in the right dirs and the manifest
    TableLog.appendPartitioned(spark, path,
      Seq((9999L, "en", 1L)).toDF("id", "lang", "w").coalesce(1))
    assert(TableLog.readPartition(spark, path, Map("lang" -> "en")).count() === 1001L)
    assert(TableLog.readPartition(spark, path, Map("lang" -> "de")).count() === 1000L)

    // partition + band composition: equality first, bounds second
    val band = TableLog.readPartitionBand(
      spark, path, Map("lang" -> "zh"), "w", 0L, 99L)
    assert(rows(band.select("id", "w", "lang")) ===
      rows(TableLog.read(spark, path)
        .where(col("lang") === "zh" && col("w").between(0L, 99L))
        .select("id", "w", "lang")))

    // layout-flattening maintenance refuses loudly; time travel +
    // vacuum work (deleteWhere is partition-aware since round 13)
    intercept[IllegalArgumentException] {
      TableLog.compact(spark, path, 1000L)
    }
    intercept[IllegalArgumentException] {
      TableLog.append(spark, path, data)
    }
    assert(TableLog.read(spark, path, Some(1L)).count() === 3000L)
    TableLog.appendPartitioned(spark, path,
      Seq((10000L, "de", 2L)).toDF("id", "lang", "w").coalesce(1)) // v3
    TableLog.vacuum(spark, path, keepVersions = 2)
    assert(TableLog.read(spark, path).count() === 3002L)
    intercept[IllegalArgumentException] {
      TableLog.read(spark, path, Some(1L))
    }
  }

  test("changes: the version-stamped diff chain, IO bounded to changed files") {
    val path = freshPath("graft-spec-tlog-changes")
    val data = (0L until 1000L).map(i => (i, i * 2)).toDF("id", "w")
    TableLog.create(spark, path, data.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 4)   // v2
    TableLog.deleteBand(spark, path, "id", 0L, 99L)           // v3
    TableLog.append(spark, path,
      (5000L until 5010L).map(i => (i, i)).toDF("id", "w"))   // v4
    val ch = TableLog.changes(spark, path, 2L, 4L)
    assert(ch.columns.toSeq === Seq("id", "w", "change", "_commit_version"))
    val got = ch.collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    val expected =
      (0L until 100L).map(i => (i, "removed", 3L)).toSet ++
        (5000L until 5010L).map(i => (i, "added", 4L)).toSet
    assert(got === expected)
    // v3->v4 is a pure append: its diff reads ONLY the appended files
    assert(TableLog.changes(spark, path, 3L, 4L).inputFiles.length ===
      TableLog.files(spark, path, Some(4L)).size -
        TableLog.files(spark, path, Some(3L)).size)
  }

  test("optimizeBloom: point lookups skip row groups where bounds cannot prune") {
    def decoded(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
      df.collect()
      scans(df.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
    }
    import spark.implicits._
    val n = 200000L
    // hash-scattered unique-ish key: every file's [min,max] spans the
    // whole domain, so manifest bounds keep all files
    val data = (0L until n).map(i =>
      (i, (i * 2654435761L) % 1000000007L, s"payload-$i")).toDF("id", "k", "p")
    val target = (77L * 2654435761L) % 1000000007L

    // baseline: dictionary off (the at-scale fallback), NO blooms —
    // an Eq probe decodes everything
    val basedir = freshPath("graft-spec-bloom-base")
    data.repartition(8).write
      .option("parquet.enable.dictionary", "false").parquet(basedir)
    val dBase = decoded(spark.read.parquet(basedir).where(col("k") === target))
    assert(dBase > n / 2, s"baseline should decode ~all rows, got $dBase")

    val path = freshPath("graft-spec-bloom")
    TableLog.create(spark, path, data.repartition(8))
    TableLog.optimizeBloom(spark, path, Seq("k"), numFiles = 8,
      expectedNdv = 30000L,
      extraWriterOptions = Map("parquet.enable.dictionary" -> "false"))
    // blooms really are in the footers (a silently-inert writer
    // option would fake the whole duel)
    val hconf = spark.sparkContext.hadoopConfiguration
    val f0 = TableLog.read(spark, path).inputFiles.head
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f0), hconf))
    val hasBloom = try {
      rdr.getFooter.getBlocks.get(0).getColumns.asScala
        .exists(c => c.getPath.toDotString == "k" && c.getBloomFilterOffset >= 0)
    } finally rdr.close()
    assert(hasBloom, "bloom filter must be present in the footer")

    // bounds keep all 8 files (hash-scattered)…
    assert(TableLog.bandFiles(spark, path, "k", target, target).size === 8)
    // …but the scan's bloom row-group filter skips 7 of 8 groups
    val point = TableLog.readPoint(spark, path, "k", target)
    val dBloom = decoded(point)
    assert(dBloom <= n / 4,
      s"bloom point lookup decoded $dBloom of $n (baseline $dBase)")
    // correct answer too
    assert(point.select("id").collect().map(_.getLong(0)).toSet === Set(77L))
  }

  test("partitioned deleteWhere: survivors route back into their hive dirs") {
    val path = freshPath("graft-spec-tlog-pdel")
    val data = (0L until 3000L).map(i =>
      (i, Seq("en", "de", "zh")((i % 3L).toInt), i % 500L))
      .toDF("id", "lang", "w")
    TableLog.createPartitioned(spark, path, data.repartition(4), Seq("lang"))
    // predicate mixes a partition column and a data column
    val v2 = TableLog.deleteWhere(spark, path,
      col("lang") === "en" && col("w") < 100L)
    assert(v2 === 2L)
    val got = TableLog.read(spark, path)
    assert(got.count() === 3000L - 200L)
    assert(rows(got.select("id", "lang", "w")) ===
      rows(data.where(!(col("lang") === "en" && col("w") < 100L))
        .select("id", "lang", "w")))
    // de/zh files untouched (carried by name); en rewritten IN PLACE
    // under lang=en/ with partition records intact
    val f1 = TableLog.files(spark, path, Some(1L))
    val f2 = TableLog.files(spark, path, Some(2L))
    assert(f1.filterNot(_.startsWith("lang=en/")).toSet ===
      f2.filterNot(_.startsWith("lang=en/")).toSet)
    assert(f2.filter(_.startsWith("lang=en/")).nonEmpty)
    assert(TableLog.readPartition(spark, path, Map("lang" -> "en")).count()
      === 1000L - 200L, "partition pruning still served after the rewrite")
    // time travel intact; vacuum collects the old en files
    assert(TableLog.read(spark, path, Some(1L)).count() === 3000L)
    TableLog.vacuum(spark, path, keepVersions = 1)
    assert(TableLog.read(spark, path).count() === 2800L)
  }

  test("deletePartition: zero-IO manifest drop of whole partitions") {
    val path = freshPath("graft-spec-tlog-pdrop")
    val data = (0L until 900L).map(i =>
      (i, Seq("en", "de", "zh")((i % 3L).toInt), i))
      .toDF("id", "lang", "w")
    TableLog.createPartitioned(spark, path, data.repartition(3), Seq("lang"))
    val before = TableLog.files(spark, path)
    val v2 = TableLog.deletePartition(spark, path, Map("lang" -> "de"))
    assert(v2 === 2L)
    // pure manifest op: every surviving file is an ORIGINAL file
    val after = TableLog.files(spark, path)
    assert(after.toSet === before.filterNot(_.startsWith("lang=de/")).toSet)
    assert(TableLog.read(spark, path).count() === 600L)
    assert(TableLog.read(spark, path)
      .where(col("lang") === "de").count() === 0L)
    // time travel keeps the dropped partition until vacuum
    assert(TableLog.read(spark, path, Some(1L)).count() === 900L)
    // unknown value: carry-over; unknown column: refusal
    assert(TableLog.files(spark, path,
      Some(TableLog.deletePartition(spark, path, Map("lang" -> "xx")))).toSet
      === after.toSet)
    intercept[IllegalArgumentException] {
      TableLog.deletePartition(spark, path, Map("bogus" -> "x"))
    }
  }

  test("stolen version: a locked mutator retries against the new latest (write-serializable)") {
    val path = freshPath("graft-spec-tlog-steal")
    val data = (0L until 1000L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data.repartition(2))
    // inject an optimistic append INTO deleteWhere's race window: the
    // delete computes against v1, the append steals v2, the delete
    // must retry against v2 and cover the appended rows too
    TableLog.testPreCommit.put(path, new Runnable {
      override def run(): Unit = {
        TableLog.appendOptimistic(spark, path,
          (5000L until 5010L).map(i => (i, i)).toDF("id", "w").coalesce(1))
        ()
      }
    })
    val v = TableLog.deleteWhere(spark, path, col("id") >= 500L)
    assert(v === 3L, "the delete must land AFTER the stolen append")
    val got = TableLog.read(spark, path)
    assert(got.count() === 500L,
      "the retried delete must also cover the concurrently appended rows")
    assert(got.where(col("id") >= 5000L).count() === 0L)
    // intermediate state shows the append alone
    assert(TableLog.read(spark, path, Some(2L)).count() === 1010L)
  }

  test("partitioned merge: upserts route into hive dirs; keys may migrate partitions") {
    val path = freshPath("graft-spec-tlog-pmerge")
    val data = (0L until 1200L).map(i =>
      (i, Seq("en", "de")((i % 2L).toInt), i)).toDF("id", "lang", "w")
    TableLog.createPartitioned(spark, path, data.repartition(4), Seq("lang"))
    // update id 0 (stays en), id 2 MIGRATES en -> de, insert id 9000 (de)
    val src = Seq(
      (0L, "en", -1L), (2L, "de", -2L), (9000L, "de", -3L))
      .toDF("id", "lang", "w")
    val v2 = TableLog.merge(spark, path, src, "id")
    assert(v2 === 2L)
    val got = TableLog.read(spark, path)
    assert(got.count() === 1201L)
    assert(rows(got.where(col("w") < 0L).select("id", "lang", "w")) ===
      rows(src))
    // partition reads serve the migrated row from its NEW partition
    assert(TableLog.readPartition(spark, path, Map("lang" -> "de"))
      .where(col("id") === 2L).count() === 1L)
    assert(TableLog.readPartition(spark, path, Map("lang" -> "en"))
      .where(col("id") === 2L).count() === 0L)
    // every file still lives under a partition dir with a record
    val m2files = TableLog.files(spark, path, Some(2L))
    assert(m2files.forall(f => f.startsWith("lang=en/") || f.startsWith("lang=de/")))
    assert(rows(got.where(col("w") >= 0L).select("id", "lang", "w")) ===
      rows(data.where(col("id") =!= 0L && col("id") =!= 2L)
        .select("id", "lang", "w")))
    // merge on a partition column as key is refused
    intercept[IllegalArgumentException] {
      TableLog.merge(spark, path, src, "lang")
    }
  }

  test("optimizePartition: one partition reclusters, the rest carries over by name") {
    val path = freshPath("graft-spec-tlog-optpart")
    val data = (0L until 3000L).map(i =>
      (i, Seq("en", "de", "zh")((i % 3L).toInt), i % 500L))
      .toDF("id", "lang", "w")
    TableLog.createPartitioned(spark, path, data.repartition(6), Seq("lang"))
    val before = TableLog.files(spark, path)
    val v2 = TableLog.optimizePartition(
      spark, path, Map("lang" -> "en"), "w", numFiles = 4)
    assert(v2 === 2L)
    val after = TableLog.files(spark, path)
    // every non-en file carried over by name; en files all rewritten
    assert(before.filterNot(_.startsWith("lang=en/")).toSet ===
      after.filterNot(_.startsWith("lang=en/")).toSet)
    assert(before.filter(_.startsWith("lang=en/")).toSet
      .intersect(after.filter(_.startsWith("lang=en/")).toSet).isEmpty)
    assert(after.count(_.startsWith("lang=en/")) === 4)
    // content identical, both versions readable, partition reads fine
    assert(rows(TableLog.read(spark, path).select("id", "lang", "w")) ===
      rows(data.select("id", "lang", "w")))
    assert(TableLog.read(spark, path, Some(1L)).count() === 3000L)
    // the recluster makes w-bands prunable WITHIN the partition:
    // composition keeps only a slice of the 4 en files
    val keptEn = TableLog.readPartitionBand(
      spark, path, Map("lang" -> "en"), "w", 0L, 99L).inputFiles
    assert(keptEn.length <= 2,
      s"clustered en band kept ${keptEn.length} of 4 files")
    assert(rows(TableLog.readPartitionBand(
      spark, path, Map("lang" -> "en"), "w", 0L, 99L)
      .select("id", "w", "lang")) ===
      rows(TableLog.read(spark, path)
        .where(col("lang") === "en" && col("w").between(0L, 99L))
        .select("id", "w", "lang")))
    // unknown partition VALUE matches nothing: pure carry-over commit
    val v3 = TableLog.optimizePartition(
      spark, path, Map("lang" -> "xx"), "w", 2)
    assert(TableLog.files(spark, path, Some(v3)).toSet === after.toSet)
    // pinning a NON-partition column is refused
    intercept[IllegalArgumentException] {
      TableLog.optimizePartition(spark, path, Map("bogus" -> "x"), "w", 2)
    }
  }

  test("commit timestamps: readAsOf resolves by binary search over monotone times") {
    val path = freshPath("graft-spec-tlog-asof")
    TableLog.create(spark, path, Seq((1L, 1L)).toDF("id", "w"))
    val t1 = TableLog.commitTimestamp(spark, path, 1L).get
    Thread.sleep(15L)
    TableLog.append(spark, path, Seq((2L, 2L)).toDF("id", "w"))
    val t2 = TableLog.commitTimestamp(spark, path, 2L).get
    Thread.sleep(15L)
    TableLog.append(spark, path, Seq((3L, 3L)).toDF("id", "w"))
    val t3 = TableLog.commitTimestamp(spark, path, 3L).get
    assert(t1 <= t2 && t2 <= t3, "commit times must be monotone")
    assert(TableLog.readAsOf(spark, path, t1).count() === 1L)
    assert(TableLog.readAsOf(spark, path, t2).count() === 2L)
    assert(TableLog.readAsOf(spark, path, (t2 + t3) / 2).count() === 2L)
    assert(TableLog.readAsOf(spark, path, t3 + 1000L).count() === 3L)
    intercept[IllegalArgumentException] {
      TableLog.readAsOf(spark, path, t1 - 1000L)
    }
  }

  test("merge: upsert replaces matched rows, inserts the rest, rewrites only touched files") {
    val path = freshPath("graft-spec-tlog-merge")
    val data = (0L until 4000L).map(i => (i, i * 2, s"p$i")).toDF("id", "w", "p")
    TableLog.create(spark, path, data.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)   // v2: clustered
    val before = TableLog.read(spark, path).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    // source: update ids 100..149 (new w), insert 50 fresh ids
    val source = ((100L until 150L).map(i => (i, -1L, s"u$i")) ++
      (90000L until 90050L).map(i => (i, i, s"n$i"))).toDF("id", "w", "p")
    val v3 = TableLog.merge(spark, path, source.repartition(2), "id")
    assert(v3 === 3L)
    val got = TableLog.read(spark, path)
    assert(got.count() === 4050L)
    assert(rows(got.where($"id".between(100L, 149L))) ===
      rows(source.where($"id" < 90000L)), "matched rows replaced")
    assert(got.where($"w" === -1L).count() === 50L)
    assert(rows(got.where($"id" >= 90000L)) ===
      rows(source.where($"id" >= 90000L)), "unmatched rows inserted")
    assert(rows(got.where($"id" < 100L)) === rows(data.where($"id" < 100L)),
      "untouched rows intact")
    // clustered files outside the source key range carried over by name
    val after = TableLog.read(spark, path).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    assert((before intersect after).size >= 6,
      s"expected >= 6 carried files, got ${(before intersect after).size}")
    // old version intact (time travel)
    assert(TableLog.read(spark, path, Some(2L)).count() === 4000L)
    // duplicate / null source keys are the ambiguous merge: refused
    intercept[IllegalArgumentException] {
      TableLog.merge(spark, path,
        Seq((1L, 0L, "a"), (1L, 1L, "b")).toDF("id", "w", "p"), "id")
    }
    intercept[IllegalArgumentException] {
      TableLog.merge(spark, path,
        Seq((Option.empty[Long], 0L, "a")).toDF("id", "w", "p"), "id")
    }
    // merge with schema evolution: source adds a column
    val src2 = Seq((0L, 999L, "z0", "tagged")).toDF("id", "w", "p", "tag")
    TableLog.merge(spark, path, src2, "id")
    val l = TableLog.read(spark, path)
    assert(l.where($"tag" === "tagged").count() === 1L)
    assert(l.where($"id" === 0L && $"w" === 999L).count() === 1L)
    assert(l.where($"tag".isNull).count() === 4049L)
  }

  test("diff across a restore: change hidden in the dropped column is reported") {
    val path = freshPath("graft-spec-tlog-diffrestore")
    val v1 = (0L until 10L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, v1.coalesce(1))                      // v1 (id,w)
    TableLog.append(spark, path,
      Seq((100L, 100L, "x")).toDF("id", "w", "b").coalesce(1))        // v2 (+b)
    TableLog.restore(spark, path, 1L)                                 // v3 (id,w)
    TableLog.append(spark, path,
      Seq((100L, 100L)).toDF("id", "w").coalesce(1))                  // v4
    // v2 holds (100,100,b=x); v4 holds (100,100,b absent). Projected
    // down to v4's narrower schema they'd cancel in exceptAll and the
    // change would vanish; the union-schema read keeps them apart.
    val d = TableLog.diff(spark, path, 2L, 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)),
        r.getString(3))).toSet
    assert(d === Set(
      (100L, 100L, Some("x"), "removed"),
      (100L, 100L, None, "added")),
      s"got $d")
    // diff of identical versions still empty under the union read
    assert(TableLog.diff(spark, path, 2L, 2L).count() === 0L)
  }
}
