package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[TableLog]]: atomic versions (create/append/delete/compact),
  * time travel, zero-IO carry-over of untouched files on delete,
  * vacuum retention, crash-orphan invisibility, and the
  * empty-manifest refusal.
  */
class TableLogSpec extends GraftSparkSpec {

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

  test("create / append / delete / compact as versions, all time-travelable") {
    val path = freshPath("graft-spec-tlog")
    val b1 = (0L until 1000L).map(i => (i, i % 7)).toDF("id", "g")
    val b2 = (1000L until 1500L).map(i => (i, i % 7)).toDF("id", "g")

    assert(TableLog.create(spark, path, b1.repartition(4)) === 1L)
    assert(rows(TableLog.read(spark, path)) === rows(b1))

    assert(TableLog.append(spark, path, b2.repartition(2)) === 2L)
    assert(rows(TableLog.read(spark, path)) === rows(b1.union(b2)))
    assert(rows(TableLog.read(spark, path, Some(1L))) === rows(b1), "v1 intact")

    assert(TableLog.deleteWhere(spark, path, col("id") >= 1200L) === 3L)
    assert(rows(TableLog.read(spark, path)) ===
      rows(b1.union(b2).filter($"id" < 1200L)))
    assert(rows(TableLog.read(spark, path, Some(2L))) === rows(b1.union(b2)),
      "v2 intact after delete")

    assert(TableLog.compact(spark, path, targetRowsPerFile = 600L) === 4L)
    assert(rows(TableLog.read(spark, path)) ===
      rows(b1.union(b2).filter($"id" < 1200L)))
    assert(TableLog.read(spark, path).inputFiles.length <
      TableLog.read(spark, path, Some(3L)).inputFiles.length)

    assert(TableLog.versions(spark, path) === Seq(1L, 2L, 3L, 4L))
  }

  test("delete carries untouched files over by name — zero rewrite IO") {
    val path = freshPath("graft-spec-tlog-del")
    val data = (0L until 2000L).map(i => (i, s"p$i")).toDF("id", "p")
    // range-clustered create: matches land in one file
    TableLog.create(spark, path,
      data.repartitionByRange(4, $"id").sortWithinPartitions("id"))
    val v1Files = TableLog.read(spark, path, Some(1L)).inputFiles.map(
      f => new org.apache.hadoop.fs.Path(f).getName).toSet
    TableLog.deleteWhere(spark, path, col("id") < 300L)
    val v2Files = TableLog.read(spark, path, Some(2L)).inputFiles.map(
      f => new org.apache.hadoop.fs.Path(f).getName).toSet
    // 3 of the 4 original files carried over untouched
    assert((v1Files intersect v2Files).size === 3,
      s"expected 3 carried files, got ${(v1Files intersect v2Files).size}")
    assert(TableLog.read(spark, path).count() === 1700L)
  }

  test("vacuum drops unreferenced files and expired manifests; orphans invisible") {
    val path = freshPath("graft-spec-tlog-vac")
    val data = (0L until 500L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data.repartition(4))
    TableLog.compact(spark, path, 500L) // v2: one file
    TableLog.deleteWhere(spark, path, col("id") < 100L) // v3

    // a crashed commit's debris: orphan data file + scratch dir
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(s"$path/data/orphan.parquet")
    data.limit(10).coalesce(1).write.mode("overwrite")
      .parquet(s"$path/_scratch_crashed")
    fs.create(orphan, true).close()
    assert(TableLog.read(spark, path).count() === 400L,
      "orphans must be invisible to reads")

    // retention 0: this spec pins the SWEEP itself (the debris is
    // seconds old); the age horizon protecting live appenders has its
    // own race specs
    spark.conf.set("spark.graft.tablelog.retentionMs", "0")
    try TableLog.vacuum(spark, path, keepVersions = 2)
    finally spark.conf.unset("spark.graft.tablelog.retentionMs")
    assert(TableLog.versions(spark, path) === Seq(2L, 3L))
    assert(!fs.exists(orphan), "vacuum must drop orphans")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_scratch_crashed")))
    assert(TableLog.read(spark, path, Some(2L)).count() === 500L)
    assert(TableLog.read(spark, path).count() === 400L)
    intercept[IllegalArgumentException] {
      TableLog.read(spark, path, Some(1L))
    }
  }

  test("tagged append is idempotent; history reports per-version rows") {
    val path = freshPath("graft-spec-tlog-tag")
    val seed = (0L until 100L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, seed)
    val batch = (100L until 150L).map(i => (i, i)).toDF("id", "w")
    val v2 = TableLog.appendBatch(spark, path, batch, "batch-7")
    assert(v2 === 2L)
    // the replayed batch: same tag -> same version, nothing written
    val replay = TableLog.appendBatch(spark, path,
      batch.withColumn("w", $"w" * 2), "batch-7")
    assert(replay === 2L)
    assert(TableLog.versions(spark, path) === Seq(1L, 2L))
    assert(TableLog.read(spark, path).count() === 150L)
    assert(TableLog.tags(spark, path) === Map("batch-7" -> 2L))
    // untagged v1 is invisible to the tag map; history sees both
    assert(TableLog.history(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted ===
      Seq((1L, 100L), (2L, 150L)))
  }

  test("refusals: existing table on create, empty manifest on delete-all") {
    val path = freshPath("graft-spec-tlog-ref")
    val data = (0L until 50L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data)
    intercept[IllegalArgumentException] {
      TableLog.create(spark, path, data)
    }
    intercept[IllegalArgumentException] {
      TableLog.deleteWhere(spark, path, col("id") >= 0L)
    }
    assert(TableLog.read(spark, path).count() === 50L, "refused delete must not mutate")
  }

  test("deleteWhere keeps NULL-predicate rows; accounting verifies") {
    val path = freshPath("graft-spec-tlog-null")
    val data = (0L until 100L)
      .map(i => (i, if (i % 10 == 0) None else Some(i * 2)))
      .toDF("id", "w")
    TableLog.create(spark, path, data.repartition(2))
    TableLog.deleteWhere(spark, path, col("w") < 40L)
    val kept = TableLog.read(spark, path)
    // matched: w=2i<40, non-null → ids 1..19 except 10 → 18 rows
    assert(kept.count() === 82L)
    assert(kept.where(col("w").isNull).count() === 10L,
      "all NULL-predicate rows must survive the delete")
    // pre-delete version still whole (time travel unaffected)
    assert(TableLog.read(spark, path, Some(1L)).count() === 100L)
  }

  test("tags with square brackets are refused (manifest parse safety)") {
    val path = freshPath("graft-spec-tlog-brkt")
    val data = (0L until 10L).map(i => (i, i)).toDF("id", "g")
    TableLog.create(spark, path, data)
    intercept[IllegalArgumentException] {
      TableLog.appendBatch(spark, path, data, "batch[7]")
    }
    // table unharmed, a clean tag still works
    assert(TableLog.appendBatch(spark, path, data, "batch-7") === 2L)
    assert(TableLog.tags(spark, path) === Map("batch-7" -> 2L))
  }

  test("optimizeRange commits a recluster as a version; manifest bounds prune") {
    val path = freshPath("graft-spec-tlog-opt")
    // hash-partitioned create: every file spans ~the full id range,
    // so a band overlaps ALL files' bounds
    val data = (0L until 4000L).map(i => (i, s"p$i")).toDF("id", "p")
    TableLog.create(spark, path, data.repartition(8))
    val allFiles = TableLog.read(spark, path, Some(1L)).inputFiles.length
    assert(TableLog.bandFiles(spark, path, "id", 100L, 150L).size === allFiles,
      "unclustered: bounds cannot prune")

    val v2 = TableLog.optimizeRange(spark, path, "id", numFiles = 8)
    assert(v2 === 2L)
    // content identical across the recluster, old version intact
    assert(rows(TableLog.read(spark, path, Some(2L))) === rows(data))
    assert(rows(TableLog.read(spark, path, Some(1L))) === rows(data))
    // clustered: a narrow band keeps 1-2 of 8 files, decided from the
    // manifest alone
    val kept = TableLog.bandFiles(spark, path, "id", 100L, 150L)
    assert(kept.size <= 2, s"manifest pruning kept ${kept.size} of 8 files")
    // band read ≡ full read + filter
    assert(rows(TableLog.readBand(spark, path, "id", 100L, 150L)) ===
      rows(TableLog.read(spark, path).where($"id".between(100L, 150L))))
    // string bounds prune too (p100..p150 lexicographic)
    val keptS = TableLog.bandFiles(spark, path, "p", "p100", "p101")
    assert(keptS.size < allFiles)
  }

  test("optimizeZOrder: bands on EITHER dimension prune from the manifest") {
    val path = freshPath("graft-spec-tlog-zopt")
    val n = 4096L
    // two independent dimensions (row-major grid)
    val data = (0L until n).map(i => (i % 64L, i / 64L, i)).toDF("x", "y", "v")
    TableLog.create(spark, path, data.repartition(8))
    TableLog.optimizeZOrder(spark, path, Seq("x", "y"), numFiles = 16, bits = 6)
    val total = TableLog.read(spark, path).inputFiles.length
    val keptX = TableLog.bandFiles(spark, path, "x", 0L, 7L)
    val keptY = TableLog.bandFiles(spark, path, "y", 0L, 7L)
    assert(keptX.size < total, s"x band kept ${keptX.size} of $total")
    assert(keptY.size < total, s"y band kept ${keptY.size} of $total")
    assert(rows(TableLog.readBand(spark, path, "x", 0L, 7L)) ===
      rows(TableLog.read(spark, path).where($"x".between(0L, 7L))))
  }

  test("readBand decodes fewer rows than an unclustered full scan") {
    val path = freshPath("graft-spec-tlog-band")
    val data = (0L until 20000L).map(i => (i, i * 3)).toDF("id", "w")
    TableLog.create(spark, path, data.repartition(8))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)
    def decoded(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
      df.collect()
      scans(df.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
    }
    val band = TableLog.readBand(spark, path, "id", 1000L, 1999L)
    val d = decoded(band)
    assert(d <= 20000L / 4, s"manifest-pruned band decoded $d of 20000")
  }

  test("concurrent mutators are excluded by the table lock") {
    val path = freshPath("graft-spec-tlog-lock")
    val data = (0L until 100L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data)
    // a live mutator holds the table lock; every mutation fails fast
    IndexOps.withMutationLock(spark, path, "TableLog.test-holder") {
      intercept[IndexOps.ConcurrentMutationException] {
        TableLog.append(spark, path, data)
      }
      intercept[IndexOps.ConcurrentMutationException] {
        TableLog.deleteWhere(spark, path, col("id") < 10L)
      }
      intercept[IndexOps.ConcurrentMutationException] {
        TableLog.vacuum(spark, path)
      }
    }
    // lock released: mutations work again, nothing corrupted
    assert(TableLog.append(spark, path, data) === 2L)
    assert(TableLog.read(spark, path).count() === 200L)
  }

  test("crashed vacuum: watermark guard beats mid-job FileNotFound") {
    val path = freshPath("graft-spec-tlog-wm")
    val data = (0L until 300L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data)          // v1
    TableLog.compact(spark, path, 300L)         // v2
    TableLog.append(spark, path, data)          // v3
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: vacuum published its watermark and
    // deleted v1's files, but v1's manifest survived
    val m1 = new org.apache.hadoop.fs.Path(s"$path/_log/v0000001.json")
    val saved = new org.apache.hadoop.fs.Path(s"$path/_log/saved.bak")
    fsys.rename(m1, saved)
    TableLog.vacuum(spark, path, keepVersions = 2)
    fsys.rename(saved, m1)
    assert(TableLog.versions(spark, path).contains(1L), "crash state: manifest back")
    val e = intercept[IllegalArgumentException] {
      TableLog.read(spark, path, Some(1L))
    }
    assert(e.getMessage.contains("vacuumed"),
      s"want a fail-fast 'vacuumed' error, got: ${e.getMessage}")
    // retained versions unaffected
    assert(TableLog.read(spark, path, Some(2L)).count() === 300L)
    assert(TableLog.read(spark, path).count() === 600L)
  }

  test("autoOptimize applies the advisor's plan as a committed version") {
    val path = freshPath("graft-spec-tlog-auto")
    // two clusterable high-cardinality columns -> zorder(doc-ish, w);
    // g (3 distinct, no nulls) is the partition candidate the
    // clustering must NOT pick
    val data = (0L until 2000L).map(i => (i, i * 7 % 2000L, i % 3))
      .toDF("id", "w", "g")
    TableLog.create(spark, path, data.repartition(8))
    val (v, mode, cols) = TableLog.autoOptimize(
      spark, path, clusterable = Seq("id", "w"), numFiles = 8)
    assert(v === 2L)
    assert(mode === "zorder" && cols.toSet === Set("id", "w"))
    assert(rows(TableLog.read(spark, path, Some(2L))) === rows(data))
    // the rewrite serves manifest-pruned bands on BOTH columns
    val total = TableLog.read(spark, path).inputFiles.length
    assert(TableLog.bandFiles(spark, path, "id", 0L, 100L).size < total)
    assert(TableLog.bandFiles(spark, path, "w", 0L, 100L).size < total)
    // single clusterable -> range mode
    val p2 = freshPath("graft-spec-tlog-auto2")
    TableLog.create(spark, p2, data.repartition(8))
    val (_, mode2, cols2) = TableLog.autoOptimize(
      spark, p2, clusterable = Seq("id"), numFiles = 8)
    assert(mode2 === "range" && cols2 === Seq("id"))
  }

  test("tags survive vacuum via the checkpoint — replayed ancient batches stay skipped") {
    val path = freshPath("graft-spec-tlog-tagvac")
    val data = (0L until 50L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data)                       // v1
    TableLog.appendBatch(spark, path, data, "b1")            // v2
    TableLog.appendBatch(spark, path, data, "b2")            // v3
    TableLog.appendBatch(spark, path, data, "b3")            // v4
    TableLog.vacuum(spark, path, keepVersions = 2)           // drops v1, v2
    assert(TableLog.versions(spark, path) === Seq(3L, 4L))
    // b1's manifest is gone, but the vacuum-time checkpoint remembers
    // it: the replay is recognized, nothing is appended
    assert(TableLog.tags(spark, path).keySet === Set("b1", "b2", "b3"))
    assert(TableLog.appendBatch(spark, path, data, "b1") === 2L)
    assert(TableLog.versions(spark, path) === Seq(3L, 4L),
      "replayed vacuumed batch must not create a version")
    assert(TableLog.read(spark, path).count() === 200L)
  }

  test("optimizeRangeWhere reclusters only the overlapping files") {
    val path = freshPath("graft-spec-tlog-optw")
    val head = (0L until 3000L).map(i => (i, s"p$i")).toDF("id", "p")
    val tail = (3000L until 4000L).map(i => (i, s"p$i")).toDF("id", "p")
    TableLog.create(spark, path, head.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 4)   // v2: clustered
    TableLog.append(spark, path, tail.repartition(2))          // v3: messy tail
    val v3Files = TableLog.read(spark, path, Some(3L)).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    TableLog.optimizeRangeWhere(spark, path, "id", 3000L, Long.MaxValue, 2)
    val v4Files = TableLog.read(spark, path, Some(4L)).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    // the 4 clustered head files (bounds < 3000) carried over by name
    assert((v3Files intersect v4Files).size === 4,
      s"expected 4 carried files, got ${(v3Files intersect v4Files).size}")
    // content exactly preserved, both versions readable
    assert(rows(TableLog.read(spark, path, Some(4L))) === rows(head.union(tail)))
    assert(rows(TableLog.read(spark, path, Some(3L))) === rows(head.union(tail)))
    // the tail band is now manifest-prunable down to the new files
    val kept = TableLog.bandFiles(spark, path, "id", 3200L, 3400L)
    assert(kept.size <= 2, s"tail band kept ${kept.size} files")
    // band overlapping nothing rewritten -> pure carry-over commit
    val v5 = TableLog.optimizeRangeWhere(spark, path, "id", -100L, -1L, 2)
    assert(v5 === 5L)
    assert(TableLog.read(spark, path, Some(5L)).inputFiles.map(
      f => new org.apache.hadoop.fs.Path(f).getName).toSet === v4Files)
  }

  test("schema evolution: appended columns read back NULL for old rows; retype refused") {
    val path = freshPath("graft-spec-tlog-evo")
    val v1 = (0L until 100L).map(i => (i, i * 2)).toDF("id", "w")
    val v2 = (100L until 150L).map(i => (i, i * 2, s"s$i")).toDF("id", "w", "tag")
    TableLog.create(spark, path, v1.repartition(2))
    TableLog.append(spark, path, v2.repartition(2))
    val latest = TableLog.read(spark, path)
    assert(latest.columns.toSeq === Seq("id", "w", "tag"))
    assert(latest.count() === 150L)
    assert(latest.where(col("tag").isNull).count() === 100L,
      "pre-evolution rows read NULL in the added column")
    assert(latest.where(col("tag") === "s120").count() === 1L)
    // the pre-evolution version keeps ITS schema
    assert(TableLog.read(spark, path, Some(1L)).columns.toSeq === Seq("id", "w"))
    // a batch MISSING an old column appends too (reads back NULL)
    TableLog.append(spark, path,
      (150L until 160L).map(i => Tuple1(i)).toDF("id"))
    val l3 = TableLog.read(spark, path)
    assert(l3.where(col("id") >= 150L && col("w").isNull).count() === 10L)
    // retype is refused loudly
    intercept[IllegalArgumentException] {
      TableLog.append(spark, path,
        Seq(("200", 1L)).toDF("id", "w"))
    }
    // rewrites carry the evolved schema
    TableLog.compact(spark, path, targetRowsPerFile = 1000L)
    assert(TableLog.read(spark, path).columns.toSeq === Seq("id", "w", "tag"))
    assert(TableLog.read(spark, path).count() === 160L)
  }

  test("deleteBand: discovery scans only manifest-overlapping files, result equals deleteWhere") {
    val pathA = freshPath("graft-spec-tlog-db-a")
    val pathB = freshPath("graft-spec-tlog-db-b")
    val data = (0L until 4000L).map(i => (i, s"p$i")).toDF("id", "p")
    for (p <- Seq(pathA, pathB)) {
      TableLog.create(spark, p, data.repartition(4))
      TableLog.optimizeRange(spark, p, "id", numFiles = 8)
    }
    val before = TableLog.read(spark, pathA, Some(2L)).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    TableLog.deleteBand(spark, pathA, "id", 1000L, 1499L)
    TableLog.deleteWhere(spark, pathB, col("id").between(1000L, 1499L))
    assert(rows(TableLog.read(spark, pathA)) === rows(TableLog.read(spark, pathB)),
      "band delete must equal the generic delete")
    assert(TableLog.read(spark, pathA).count() === 3500L)
    // clustered files outside the band carried over by name (the
    // 500-wide band straddles 2-3 of the 8 range files — boundaries
    // come from RangePartitioner's sampling, which is not seed-stable)
    val after = TableLog.read(spark, pathA).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    assert((before intersect after).size >= 5,
      s"expected >= 5 carried files, got ${(before intersect after).size}")
    // no-overlap band: pure carry-over commit, nothing rewritten
    val v = TableLog.deleteBand(spark, pathA, "id", 100000L, 200000L)
    assert(TableLog.read(spark, pathA, Some(v)).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet === after)
  }

  test("restore re-commits an old version's exact state, zero data IO") {
    val path = freshPath("graft-spec-tlog-restore")
    val data = (0L until 1000L).map(i => (i, i * 3)).toDF("id", "w")
    TableLog.create(spark, path, data.repartition(4))
    TableLog.deleteWhere(spark, path, col("id") < 900L)       // v2: oops
    assert(TableLog.read(spark, path).count() === 100L)
    val v3 = TableLog.restore(spark, path, 1L)
    assert(v3 === 3L)
    assert(rows(TableLog.read(spark, path)) === rows(data), "state restored")
    // zero-copy: the restored manifest lists exactly v1's files
    assert(TableLog.files(spark, path, Some(3L)).toSet ===
      TableLog.files(spark, path, Some(1L)).toSet)
    // the bad version stays readable for forensics
    assert(TableLog.read(spark, path, Some(2L)).count() === 100L)
    // restoring a vacuumed version fails fast
    TableLog.append(spark, path, data)                        // v4
    TableLog.vacuum(spark, path, keepVersions = 2)
    val e = intercept[IllegalArgumentException] {
      TableLog.restore(spark, path, 2L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("diff reads only the changed files; added/removed exact") {
    val path = freshPath("graft-spec-tlog-diff")
    val data = (0L until 4000L).map(i => (i, i * 2)).toDF("id", "w")
    TableLog.create(spark, path, data.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)   // v2
    TableLog.deleteBand(spark, path, "id", 0L, 499L)          // v3
    TableLog.append(spark, path,
      (10000L until 10100L).map(i => (i, i)).toDF("id", "w")) // v4
    val d = TableLog.diff(spark, path, 2L, 4L)
    val got = d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected =
      (0L until 500L).map(i => (i, i * 2, "removed")).toSet ++
        (10000L until 10100L).map(i => (i, i, "added")).toSet
    assert(got === expected)
    // shared clustered files cancel without being read: the diff's
    // scan set excludes every file common to both manifests
    val shared = TableLog.files(spark, path, Some(2L)).toSet intersect
      TableLog.files(spark, path, Some(4L)).toSet
    assert(shared.nonEmpty, "fixture must have carried files")
    val scanned = d.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    assert((scanned intersect shared).isEmpty,
      s"diff scanned shared files: ${scanned intersect shared}")
    // identical versions diff empty
    assert(TableLog.diff(spark, path, 4L, 4L).count() === 0L)
  }

  test("pre-stats manifests (old formats) still read; stats recorded on new commits") {
    val path = freshPath("graft-spec-tlog-compat")
    val data = (0L until 100L).map(i => (i, s"s$i")).toDF("id", "s")
    TableLog.create(spark, path, data.repartition(2))
    val stats = TableLog.fileStats(spark, path, 1L)
    assert(stats.nonEmpty && stats.values.forall(_.contains("id")),
      "new commits must carry footer bounds for id")
    assert(stats.values.forall(_.contains("s")), "string bounds too")
    // rewrite v1's manifest in the round-11 format ({"tag","files"})
    // and the round-10 format (bare array): both must read and both
    // must be un-prunable (no bounds -> keep all)
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = TableLog.read(spark, path, Some(1L)).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getName).sorted
    for (body <- Seq(
        names.map(n => "\"" + n + "\"").mkString("[", ",", "]"),
        s"""{"tag":"t0","files":${names.map(n => "\"" + n + "\"").mkString("[", ",", "]")}}""")) {
      val mp = new org.apache.hadoop.fs.Path(s"$path/_log/v0000001.json")
      val out = fsys.create(mp, true)
      out.write(body.getBytes("UTF-8")); out.close()
      assert(TableLog.read(spark, path, Some(1L)).count() === 100L)
      assert(TableLog.bandFiles(spark, path, "id", 0L, 0L, Some(1L)).size ===
        names.length, "no bounds -> conservative keep-all")
    }
  }

  test("mergeWhen: conditional update/delete/insert, first action wins, bounded rewrite") {
    val path = freshPath("graft-spec-tlog-mwhen")
    val base = (0L until 1000L).map(i => (i, i % 7, s"v$i")).toDF("id", "g", "s")
    TableLog.create(spark, path, base.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)

    // flag 1 -> bump g; flag 2 -> delete; flag 3 -> fallthrough update s
    val src = (100L until 120L).map(i => (i, i % 7 + 50L, i % 3 + 1))
      .union((2000L until 2010L).map(i => (i, 1L, (i % 2) * 2 + 1))) // flags 1/3
      .toDF("id", "g", "flag")
    TableLog.mergeWhen(spark, path, src, "id",
      matched = Seq(
        TableLog.MergeWhen.Update(Some(col("_s_flag") === 1L),
          Seq("g" -> (col("_s_g") + 1000L))),
        TableLog.MergeWhen.Delete(Some(col("_s_flag") === 2L)),
        TableLog.MergeWhen.Update(None, Seq("s" -> lit("rest")))),
      notMatched = Seq(
        TableLog.MergeWhen.Insert(Some(col("_s_flag") === 1L),
          Seq("id" -> col("_s_id"), "g" -> col("_s_g"),
            "s" -> lit("ins")))))

    // expected, computed independently
    val srcRows = src.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = (0L until 1000L).flatMap { i =>
      srcRows.get(i) match {
        case Some((sg, 1L)) => Seq(Seq[Any](i, sg + 1000L, s"v$i"))
        case Some((_, 2L)) => Nil
        case Some((_, _)) => Seq(Seq[Any](i, i % 7, "rest"))
        case None => Seq(Seq[Any](i, i % 7, s"v$i"))
      }
    } ++ (2000L until 2010L).flatMap { i =>
      val (sg, fl) = srcRows(i)
      if (fl == 1L) Seq(Seq[Any](i, sg, "ins")) else Nil
    }
    assert(rows(TableLog.read(spark, path)) === expect.toSet)
    assert(rows(TableLog.read(spark, path, Some(2L))) === rows(base),
      "pre-merge version intact")

    // only files overlapping the matched key band rewrite
    val before = TableLog.files(spark, path, Some(2L)).toSet
    val after = TableLog.files(spark, path, Some(3L)).toSet
    assert((before & after).size >= 6,
      "files outside the source key's matched region carry over by name")
  }

  test("concurrent locked mutators serialize behind the lock wait — both deletes land") {
    val path = freshPath("graft-spec-tlock-wait")
    val base = (0L until 1000L).map(i => (i, i % 7)).toDF("id", "g")
    TableLog.create(spark, path, base.repartition(4))

    // hold mutator A open inside its commit (one-shot seam runs under
    // the lock, before the CAS) while mutator B contends
    val held = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    TableLog.testPreCommit.put(path, () => {
      held.countDown()
      release.await(20, java.util.concurrent.TimeUnit.SECONDS)
      ()
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val a = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long =
          TableLog.deleteWhere(spark, path, col("id") < 100L)
      })
      assert(held.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "mutator A must reach its commit")
      val b = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long =
          TableLog.deleteWhere(spark, path, col("id") >= 900L)
      })
      Thread.sleep(400)
      assert(!b.isDone, "second mutator must WAIT on the lock, not fail fast")
      release.countDown()
      val va = a.get(60, java.util.concurrent.TimeUnit.SECONDS)
      val vb = b.get(60, java.util.concurrent.TimeUnit.SECONDS)
      assert(Set(va, vb) === Set(2L, 3L), "both mutations committed, serialized")
      assert(rows(TableLog.read(spark, path)) ===
        rows(base.where(col("id") >= 100L && col("id") < 900L)),
        "final state carries BOTH deletes")
    } finally {
      release.countDown()
      pool.shutdownNow()
      ()
    }
  }
  test("vacuum racing a lock-free append cannot destroy its staged files") {
    val path = freshPath("graft-spec-tlog-vacrace")
    val base = (0L until 400L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, base.repartition(2))          // v1
    TableLog.append(spark, path, base)                         // v2
    // interleaving under test: the appender has finished staging
    // (files renamed into data/, referenced by NO manifest yet) and a
    // vacuum sweeps in the window before its CAS — the default age
    // horizon must keep the fresh staged files
    TableLog.testPreCommit.put(path, () =>
      TableLog.vacuum(spark, path, keepVersions = 1))
    val more = (10000L until 10400L).map(i => (i, i)).toDF("id", "w")
    val v = TableLog.appendOptimistic(spark, path, more)
    assert(v === 3L)
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    TableLog.files(spark, path, Some(v)).foreach { n =>
      assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$path/data/$n")),
        s"committed manifest references a vacuumed file: $n")
    }
    assert(TableLog.read(spark, path).count() === 1200L,
      "the append landed complete after the racing vacuum")
  }

  test("vacuum racing the exactly-once streaming append (appendBatchOptimistic)") {
    val path = freshPath("graft-spec-tlog-vacrace2")
    val base = (0L until 300L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, base.repartition(2))          // v1
    TableLog.append(spark, path, base)                         // v2
    TableLog.testPreCommit.put(path, () =>
      TableLog.vacuum(spark, path, keepVersions = 1))
    val batch = (5000L until 5300L).map(i => (i, i)).toDF("id", "w")
    val v = TableLog.appendBatchOptimistic(spark, path, batch, "epoch-7")
    assert(v === 3L)
    assert(TableLog.read(spark, path).count() === 900L)
    // the replayed epoch is still recognized post-vacuum
    assert(TableLog.appendBatchOptimistic(spark, path, batch, "epoch-7") === 3L)
    assert(TableLog.read(spark, path).count() === 900L, "exactly once")
  }

  test("vacuum age horizon: aged debris swept, fresh debris kept") {
    val path = freshPath("graft-spec-tlog-vage")
    val data = (0L until 200L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data)
    TableLog.append(spark, path, data)
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldOrphan = new org.apache.hadoop.fs.Path(s"$path/data/orphan_old.parquet")
    val freshOrphan = new org.apache.hadoop.fs.Path(s"$path/data/orphan_fresh.parquet")
    fsys.create(oldOrphan, true).close()
    fsys.create(freshOrphan, true).close()
    val oldScratch = new org.apache.hadoop.fs.Path(s"$path/_scratch_old")
    val freshScratch = new org.apache.hadoop.fs.Path(s"$path/_scratch_fresh")
    fsys.mkdirs(oldScratch)
    fsys.mkdirs(freshScratch)
    val hourAgo = System.currentTimeMillis() - 3600L * 1000L
    fsys.setTimes(oldOrphan, hourAgo, hourAgo)
    fsys.setTimes(oldScratch, hourAgo, hourAgo)

    TableLog.vacuum(spark, path, keepVersions = 2) // default 10-min retention
    assert(!fsys.exists(oldOrphan), "aged orphan must be swept")
    assert(!fsys.exists(oldScratch), "aged scratch dir must be swept")
    assert(fsys.exists(freshOrphan),
      "fresh unreferenced file may belong to an in-flight appender — kept")
    assert(fsys.exists(freshScratch), "fresh scratch dir kept")

    spark.conf.set("spark.graft.tablelog.retentionMs", "0")
    try TableLog.vacuum(spark, path, keepVersions = 2)
    finally spark.conf.unset("spark.graft.tablelog.retentionMs")
    assert(!fsys.exists(freshOrphan), "retention 0 restores the full sweep")
    assert(!fsys.exists(freshScratch))
  }

  test("updateWhere evaluates a non-deterministic predicate exactly once per row") {
    val path = freshPath("graft-spec-tlog-nondet")
    val data = (0L until 300L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data.repartition(3))
    val acc = spark.sparkContext.longAccumulator("nondet-evals")
    val pred = udf { (id: Long) => acc.add(1L); id % 3L == 0L }
      .asNondeterministic()
    val v = TableLog.updateWhere(spark, path,
      Seq("w" -> (col("w") + 1000000L)), pred(col("id")))
    assert(v === 2L)
    assert(acc.value === 300L,
      s"predicate must be evaluated exactly once per row, got ${acc.value}")
    // the committed row set is exactly that single evaluation's choice
    val got = TableLog.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === (0L until 300L)
      .map(i => (i, if (i % 3 == 0) i + 1000000L else i)).toSet)
  }

  test("mergeWhen NOT MATCHED BY SOURCE: update + delete, first applicable wins") {
    val path = freshPath("graft-spec-tlog-nmbs")
    val base = (0L until 1000L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, base.repartition(4))
    // source: replacements for 300..699, inserts 1000..1049
    val src = (300L until 700L).map(i => (i, i + 7000L))
      .union((1000L until 1050L).map(i => (i, i)))
      .toDF("id", "w")
    TableLog.mergeWhen(spark, path, src, "id",
      matched = Seq(TableLog.MergeWhen.Update(None, Seq("w" -> col("_s_w")))),
      notMatched = Seq(TableLog.MergeWhen.Insert(None,
        Seq("id" -> col("_s_id"), "w" -> col("_s_w")))),
      notMatchedBySource = Seq(
        TableLog.MergeWhen.Update(Some(col("id") < 100L),
          Seq("w" -> lit(-1L))),
        TableLog.MergeWhen.Delete(Some(col("id") >= 90L))))
    // ids 90..99 satisfy BOTH by-source actions: the FIRST (update)
    // wins; 100..299 and 700..999 (unmatched, >= 90) delete
    val expect = (0L until 100L).map(i => (i, -1L)) ++
      (300L until 700L).map(i => (i, i + 7000L)) ++
      (1000L until 1050L).map(i => (i, i))
    assert(rows(TableLog.read(spark, path)) === rows(expect.toDF("id", "w")))
  }

  test("mergeWhen by-source band: scoped deletes, out-of-band files carry by name") {
    val path = freshPath("graft-spec-tlog-nmbsband")
    val base = (0L until 2000L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, base.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)   // v2
    val src = (100L until 150L).map(i => (i, i + 5L)).toDF("id", "w")
    TableLog.mergeWhen(spark, path, src, "id",
      matched = Seq(TableLog.MergeWhen.Update(None, Seq("w" -> col("_s_w")))),
      notMatched = Nil,
      notMatchedBySource = Seq(TableLog.MergeWhen.Delete(None)),
      notMatchedBySourceBand = Some(("id", 100L, 199L)))      // v3
    // by-source applies ONLY inside the band: 150..199 delete,
    // 100..149 update, everything else untouched
    val expect = (0L until 100L).map(i => (i, i)) ++
      (100L until 150L).map(i => (i, i + 5L)) ++
      (200L until 2000L).map(i => (i, i))
    assert(rows(TableLog.read(spark, path)) === rows(expect.toDF("id", "w")))
    // manifest pruning held: files outside the key/band region carry
    // over BY NAME (never rewritten, never read)
    val before = TableLog.files(spark, path, Some(2L)).toSet
    val after = TableLog.files(spark, path, Some(3L)).toSet
    assert((before & after).size >= 6,
      s"out-of-band files must carry over, carried ${(before & after).size}")
  }

  test("mergeWhen by-source with a non-deterministic condition: one evaluation") {
    val path = freshPath("graft-spec-tlog-nmbsnd")
    val base = (0L until 300L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, base.repartition(3))
    val src = (0L until 100L).map(i => (i, i + 1L)).toDF("id", "w")
    val acc = spark.sparkContext.longAccumulator("nmbs-evals")
    val cond = udf { (id: Long) => acc.add(1L); id % 2L == 0L }
      .asNondeterministic()
    TableLog.mergeWhen(spark, path, src, "id",
      matched = Seq(TableLog.MergeWhen.Update(None, Seq("w" -> col("_s_w")))),
      notMatched = Nil,
      notMatchedBySource = Seq(TableLog.MergeWhen.Delete(Some(cond(col("id"))))))
    // the condition runs once per UNMATCHED row (matched rows
    // short-circuit the !matched branch), in ONE materialized pass
    // deciding both the file cut and the rewrite
    assert(acc.value === 200L,
      s"by-source condition must evaluate once per unmatched row, got ${acc.value}")
    val expect = (0L until 100L).map(i => (i, i + 1L)) ++
      (100L until 300L).filter(_ % 2L != 0L).map(i => (i, i))
    assert(rows(TableLog.read(spark, path)) === rows(expect.toDF("id", "w")))
  }
  test("commit protocol seam: publication routes through it; a reported loss rebases") {
    val path = freshPath("graft-spec-tlog-proto")
    val data = (0L until 100L).map(i => (i, i)).toDF("id", "w")
    TableLogProtocolProbe.delegated.set(0L)
    spark.conf.set("spark.graft.tablelog.commitProtocol",
      classOf[TableLogProtocolProbe].getName)
    try {
      TableLog.create(spark, path, data)
      assert(TableLogProtocolProbe.delegated.get() >= 1L,
        "the version CAS must route through the configured protocol")
      // protocol reports a lost CAS once: the optimistic appender
      // re-reads the log, rebases, and retries through the seam
      TableLogProtocolProbe.loseOnce.set(true)
      val v = TableLog.appendOptimistic(spark, path, data)
      assert(v === 2L, "append lands after the reported loss")
      assert(!TableLogProtocolProbe.loseOnce.get(), "the loss was consumed")
      assert(TableLog.read(spark, path).count() === 200L)
      // a LOCKED mutator retries the whole mutation on a reported loss
      TableLogProtocolProbe.loseOnce.set(true)
      val v3 = TableLog.deleteWhere(spark, path, col("id") < 10L)
      assert(v3 === 3L)
      assert(TableLog.read(spark, path).count() === 180L)
    } finally spark.conf.unset("spark.graft.tablelog.commitProtocol")
  }

  test("ALTER-style addColumns: schema-only version, zero data IO, old rows NULL") {
    val path = freshPath("graft-spec-tlog-addcol")
    val data = (0L until 50L).map(i => (i, i)).toDF("id", "w")
    TableLog.create(spark, path, data)                         // v1
    val before = TableLog.files(spark, path, Some(1L))
    val v = TableLog.addColumns(spark, path, Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)))               // v2
    assert(v === 2L)
    assert(TableLog.files(spark, path, Some(2L)) === before,
      "ADD COLUMN is a pure manifest edit — zero data IO")
    val widened = TableLog.read(spark, path)
    assert(widened.columns.toSeq === Seq("id", "w", "note"))
    assert(widened.where(col("note").isNull).count() === 50L,
      "old rows read NULL in the added column")
    // an append may now carry the column; duplicates refuse
    TableLog.append(spark, path,
      Seq((100L, 1L, "x")).toDF("id", "w", "note"))
    assert(TableLog.read(spark, path).where(col("note").isNotNull).count() === 1L)
    intercept[IllegalArgumentException] {
      TableLog.addColumns(spark, path, Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.StringType)))
    }
  }
  test("materialized CDC change files equal the reconstructed diff chain") {
    val path = freshPath("graft-spec-tlog-cdc")
    spark.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
    try {
      val data = (0L until 1000L).map(i => (i, i)).toDF("id", "w")
      TableLog.create(spark, path, data.repartition(4))           // v1 append
      TableLog.optimizeRange(spark, path, "id", numFiles = 4)     // v2 empty
      TableLog.deleteBand(spark, path, "id", 0L, 99L)             // v3
      TableLog.append(spark, path,
        (2000L until 2100L).map(i => (i, i)).toDF("id", "w"))     // v4 append
      TableLog.updateWhere(spark, path,
        Seq("w" -> (col("w") + 5L)), col("id").between(500L, 599L)) // v5
      TableLog.merge(spark, path,
        (600L until 650L).map(i => (i, -i)).toDF("id", "w"), "id")  // v6
      TableLog.mergeWhen(spark, path,
        (650L until 700L).map(i => (i, i)).toDF("id", "w"), "id",
        matched = Seq(TableLog.MergeWhen.Delete(None)),
        notMatched = Nil)                                         // v7
      TableLog.compact(spark, path, 100000L)                      // v8 empty
      TableLog.restore(spark, path, 7L)                           // v9

      val mat = TableLog.changes(spark, path, 1L, 9L)
      val rec = (2L to 9L).map(v =>
        TableLog.diff(spark, path, v - 1, v)
          .withColumn("_commit_version", lit(v)))
        .reduce(_.unionByName(_, allowMissingColumns = true))
      assert(mat.exceptAll(rec).isEmpty && rec.exceptAll(mat).isEmpty,
        "materialized change feed must be multiset-equal to the diff chain")
      // every rewrite version served from its change files; only the
      // pure append (v4) reconstructs (and that path is exchange-free)
      assert(TableLog.ChangeIo.servedMaterialized(path) === 7L,
        s"served ${TableLog.ChangeIo.servedMaterialized(path)}")
    } finally spark.conf.unset("spark.graft.tablelog.writeChangeFiles")
  }

  test("materialized CDC: a replayed range reads change files only (counted IO)") {
    val path = freshPath("graft-spec-tlog-cdcio")
    spark.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
    try {
      TableLog.create(spark, path,
        (0L until 1000L).map(i => (i, i)).toDF("id", "w"))
      (0 until 10).foreach { k =>
        TableLog.deleteBand(spark, path, "id", k * 10L, k * 10L + 9L)
      } // v2..v11
      val servedBefore = TableLog.ChangeIo.servedMaterialized(path)
      val reads0 = TableLog.LogIo.manifestReads(path)
      val feed = TableLog.changes(spark, path, 1L, 11L)
      assert(feed.where(col("change") === "removed").count() === 100L)
      assert(TableLog.ChangeIo.servedMaterialized(path) - servedBefore === 10L,
        "every version in the range must serve from its change files")
      assert(TableLog.LogIo.manifestReads(path) === reads0,
        "zero manifest reads: the replay touched change files alone")
      // vacuum retention: change dirs below the watermark leave
      spark.conf.set("spark.graft.tablelog.retentionMs", "0")
      try TableLog.vacuum(spark, path, keepVersions = 2)
      finally spark.conf.unset("spark.graft.tablelog.retentionMs")
      val fsys = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fsys.exists(new org.apache.hadoop.fs.Path(
        s"$path/_changes/v0000003")), "vacuumed version's change dir swept")
      assert(fsys.exists(new org.apache.hadoop.fs.Path(
        s"$path/_changes/v0000011")), "retained version's change dir kept")
    } finally spark.conf.unset("spark.graft.tablelog.writeChangeFiles")
  }
  test("multi-table transaction: all-or-nothing under a mid-commit crash") {
    val pA = freshPath("graft-spec-tlog-txn-a")
    val pB = freshPath("graft-spec-tlog-txn-b")
    TableLog.create(spark, pA, (0L until 100L).map(i => (i, i)).toDF("id", "w"))
    TableLog.create(spark, pB, (0L until 50L).map(i => (i, i)).toDF("id", "n"))

    // happy path: both tables advance in one logical commit
    val vs = TableLog.transaction(spark, Seq(
      pA -> (100L until 120L).map(i => (i, i)).toDF("id", "w"),
      pB -> (50L until 60L).map(i => (i, i)).toDF("id", "n")))
    assert(vs === Seq(2L, 2L))
    assert(TableLog.read(spark, pA).count() === 120L)
    assert(TableLog.read(spark, pB).count() === 60L)

    // crash injected between table A's commit and table B's: the
    // intent survives, recovery rolls the transaction FORWARD — after
    // it, both tables carry the batch (never a partial pair)
    TableLog.testPreCommit.put(pB, () =>
      throw new RuntimeException("injected crash between participants"))
    val e = intercept[RuntimeException] {
      TableLog.transaction(spark, Seq(
        pA -> (120L until 130L).map(i => (i, i)).toDF("id", "w"),
        pB -> (60L until 70L).map(i => (i, i)).toDF("id", "n")))
    }
    assert(e.getMessage.contains("injected crash"))
    assert(TableLog.read(spark, pA).count() === 130L, "A committed pre-crash")
    assert(TableLog.read(spark, pB).count() === 60L, "B not yet")

    val first = Seq(pA, pB).min
    assert(TableLog.recoverTransactions(spark, first) === 1)
    assert(TableLog.read(spark, pB).count() === 70L,
      "recovery completed the crashed participant")
    assert(TableLog.read(spark, pA).count() === 130L,
      "recovery must not double-append the committed participant")
    // idempotent: nothing left to heal; a fresh transaction works
    assert(TableLog.recoverTransactions(spark, first) === 0)
    val vs2 = TableLog.transaction(spark, Seq(
      pA -> Seq((999L, 999L)).toDF("id", "w"),
      pB -> Seq((999L, 999L)).toDF("id", "n")))
    assert(TableLog.read(spark, pA).count() === 131L)
    assert(TableLog.read(spark, pB).count() === 71L)
    assert(vs2.forall(_ >= 3L))
  }
  test("overwrite replaces contents as a version; dynamic mode replaces present partitions") {
    val path = freshPath("graft-spec-tlog-ovw")
    TableLog.create(spark, path, (0L until 100L).map(i => (i, i)).toDF("id", "w"))
    TableLog.overwrite(spark, path, (500L until 530L).map(i => (i, i)).toDF("id", "w"))
    assert(TableLog.read(spark, path).count() === 30L)
    assert(TableLog.read(spark, path, Some(1L)).count() === 100L, "time travel intact")

    val p2 = freshPath("graft-spec-tlog-ovwdyn")
    val base = (0L until 900L).map(i =>
      (i, Seq("en", "de", "zh")((i % 3L).toInt), i)).toDF("id", "lang", "w")
    TableLog.createPartitioned(spark, p2, base.repartition(2), Seq("lang"))
    val before = TableLog.files(spark, p2).toSet
    // replace ONLY the partitions present in the batch (en)
    TableLog.overwritePartitionsDynamic(spark, p2,
      (0L until 10L).map(i => (i + 5000L, "en", i)).toDF("id", "lang", "w"))
    val got = TableLog.read(spark, p2)
    assert(got.where(col("lang") === "en").count() === 10L, "en replaced")
    assert(got.where(col("lang") =!= "en").count() === 600L, "others untouched")
    // untouched partitions carry over BY NAME — zero IO
    val after = TableLog.files(spark, p2).toSet
    assert(before.filterNot(_.startsWith("lang=en/")).subsetOf(after),
      "non-en files must carry over by name")
    assert(after.filterNot(_.startsWith("lang=en/")) ===
      before.filterNot(_.startsWith("lang=en/")))
  }
  test("transaction rebases under a concurrent lock-free append — both land") {
    val pA = freshPath("graft-spec-tlog-txnrace-a")
    val pB = freshPath("graft-spec-tlog-txnrace-b")
    TableLog.create(spark, pA, (0L until 50L).map(i => (i, i)).toDF("id", "w"))
    TableLog.create(spark, pB, (0L until 50L).map(i => (i, i)).toDF("id", "n"))
    // an optimistic appender steals pA's version INSIDE the
    // transaction's first CAS attempt (the seam is one-shot, so the
    // inner append commits cleanly); the txn's tagged CAS must rebase
    TableLog.testPreCommit.put(pA, () => {
      TableLog.appendOptimistic(spark, pA,
        (9000L until 9010L).map(i => (i, i)).toDF("id", "w"))
      ()
    })
    TableLog.transaction(spark, Seq(
      pA -> (100L until 120L).map(i => (i, i)).toDF("id", "w"),
      pB -> (100L until 110L).map(i => (i, i)).toDF("id", "n")))
    assert(TableLog.read(spark, pA).count() === 80L,
      "base 50 + stolen append 10 + txn batch 20 — all land")
    assert(TableLog.read(spark, pB).count() === 60L)
    assert(TableLog.versions(spark, pA).size === 3, "append v2, txn v3")
  }
  test("vacuum heals an AGED crashed transaction instead of sweeping its staged files") {
    // the one window the retention horizon cannot close: a crashed
    // transaction's staged files are legitimately OLD. Run the race
    // at BOTH the first participant and a non-first one (the intent
    // mirrors to every participant so either vacuum can see it).
    Seq(true, false).foreach { vacuumAtFirst =>
      val tag = if (vacuumAtFirst) "f" else "o"
      val pA = freshPath(s"graft-spec-tlog-txnvac-$tag-a")
      val pB = freshPath(s"graft-spec-tlog-txnvac-$tag-b")
      TableLog.create(spark, pA, (0L until 40L).map(i => (i, i)).toDF("id", "w"))
      TableLog.create(spark, pB, (0L until 30L).map(i => (i, i)).toDF("id", "n"))
      val first = Seq(pA, pB).min
      val other = Seq(pA, pB).max
      // crash BEFORE any participant commits: intent published, zero
      // tables advanced — the pure roll-forward case
      TableLog.testPreCommit.put(first,
        () => throw new RuntimeException("injected crash after intent"))
      val e = intercept[RuntimeException] {
        TableLog.transaction(spark, Seq(
          pA -> (100L until 120L).map(i => (i, i)).toDF("id", "w"),
          pB -> (100L until 115L).map(i => (i, i)).toDF("id", "n")))
      }
      assert(e.getMessage.contains("injected crash"))
      assert(TableLog.read(spark, pA).count() === 40L, "nothing committed yet")
      assert(TableLog.read(spark, pB).count() === 30L)
      val fsys = new org.apache.hadoop.fs.Path(pA)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(pA, pB).foreach { p =>
        assert(fsys.listStatus(new org.apache.hadoop.fs.Path(s"$p/_log"))
          .exists(_.getPath.getName.startsWith("_txn_")),
          s"intent must be mirrored at $p")
      }
      // retention 0 ages the staged files; vacuum must roll the
      // transaction forward, not sweep them
      spark.conf.set("spark.graft.tablelog.retentionMs", "0")
      try TableLog.vacuum(spark,
        if (vacuumAtFirst) first else other, keepVersions = 1)
      finally spark.conf.unset("spark.graft.tablelog.retentionMs")
      // all-or-nothing: BOTH tables carry the batch and read cleanly
      // (a sweep of the staged files would throw FileNotFound here)
      assert(TableLog.read(spark, pA).count() === 60L,
        s"vacuumAtFirst=$vacuumAtFirst: A healed")
      assert(TableLog.read(spark, pB).count() === 45L,
        s"vacuumAtFirst=$vacuumAtFirst: B healed")
      // nothing pending anywhere
      assert(TableLog.recoverTransactions(spark, first) === 0)
      assert(TableLog.recoverTransactions(spark, other) === 0)
    }
  }
  test("conditional-PUT commit protocol: racing drivers, exactly one PUT wins") {
    val dir = freshPath("graft-spec-tlog-condput")
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val dest = new org.apache.hadoop.fs.Path(s"$dir/v0000042.json")
    val guard = new Object
    // the two-driver clobber: concurrent publishers of DIFFERENT bytes
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = {
            val tmp = new org.apache.hadoop.fs.Path(s"$dir/_tmp_put_$i.json")
            val out = fsys.create(tmp, true)
            out.write(s"""{"writer":$i}""".getBytes("UTF-8"))
            out.close()
            TableLog.ConditionalPutCommitProtocol.publish(fsys, tmp, dest, guard)
          }
        })
      }
      val wins = futures.map(_.get())
      assert(wins.count(identity) === 1, s"exactly one PUT may win: $wins")
    } finally pool.shutdown()
    // the winner's bytes are intact JSON, losers' tmps are disposed
    val body = {
      val in = fsys.open(dest)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(body.matches("""\{"writer":\d\}"""), body)
    assert(!fsys.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.startsWith("_tmp_put_")), "tmps disposed")

    // end to end behind the conf: commits PUT manifests (no rename),
    // the optimistic append still rebases when its version is stolen
    spark.conf.set("spark.graft.tablelog.commitProtocol",
      "graft.operators.TableLog$ConditionalPutCommitProtocol$")
    try {
      val path = freshPath("graft-spec-tlog-condput-t")
      TableLog.create(spark, path,
        (0L until 50L).map(i => (i, i)).toDF("id", "w"))
      TableLog.testPreCommit.put(path, () => {
        TableLog.appendOptimistic(spark, path,
          (9000L until 9010L).map(i => (i, i)).toDF("id", "w"))
        ()
      })
      TableLog.appendOptimistic(spark, path,
        (100L until 120L).map(i => (i, i)).toDF("id", "w"))
      assert(TableLog.read(spark, path).count() === 80L,
        "both appends land under the conditional-PUT protocol")
      assert(TableLog.versions(spark, path) === Seq(1L, 2L, 3L))
    } finally spark.conf.unset("spark.graft.tablelog.commitProtocol")
  }
  test("change feed over a 200-version backfill: one scan per SEGMENT, not per version") {
    val path = freshPath("graft-spec-tlog-cdcrange")
    TableLog.create(spark, path,
      (0L until 50L).map(i => (i, i)).toDF("id", "w"))          // v1
    // 160 unmaterialized pure-append versions (CDC off — the backfill)
    (1 to 160).foreach { k =>
      TableLog.append(spark, path, Seq((1000L + k, k.toLong)).toDF("id", "w"))
    }                                                           // v2..v161
    // 40 materialized DV-delete versions
    spark.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
    try (1 to 40).foreach { k =>
      TableLog.deleteWhereDV(spark, path, col("id") === (1000L + k))
    }                                                           // v162..v201
    finally spark.conf.unset("spark.graft.tablelog.writeChangeFiles")
    val last = TableLog.latestVersion(spark, path)
    assert(last === 201L)
    val served0 = TableLog.ChangeIo.servedMaterialized(path)
    val feed = TableLog.changes(spark, path, 1L, last)
    // plan shape: the whole range is TWO segments (one multi-path read
    // over the 40 change dirs + one scan of the 160-append run) — a
    // per-version union tree would carry ~200 Union nodes
    val unions = feed.queryExecution.logical.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.size
    assert(unions <= 2, s"expected <= 2 union nodes, got $unions")
    assert(TableLog.ChangeIo.servedMaterialized(path) - served0 === 40L,
      "every materialized version must serve from its change files")
    // correctness against the analytically-known change history
    val got = feed.select(col("id"), col("change"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val wantAdds = (1 to 160).map(k => (1000L + k, "added", k + 1L)).toSet
    val wantDels = (1 to 40).map(k => (1000L + k, "removed", 161L + k)).toSet
    assert(got === (wantAdds ++ wantDels))
  }
  test("root pointer: cross-table snapshot isolation for root-resolved readers") {
    val pA = freshPath("graft-spec-tlog-root-a")
    val pB = freshPath("graft-spec-tlog-root-b")
    val root = freshPath("graft-spec-tlog-root-r")
    TableLog.create(spark, pA, (0L until 10L).map(i => (i, i)).toDF("id", "w"))
    TableLog.create(spark, pB, (0L until 10L).map(i => (i, i)).toDF("id", "n"))
    def txn(lo: Long, n: Long): Unit = {
      TableLog.transaction(spark, Seq(
        pA -> (lo until lo + n).map(i => (i, i)).toDF("id", "w"),
        pB -> (lo until lo + n).map(i => (i, i)).toDF("id", "n")),
        root = Some(root))
      ()
    }
    txn(100L, 10L) // both 20
    // pin the root BEFORE the next transaction commits
    val pinnedV = TableLog.rootVersions(spark, root).last
    txn(200L, 5L)  // both 25 at the new root
    // the pinned reader sees the consistent PRE-transaction pair even
    // though both tables have advanced underneath
    assert(TableLog.readAtRoot(spark, root, pA, Some(pinnedV)).count() === 20L)
    assert(TableLog.readAtRoot(spark, root, pB, Some(pinnedV)).count() === 20L)
    // the latest root sees the consistent POST pair
    assert(TableLog.readAtRoot(spark, root, pA).count() === 25L)
    assert(TableLog.readAtRoot(spark, root, pB).count() === 25L)

    // the isolation point is the root's single rename: a transaction
    // that committed table A's version but CRASHED before B's leaves
    // the root untouched — a root reader still sees the old pair; the
    // recovery completes the tables AND replays the root bump
    val first = Seq(pA, pB).min
    val second = Seq(pA, pB).max
    TableLog.testPreCommit.put(second, () =>
      throw new RuntimeException("crash between participants"))
    intercept[RuntimeException] { txn(300L, 7L) }
    val tornRoot = TableLog.rootSnapshot(spark, root)
    assert(TableLog.read(spark, first).count() === 32L,
      "first participant committed before the crash")
    assert(TableLog.readAtRoot(spark, root, pA, None).count() === 25L,
      "root readers still see the pre-crash pair")
    assert(TableLog.readAtRoot(spark, root, pB, None).count() === 25L)
    assert(tornRoot === TableLog.rootSnapshot(spark, root))
    val rootsBefore = TableLog.rootVersions(spark, root).size
    assert(TableLog.recoverTransactions(spark, first) === 1)
    assert(TableLog.readAtRoot(spark, root, pA).count() === 32L)
    assert(TableLog.readAtRoot(spark, root, pB).count() === 32L)
    assert(TableLog.rootVersions(spark, root).size === rootsBefore + 1)
    // replayed recovery does not double-bump (tag idempotency)
    assert(TableLog.recoverTransactions(spark, first) === 0)
    assert(TableLog.rootVersions(spark, root).size === rootsBefore + 1)
    // unregistered table fails fast
    val e = intercept[IllegalArgumentException] {
      TableLog.readAtRoot(spark, root, freshPath("graft-spec-tlog-root-x"))
    }
    assert(e.getMessage.contains("does not register"))
  }
  test("root-aware vacuum: root-pinned versions survive retention; readAtRoot serves them") {
    val pA = freshPath("graft-spec-tlog-rvac-a")
    val pB = freshPath("graft-spec-tlog-rvac-b")
    val root = freshPath("graft-spec-tlog-rvac-r")
    TableLog.create(spark, pA, (0L until 10L).map(i => (i, i)).toDF("id", "w"))
    TableLog.create(spark, pB, (0L until 10L).map(i => (i, i)).toDF("id", "n"))
    TableLog.transaction(spark, Seq(
      pA -> Seq((100L, 100L)).toDF("id", "w"),
      pB -> Seq((100L, 100L)).toDF("id", "n")), root = Some(root))
    // the transaction registered its root at every participant
    assert(TableLog.registeredRoots(spark, pA) === Seq(root))
    assert(TableLog.registeredRoots(spark, pB) === Seq(root))
    val pinnedA = TableLog.rootSnapshot(spark, root)(pA)
    // advance table A five more versions past the pin
    (0 until 5).foreach(i =>
      TableLog.append(spark, pA, Seq((1000L + i, 0L)).toDF("id", "w")))
    assert(TableLog.latestVersion(spark, pA) === pinnedA + 5)
    spark.conf.set("spark.graft.tablelog.retentionMs", "0")
    try {
      TableLog.vacuum(spark, pA, keepVersions = 1)
      // the pinned pair still serves — consistent across both tables —
      // even though the pin sits BELOW the watermark
      assert(TableLog.vacuumWatermark(spark, pA) === pinnedA + 5)
      assert(TableLog.readAtRoot(spark, root, pA).count() === 11L)
      assert(TableLog.readAtRoot(spark, root, pB).count() === 11L)
      // non-pinned intermediates really vacuumed (the retention window
      // did not silently widen)
      val e = intercept[IllegalArgumentException] {
        TableLog.read(spark, pA, Some(pinnedA + 2))
      }
      assert(e.getMessage.contains("vacuumed"))
      // an UNREGISTERED pin is still swept — loud, actionable failure
      val pC = freshPath("graft-spec-tlog-rvac-c")
      val rootC = freshPath("graft-spec-tlog-rvac-rc")
      TableLog.create(spark, pC, Seq((0L, 0L)).toDF("id", "w"))
      TableLog.append(spark, pC, Seq((1L, 0L)).toDF("id", "w"))
      TableLog.rootBump(spark, rootC, Map(pC -> 2L))
      (0 until 3).foreach(i =>
        TableLog.append(spark, pC, Seq((10L + i, 0L)).toDF("id", "w")))
      TableLog.vacuum(spark, pC, keepVersions = 1) // rootC never registered
      val e2 = intercept[IllegalArgumentException] {
        TableLog.readAtRoot(spark, rootC, pC)
      }
      assert(e2.getMessage.contains("register the root"),
        s"want the actionable pin-vacuumed refusal, got: ${e2.getMessage}")
      // ...and passing the root explicitly protects it the next time
      TableLog.append(spark, pC, Seq((98L, 0L)).toDF("id", "w")) // v6
      TableLog.rootBump(spark, rootC, Map(pC -> 6L))
      TableLog.append(spark, pC, Seq((99L, 0L)).toDF("id", "w")) // v7
      TableLog.vacuum(spark, pC, keepVersions = 1, roots = Seq(rootC))
      assert(TableLog.readAtRoot(spark, rootC, pC).count() === 6L)
    } finally spark.conf.unset("spark.graft.tablelog.retentionMs")
  }

  test("root _last pointer: missing or stale pointers heal by probing forward") {
    val pA = freshPath("graft-spec-tlog-rootptr-a")
    val pB = freshPath("graft-spec-tlog-rootptr-b")
    val root = freshPath("graft-spec-tlog-rootptr-r")
    TableLog.create(spark, pA, (0L until 5L).map(i => (i, i)).toDF("id", "w"))
    TableLog.create(spark, pB, (0L until 5L).map(i => (i, i)).toDF("id", "n"))
    (1 to 3).foreach { k =>
      TableLog.transaction(spark, Seq(
        pA -> Seq((100L + k, k.toLong)).toDF("id", "w"),
        pB -> Seq((100L + k, k.toLong)).toDF("id", "n")),
        root = Some(root))
    }
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_root/_last")
    assert(fsys.exists(ptr))
    assert(TableLog.rootSnapshot(spark, root).values.toSet.nonEmpty)
    val want = TableLog.rootSnapshot(spark, root)
    // a crashed pointer publish: pointer missing entirely
    assert(fsys.delete(ptr, false))
    assert(TableLog.rootSnapshot(spark, root) === want,
      "missing pointer falls back to the listing authority")
    // a LAGGING pointer (lost pointer race): probes forward heal it
    val out = fsys.create(ptr, true)
    out.write("1".getBytes("UTF-8"))
    out.close()
    assert(TableLog.rootSnapshot(spark, root) === want,
      "stale pointer heals by probing forward to the newest root")
    // and the next bump repairs the pointer itself
    TableLog.transaction(spark, Seq(
      pA -> Seq((200L, 9L)).toDF("id", "w"),
      pB -> Seq((200L, 9L)).toDF("id", "n")), root = Some(root))
    val healed = {
      val in = fsys.open(ptr)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
    assert(healed === 4L, s"pointer repaired to the newest root, got $healed")
  }
  test("a corrupt transaction intent (missing participant path) refuses recovery loudly") {
    val p = freshPath("graft-spec-tlog-txncorrupt")
    TableLog.create(spark, p, Seq((1L, 1L)).toDF("id", "w"))
    val fsys = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))).json
      .replace("\"", "\\\"")
    val body =
      s"""{"txn":"deadbeef","tables":[{"files":["x.parquet"],"schema":"$schemaJson"}]}"""
    val out = fsys.create(
      new org.apache.hadoop.fs.Path(s"$p/_log/_txn_deadbeef.json"), true)
    out.write(body.getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalStateException] {
      TableLog.recoverTransactions(spark, p)
    }
    assert(e.getMessage.contains("missing or empty path"))
    assert(fsys.delete(
      new org.apache.hadoop.fs.Path(s"$p/_log/_txn_deadbeef.json"), false))
  }
  test("an empty overwrite is refused — never a silent all-rows delete") {
    val path = freshPath("graft-spec-tlog-emptyovw")
    TableLog.create(spark, path, (0L until 10L).map(i => (i, i)).toDF("id", "w"))
    val e = intercept[IllegalArgumentException] {
      TableLog.overwrite(spark, path,
        (0L until 10L).map(i => (i, i)).toDF("id", "w").where(lit(false)))
    }
    assert(e.getMessage.contains("EMPTY overwrite"))
    assert(TableLog.read(spark, path).count() === 10L, "table unchanged")

    // the opt-out: standard INSERT OVERWRITE truncate semantics
    spark.conf.set("spark.graft.tablelog.allowEmptyOverwrite", "true")
    try {
      TableLog.overwrite(spark, path,
        (0L until 10L).map(i => (i, i)).toDF("id", "w").where(lit(false)))
      assert(TableLog.read(spark, path).count() === 0L,
        "under the conf an empty overwrite truncates")
      // still a committed, time-travelable version
      assert(TableLog.read(spark, path, Some(1L)).count() === 10L)
    } finally spark.conf.unset("spark.graft.tablelog.allowEmptyOverwrite")

    val p2 = freshPath("graft-spec-tlog-emptyovwp")
    TableLog.createPartitioned(spark, p2,
      (0L until 9L).map(i => (i, Seq("a", "b", "c")((i % 3L).toInt)))
        .toDF("id", "g").repartition(1), Seq("g"))
    intercept[IllegalArgumentException] {
      TableLog.overwrite(spark, p2,
        Seq((1L, "a")).toDF("id", "g").where(lit(false)))
    }
    assert(TableLog.read(spark, p2).count() === 9L, "partitioned table unchanged")
  }
  test("current-time expressions classify NON-deterministic for two-pass mutators") {
    val shape = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    assert(TableLog.allDeterministic(spark, shape, Seq(col("id") + 1L)),
      "plain arithmetic stays deterministic")
    // ComputeCurrentTime stamps these per-QUERY; discovery and rewrite
    // run as separate queries, so they must take the one-eval path
    assert(!TableLog.allDeterministic(spark, shape, Seq(current_timestamp())))
    assert(!TableLog.allDeterministic(spark, shape, Seq(current_date())))
    assert(!TableLog.allDeterministic(spark, shape,
      Seq(expr("now() > timestamp'2020-01-01'"))))
    assert(!TableLog.allDeterministic(spark, shape, Seq(rand() > 0.5)))
  }
  test("materialized CDC on a PARTITIONED table: xor-equal to the diff chain") {
    val path = freshPath("graft-spec-tlog-cdcpart")
    spark.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
    try {
      val base = (0L until 600L).map(i =>
        (i, Seq("en", "de", "zh")((i % 3L).toInt), i)).toDF("id", "lang", "w")
      TableLog.createPartitioned(spark, path, base.repartition(2), Seq("lang")) // v1
      TableLog.deleteWhere(spark, path, col("w") < 100L)                        // v2
      TableLog.deletePartition(spark, path, Map("lang" -> "de"))               // v3
      TableLog.updateWhere(spark, path,
        Seq("w" -> (col("w") + 5L)), col("id") < 150L)                          // v4
      TableLog.appendPartitioned(spark, path,
        (10000L until 10020L).map(i => (i, "fr", i)).toDF("id", "lang", "w"))   // v5

      val mat = TableLog.changes(spark, path, 1L, 5L)
      val rec = (2L to 5L).map(v =>
        TableLog.diff(spark, path, v - 1, v)
          .withColumn("_commit_version", lit(v)))
        .reduce(_.unionByName(_, allowMissingColumns = true))
      assert(mat.exceptAll(rec).isEmpty && rec.exceptAll(mat).isEmpty,
        "partitioned change feed must be multiset-equal to the diff chain")
      // rewrite commits (v2, v3, v4) served materialized; the
      // partitioned append (v5) reconstructs exchange-free
      assert(TableLog.ChangeIo.servedMaterialized(path) === 3L,
        s"served ${TableLog.ChangeIo.servedMaterialized(path)}")
    } finally spark.conf.unset("spark.graft.tablelog.writeChangeFiles")
  }
}

/** Test commit protocol: delegates to the default rename CAS, counts
  * publications, and can be armed to report ONE lost CAS (the
  * object-store "someone else PUT first" answer) without publishing.
  */
class TableLogProtocolProbe extends TableLog.CommitProtocol {
  override def publish(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, dest: org.apache.hadoop.fs.Path,
      guard: Object): Boolean =
    if (TableLogProtocolProbe.loseOnce.compareAndSet(true, false)) {
      fs.delete(tmp, false)
      false
    } else {
      TableLogProtocolProbe.delegated.incrementAndGet()
      TableLog.RenameCommitProtocol.publish(fs, tmp, dest, guard)
    }
}

object TableLogProtocolProbe {
  val delegated = new java.util.concurrent.atomic.AtomicLong(0L)
  val loseOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
}


