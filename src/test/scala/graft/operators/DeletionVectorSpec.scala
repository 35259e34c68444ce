package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins deletion vectors (merge-on-read deletes): a point delete
  * writes O(deleted rows) — counted against the data dir, not
  * wall-clock — every read surface applies the vectors, rewrites fold
  * them in, diff/CDC see position-level changes, and vacuum sweeps
  * unreferenced sidecars.
  */
class DeletionVectorSpec extends GraftSparkSpec {

  import spark.implicits._

  private def freshPath(stem: String): String = {
    val p = graft.SparkEntry.perProcessTmpDir(stem)
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    p
  }

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(path: String): Set[String] = {
    val f = fsOf(path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/data")
    val it = f.listFiles(dir, true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) { val s = it.next(); if (s.isFile) out += s.getPath.toString }
    out.toSet
  }

  private def dvDirs(path: String): Set[String] = {
    val f = fsOf(path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/_dv")
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).map(_.getPath.getName).toSet
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("a 1-row DV delete writes O(deleted rows): zero data files touched") {
    val path = freshPath("graft-spec-dv-core")
    val data = (0L until 4000L).map(i => (i, i % 7, s"p$i")).toDF("id", "g", "p")
    TableLog.create(spark, path,
      data.repartitionByRange(4, $"id").sortWithinPartitions("id"))
    val before = dataFiles(path)
    val filesBefore = TableLog.files(spark, path)

    assert(TableLog.deleteWhereDV(spark, path, col("id") === 1234L) === 2L)
    // counted IO: the data directory is byte-identical — no rewrite,
    // no new data file; the only new artifact is one _dv sidecar dir
    assert(dataFiles(path) === before, "data files must not be touched")
    assert(TableLog.files(spark, path) === filesBefore,
      "the manifest's file list is unchanged")
    assert(dvDirs(path).count(_.startsWith("d-")) === 1)

    // every read surface excludes the position
    assert(TableLog.read(spark, path).count() === 3999L)
    assert(TableLog.read(spark, path).where($"id" === 1234L).count() === 0L)
    assert(TableLog.readBand(spark, path, "id", 1200L, 1300L).count() === 100L)
    assert(TableLog.readPoint(spark, path, "id", 1234L).count() === 0L)
    assert(TableLog.readPoint(spark, path, "id", 1235L).count() === 1L)
    // time travel: v1 still sees the row
    assert(TableLog.read(spark, path, Some(1L)).where($"id" === 1234L).count() === 1L)
    // history reports LOGICAL rows
    val hist = TableLog.history(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist === Map(1L -> 4000L, 2L -> 3999L))

    // deletes STACK: a second (band) DV delete applies on top
    assert(TableLog.deleteWhereDV(spark, path,
      $"id" >= 100L && $"id" < 110L) === 3L)
    assert(dataFiles(path) === before, "still no data-file IO")
    assert(TableLog.read(spark, path).count() === 3989L)
    assert(TableLog.read(spark, path).where($"id".between(95L, 115L))
      .as[(Long, Long, String)].collect().map(_._1).sorted.toSeq ===
      ((95L to 99L) ++ (110L to 115L)))
    // a dead position is never re-recorded: deleting an already-dead
    // row is a no-op commit
    val v4 = TableLog.deleteWhereDV(spark, path, $"id" === 1234L)
    assert(v4 === 4L)
    assert(TableLog.read(spark, path).count() === 3989L)
    assert(dvDirs(path).count(_.startsWith("d-")) === 2,
      "a no-match delete writes no sidecar")
  }

  test("deleteWhere/deleteBand/updateWhere route to DVs under the conf; rewrites fold") {
    val path = freshPath("graft-spec-dv-fold")
    TableLog.create(spark, path,
      (0L until 2000L).map(i => (i, i % 5))
        .toDF("id", "g").repartitionByRange(4, $"id").sortWithinPartitions("id"))
    val before = dataFiles(path)
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    try {
      TableLog.deleteWhere(spark, path, $"id" === 7L)
      assert(dataFiles(path) === before, "conf-routed delete is merge-on-read")
      assert(TableLog.snapshot(spark, path).hasDvs)
      // band delete under the conf: manifest-cut discovery, sidecar write
      TableLog.deleteBand(spark, path, "id", 100L, 104L)
      assert(dataFiles(path) === before, "band delete is merge-on-read too")
      assert(TableLog.read(spark, path).count() === 1994L)

      // conf-routed UPDATE is merge-on-read: old position dies, the
      // updated copy APPENDS — the original files stay byte-identical
      TableLog.updateWhere(spark, path, Seq("g" -> lit(99L)), $"id" === 8L)
      assert(before.subsetOf(dataFiles(path)),
        "DV update must not rewrite existing files")
      assert((dataFiles(path) -- before).nonEmpty, "updated copy appended")
      val got = TableLog.read(spark, path)
      assert(got.count() === 1994L)
      assert(got.where($"id" === 8L).select("g").as[Long].collect().toSeq
        === Seq(99L), "exactly one updated copy visible")
      // stacking: update the updated row again
      TableLog.updateWhere(spark, path, Seq("g" -> lit(123L)), $"g" === 99L)
      assert(TableLog.read(spark, path).where($"id" === 8L)
        .select("g").as[Long].collect().toSeq === Seq(123L))

      // merge sees DV-deleted keys as ABSENT: the row re-inserts
      TableLog.deleteWhere(spark, path, $"id" === 20L)
      TableLog.merge(spark, path,
        Seq((20L, 777L)).toDF("id", "g"), "id")
      val after = TableLog.read(spark, path)
      assert(after.where($"id" === 20L).select("g").as[Long].collect()
        .toSeq === Seq(777L), "dv-deleted key merges as an insert")
    } finally spark.conf.unset("spark.graft.tablelog.deletionVectors")

    // copy-on-write UPDATE (conf off) on a vectored file FOLDS its
    // vector in: the entry drops, the delete is kept
    TableLog.deleteWhereDV(spark, path, $"id" === 9L)
    TableLog.updateWhere(spark, path, Seq("g" -> lit(55L)), $"id" === 10L)
    val folded = TableLog.snapshot(spark, path)
    // the file holding ids 7..10 rewrote: its dv entries dropped
    assert(TableLog.read(spark, path).where($"id".isin(7L, 9L)).count() === 0L,
      "fold kept the deletes")
    assert(TableLog.read(spark, path).where($"id" === 10L)
      .select("g").as[Long].head() === 55L)

    // OPTIMIZE clears every remaining vector, content preserved
    val pre = rows(TableLog.read(spark, path))
    TableLog.optimizeRange(spark, path, "id", 4)
    assert(!TableLog.snapshot(spark, path).hasDvs)
    assert(rows(TableLog.read(spark, path)) === pre)
    assert(folded.version < TableLog.snapshot(spark, path).version)
  }

  test("updateWhereDV: CDC sees remove+add; accounting aborts a mismatched write") {
    val path = freshPath("graft-spec-dv-upd")
    spark.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
    try {
      TableLog.create(spark, path,
        (0L until 600L).map(i => (i, s"p$i")).toDF("id", "p")
          .repartitionByRange(2, $"id"))                          // v1
      TableLog.updateWhereDV(spark, path,
        Seq("p" -> lit("UPDATED")), $"id".isin(5L, 405L))         // v2
      // reconstructed diff equals the materialized change set
      val d = TableLog.diff(spark, path, 1L, 2L)
      assert(rows(d) === Set(
        Seq(5L, "p5", "removed"), Seq(405L, "p405", "removed"),
        Seq(5L, "UPDATED", "added"), Seq(405L, "UPDATED", "added")))
      val mat = TableLog.changes(spark, path, 1L, 2L)
        .drop("_commit_version")
      assert(mat.exceptAll(d).isEmpty && d.exceptAll(mat).isEmpty)
      // time travel intact
      assert(TableLog.read(spark, path, Some(1L)).where($"p" === "UPDATED")
        .count() === 0L)
      // history: logical rows unchanged by an update
      val hist = TableLog.history(spark, path).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hist === Map(1L -> 600L, 2L -> 600L))
    } finally spark.conf.unset("spark.graft.tablelog.writeChangeFiles")
  }

  test("updateWhereDV: NON-DETERMINISTIC assignment — CDC 'added' equals the appended rows") {
    val path = freshPath("graft-spec-dv-updnd")
    spark.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
    try {
      TableLog.create(spark, path,
        (0L until 400L).map(i => (i, 0L)).toDF("id", "w")
          .repartitionByRange(2, $"id"))                          // v1
      // rand()-derived assignment: re-executing the projection would
      // stamp DIFFERENT values into the CDC than into the table
      TableLog.updateWhereDV(spark, path,
        Seq("w" -> (rand(0) * lit(1000000)).cast("long")),
        $"id".between(100L, 120L))                                // v2
      val tableNow = TableLog.read(spark, path)
        .where($"id".between(100L, 120L))
      val cdcAdded = TableLog.changes(spark, path, 1L, 2L)
        .where($"change" === "added").select($"id", $"w")
      assert(cdcAdded.count() === 21L)
      assert(cdcAdded.exceptAll(tableNow).isEmpty &&
        tableNow.exceptAll(cdcAdded).isEmpty,
        "the materialized change feed must carry the SAME rows the " +
          "table appended — one evaluation of the assignments")
    } finally spark.conf.unset("spark.graft.tablelog.writeChangeFiles")
  }

  test("diff and the change feed see DV commits as position-level removals") {
    val path = freshPath("graft-spec-dv-cdc")
    spark.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
    try {
      TableLog.create(spark, path,
        (0L until 1000L).map(i => (i, s"r$i")).toDF("id", "p")
          .repartitionByRange(2, $"id"))                        // v1
      TableLog.deleteWhereDV(spark, path, $"id".isin(3L, 500L)) // v2
      TableLog.deleteWhereDV(spark, path, $"id" === 4L)         // v3
      TableLog.append(spark, path,
        Seq((5000L, "new")).toDF("id", "p"))                    // v4

      // reconstructed diff across a DV commit: exactly the dead rows
      val d12 = TableLog.diff(spark, path, 1L, 2L)
      assert(rows(d12) === Set(Seq(3L, "r3", "removed"), Seq(500L, "r500", "removed")))
      val d13 = TableLog.diff(spark, path, 1L, 3L)
      assert(rows(d13) === Set(
        Seq(3L, "r3", "removed"), Seq(500L, "r500", "removed"),
        Seq(4L, "r4", "removed")))
      // restore to v1 resurrects the positions -> 'added'
      val d21 = TableLog.diff(spark, path, 2L, 1L)
      assert(rows(d21) === Set(Seq(3L, "r3", "added"), Seq(500L, "r500", "added")))

      // the change feed chain (materialized + reconstructed agree)
      val mat = TableLog.changes(spark, path, 1L, 4L)
      val rec = (2L to 4L).map(v =>
        TableLog.diff(spark, path, v - 1, v).withColumn("_commit_version", lit(v)))
        .reduce(_.unionByName(_, allowMissingColumns = true))
      assert(mat.exceptAll(rec).isEmpty && rec.exceptAll(mat).isEmpty,
        "DV change feed must be multiset-equal to the diff chain")

      // restore of a DV-carrying version keeps its vectors
      val v5 = TableLog.restore(spark, path, 2L)
      assert(TableLog.read(spark, path, Some(v5)).count() === 998L)
      assert(TableLog.read(spark, path).where($"id" === 4L).count() === 1L,
        "v2 predates the id=4 delete")
    } finally spark.conf.unset("spark.graft.tablelog.writeChangeFiles")
  }

  test("DV deletes on a PARTITIONED table: hive-dir positions, partition reads apply") {
    val path = freshPath("graft-spec-dv-part")
    val base = (0L until 900L).map(i =>
      (i, Seq("en", "de", "zh")((i % 3L).toInt), i)).toDF("id", "lang", "w")
    TableLog.createPartitioned(spark, path, base.repartition(2), Seq("lang"))
    val before = dataFiles(path)
    TableLog.deleteWhereDV(spark, path, $"lang" === "en" && $"id" < 30L)
    assert(dataFiles(path) === before)
    assert(TableLog.read(spark, path).count() === 890L)
    assert(TableLog.readPartition(spark, path, Map("lang" -> "en")).count() === 290L)
    assert(TableLog.readPartition(spark, path, Map("lang" -> "de")).count() === 300L)
    // deletePartition drops the dv'd partition wholesale: entries leave
    TableLog.deletePartition(spark, path, Map("lang" -> "en"))
    assert(!TableLog.snapshot(spark, path).hasDvs)
    assert(TableLog.read(spark, path).count() === 600L)
  }

  test("vacuum sweeps sidecars no retained manifest references, keeps live ones") {
    val path = freshPath("graft-spec-dv-vacuum")
    TableLog.create(spark, path,
      (0L until 500L).map(i => (i, i)).toDF("id", "w").repartition(2)) // v1
    TableLog.deleteWhereDV(spark, path, $"id" === 5L)                  // v2
    TableLog.deleteWhereDV(spark, path, $"id" === 6L)                  // v3
    assert(dvDirs(path).count(_.startsWith("d-")) === 2)
    spark.conf.set("spark.graft.tablelog.retentionMs", "0")
    try {
      // keep v2+v3: both sidecars still referenced
      TableLog.vacuum(spark, path, keepVersions = 2)
      assert(dvDirs(path).count(_.startsWith("d-")) === 2)
      assert(TableLog.read(spark, path).count() === 498L)
      // fold everything and vacuum to latest-only: sidecars sweep
      TableLog.optimizeRange(spark, path, "id", 2)                     // v4
      TableLog.vacuum(spark, path, keepVersions = 1)
      assert(dvDirs(path).isEmpty, "unreferenced sidecars must sweep")
      assert(TableLog.read(spark, path).count() === 498L)
    } finally spark.conf.unset("spark.graft.tablelog.retentionMs")
  }

  test("compactDvs merges stacked sidecars into one — zero data-file IO") {
    val path = freshPath("graft-spec-dv-compact")
    TableLog.create(spark, path,
      (0L until 800L).map(i => (i, i)).toDF("id", "w")
        .repartitionByRange(2, $"id"))                       // v1
    (1 to 5).foreach(k =>
      TableLog.deleteWhereDV(spark, path, $"id" === k * 100L)) // v2..v6
    assert(dvDirs(path).count(_.startsWith("d-")) === 5)
    val before = dataFiles(path)
    val pre = rows(TableLog.read(spark, path))
    val v7 = TableLog.compactDvs(spark, path)                // v7
    assert(dataFiles(path).filterNot(_.contains("_dv")) ===
      before.filterNot(_.contains("_dv")), "zero data-file IO")
    val snap = TableLog.snapshot(spark, path)
    assert(snap.dvs.values.flatten.toSet.size === 1,
      "one merged sidecar referenced")
    assert(rows(TableLog.read(spark, path)) === pre, "content preserved")
    assert(TableLog.read(spark, path).count() === 795L)
    // the compact is content-preserving for CDC too
    assert(TableLog.diff(spark, path, 6L, v7).isEmpty)
    // vacuum sweeps the five unreferenced sidecars, keeps the merged one
    spark.conf.set("spark.graft.tablelog.retentionMs", "0")
    try TableLog.vacuum(spark, path, keepVersions = 1)
    finally spark.conf.unset("spark.graft.tablelog.retentionMs")
    assert(dvDirs(path).count(_.startsWith("d-")) === 1)
    assert(TableLog.read(spark, path).count() === 795L)
  }

  test("write amplification duel: a point delete writes <1% of the copy-on-write bytes") {
    def newTable(stem: String): String = {
      val p = freshPath(stem)
      TableLog.create(spark, p,
        spark.range(0L, 240000L).toDF("id")
          .withColumn("p", concat(lit("payload-"), col("id"),
            lit("-"), lit("x" * 40)))
          .repartitionByRange(4, $"id").sortWithinPartitions("id"))
      p
    }
    def bytesUnder(path: String, sub: String): Long = {
      val f = fsOf(path)
      val dir = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!f.exists(dir)) 0L
      else {
        val it = f.listFiles(dir, true)
        var total = 0L
        while (it.hasNext) { val s = it.next(); if (s.isFile) total += s.getLen }
        total
      }
    }
    // copy-on-write: the touched file REWRITES — the old file stays
    // for time travel, so bytes WRITTEN = the data-dir growth (the
    // fresh survivor copy, ~1/4 of the table)
    val cow = newTable("graft-spec-dv-duel-cow")
    val cowBefore = bytesUnder(cow, "data")
    TableLog.deleteWhere(spark, cow, $"id" === 31337L)
    val cowWritten = bytesUnder(cow, "data") - cowBefore
    assert(cowWritten > cowBefore / 8, "sanity: a real file rewrite happened")
    // merge-on-read: one tiny sidecar
    val dv = newTable("graft-spec-dv-duel-dv")
    val dvDataBefore = bytesUnder(dv, "data")
    TableLog.deleteWhereDV(spark, dv, $"id" === 31337L)
    val dvWritten = bytesUnder(dv, "_dv")
    assert(bytesUnder(dv, "data") === dvDataBefore, "zero data bytes written")
    assert(dvWritten > 0L)
    assert(dvWritten * 100 < cowWritten,
      s"DV delete must write <1% of copy-on-write: $dvWritten vs ~$cowWritten")
    assert(rows(TableLog.read(spark, cow)) === rows(TableLog.read(spark, dv)),
      "both modes converge to the same table")
  }

  test("merge-on-read MERGE: matched rows die by position, zero data-file rewrites") {
    val path = freshPath("graft-spec-dv-merge")
    TableLog.create(spark, path,
      (0L until 600L).map(i => (i, s"p$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))                          // v1
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    try {
      val before = dataFiles(path)
      // whole-row upsert: 2 replacements + 1 insert
      TableLog.merge(spark, path,
        Seq((5L, "FIVE"), (405L, "FOUR-OH-FIVE"), (1000L, "NEW"))
          .toDF("id", "p"), "id")                               // v2
      assert(before.subsetOf(dataFiles(path)),
        "merge-on-read MERGE must never rewrite or remove a data file")
      assert(TableLog.snapshot(spark, path).hasDvs)
      val got = TableLog.read(spark, path)
      assert(got.count() === 601L)
      assert(rows(got.where($"id".isin(5L, 405L, 1000L))) === Set(
        Seq(5L, "FIVE"), Seq(405L, "FOUR-OH-FIVE"), Seq(1000L, "NEW")))
      // time travel intact; logical history correct
      assert(TableLog.read(spark, path, Some(1L)).count() === 600L)
      assert(TableLog.read(spark, path, Some(1L))
        .where($"p" === "FIVE").count() === 0L)

      // general MERGE grammar: matched update + matched delete +
      // insert, all merge-on-read
      val before2 = dataFiles(path)
      TableLog.mergeWhen(spark, path,
        Seq((5L, 1L), (7L, 2L), (2000L, 3L)).toDF("id", "k"), "id",
        matched = Seq(
          TableLog.MergeWhen.Delete(Some($"_s_k" === 2L)),
          TableLog.MergeWhen.Update(None, Seq("p" -> concat($"p", lit("!"))))),
        notMatched = Seq(TableLog.MergeWhen.Insert(None, Seq(
          "id" -> $"_s_id", "p" -> lit("INSERTED")))))           // v3
      assert(before2.subsetOf(dataFiles(path)),
        "mergeWhen merge-on-read must never rewrite or remove a data file")
      val got3 = TableLog.read(spark, path)
      assert(got3.count() === 601L, "600+insert(1)+update keeps, delete(1)")
      assert(got3.where($"id" === 7L).count() === 0L, "matched DELETE")
      assert(rows(got3.where($"id".isin(5L, 2000L))) === Set(
        Seq(5L, "FIVE!"), Seq(2000L, "INSERTED")))
      // stacked vectors fold through OPTIMIZE like any DV
      TableLog.optimizeRange(spark, path, "id", numFiles = 2)
      assert(!TableLog.snapshot(spark, path).hasDvs)
      assert(TableLog.read(spark, path).count() === 601L)
      assert(rows(TableLog.read(spark, path).where($"id".isin(5L, 7L, 2000L)))
        === Set(Seq(5L, "FIVE!"), Seq(2000L, "INSERTED")))
    } finally spark.conf.unset("spark.graft.tablelog.deletionVectors")
  }

  test("merge-on-read MERGE on a PARTITIONED table: hive positions die, copies land in their dirs") {
    val path = freshPath("graft-spec-dv-merge-part")
    TableLog.createPartitioned(spark, path,
      (0L until 300L).map(i => (i, s"p${i % 3}", s"v0-$i"))
        .toDF("id", "lang", "payload").repartition(2), Seq("lang"))  // v1
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    try {
      val before = dataFiles(path)
      TableLog.merge(spark, path,
        Seq((6L, "p0", "UP-6"), (7L, "p1", "UP-7"), (900L, "p0", "NEW"))
          .toDF("id", "lang", "payload"), "id")                      // v2
      assert(before.subsetOf(dataFiles(path)),
        "partitioned merge-on-read MERGE must never rewrite a hive file")
      assert(TableLog.snapshot(spark, path).hasDvs)
      val got = TableLog.read(spark, path)
      assert(got.count() === 301L)
      assert(rows(got.where($"id".isin(6L, 7L, 900L))
        .select("id", "lang", "payload")) === Set(
        Seq(6L, "p0", "UP-6"), Seq(7L, "p1", "UP-7"),
        Seq(900L, "p0", "NEW")))
      // partition-pruned reads apply the positions
      assert(TableLog.readPartition(spark, path, Map("lang" -> "p0"))
        .where($"id" === 6L).select("payload")
        .as[String].collect().toSeq === Seq("UP-6"))
      assert(TableLog.read(spark, path, Some(1L)).count() === 300L)
    } finally spark.conf.unset("spark.graft.tablelog.deletionVectors")
  }

  test("write amplification duel: MERGE — a 3-row upsert writes <1% of copy-on-write bytes") {
    def newTable(stem: String): String = {
      val p = freshPath(stem)
      TableLog.create(spark, p,
        spark.range(0L, 240000L).toDF("id")
          .withColumn("p", concat(lit("payload-"), col("id"),
            lit("-"), lit("x" * 40)))
          .repartitionByRange(4, $"id").sortWithinPartitions("id"))
      p
    }
    def bytesUnder(path: String, sub: String): Long = {
      val f = fsOf(path)
      val dir = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!f.exists(dir)) 0L
      else {
        val it = f.listFiles(dir, true)
        var total = 0L
        while (it.hasNext) { val s = it.next(); if (s.isFile) total += s.getLen }
        total
      }
    }
    val src = Seq((100L, "UP-A"), (100100L, "UP-B"), (999999L, "NEW"))
    // copy-on-write: both matched files rewrite (~half the table)
    val cow = newTable("graft-spec-dv-mduel-cow")
    val cowBefore = bytesUnder(cow, "data")
    TableLog.merge(spark, cow, src.toDF("id", "p"), "id")
    val cowWritten = bytesUnder(cow, "data") - cowBefore
    assert(cowWritten > cowBefore / 8, "sanity: real file rewrites happened")
    // merge-on-read: one tiny sidecar + the 3 source rows
    val dv = newTable("graft-spec-dv-mduel-dv")
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    val dvBefore = bytesUnder(dv, "data")
    try TableLog.merge(spark, dv, src.toDF("id", "p"), "id")
    finally spark.conf.unset("spark.graft.tablelog.deletionVectors")
    val dvWritten =
      (bytesUnder(dv, "data") - dvBefore) + bytesUnder(dv, "_dv")
    assert(dvWritten > 0L)
    assert(dvWritten * 100 < cowWritten,
      s"DV merge must write <1% of copy-on-write: $dvWritten vs ~$cowWritten")
    assert(rows(TableLog.read(spark, cow)) === rows(TableLog.read(spark, dv)),
      "both modes converge to the same table")
  }

  test("sidecar cost instrumentation: 1M dead positions stay broadcast-sized") {
    // The bitmap question (RoaringBitmap-shaped sidecars), decided by
    // measurement: parquet (file, pos) sidecars delta-encode sorted
    // positions, so the marginal cost per dead position must stay in
    // single-digit BYTES. At that rate a 10M-position vector is still
    // inside the 32 MB broadcast bound the read path uses — a custom
    // bitmap format buys nothing until vectors outgrow that, and
    // compactDvs/OPTIMIZE fold them long before. Pinned here so a
    // regression in sidecar encoding (e.g. losing the sort) shows up
    // as a measured fact, not a guess.
    val path = freshPath("graft-spec-dv-cost")
    TableLog.create(spark, path,
      spark.range(0L, 2000000L).toDF("id")
        .withColumn("p", col("id") % 97L)
        .repartitionByRange(4, $"id").sortWithinPartitions("id"))
    TableLog.deleteBandDV(spark, path, "id", 500000L, 1499999L) // 1M rows
    val f = fsOf(path)
    val dvRoot = new org.apache.hadoop.fs.Path(s"$path/_dv")
    val it = f.listFiles(dvRoot, true)
    var bytes = 0L
    while (it.hasNext) { val s = it.next(); if (s.isFile) bytes += s.getLen }
    val perPos = bytes.toDouble / 1000000.0
    assert(perPos < 8.0,
      f"sidecar cost $perPos%.2f B/position — expected single-digit " +
        "bytes (delta-encoded sorted positions)")
    // and the vectored read still serves exactly the survivors
    assert(TableLog.read(spark, path).count() === 1000000L)
    assert(TableLog.read(spark, path)
      .agg(min($"id"), max($"id")).collect().head.toSeq ===
      Seq(0L, 1999999L))
  }

  test("SQL UPDATE and DELETE route merge-on-read under the conf") {
    graft.sql.TableLogSql.register(spark)
    val path = freshPath("graft-spec-dv-sqlroute")
    TableLog.create(spark, path,
      (0L until 1000L).map(i => (i, i)).toDF("id", "w")
        .repartitionByRange(2, $"id"))
    val before = dataFiles(path)
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    try {
      spark.sql(s"DELETE FROM tablelog.`$path` WHERE id = 11")
      spark.sql(s"UPDATE tablelog.`$path` SET w = 999 WHERE id = 12")
      assert(before.subsetOf(dataFiles(path)),
        "SQL DML under the conf must never rewrite existing files")
      val got = spark.sql(
        s"SELECT id, w FROM tablelog.`$path` WHERE id BETWEEN 10 AND 13 ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === Seq((10L, 10L), (12L, 999L), (13L, 13L)))
    } finally spark.conf.unset("spark.graft.tablelog.deletionVectors")
  }

  test("copy-on-write delete on a DV-carrying table stays consistent") {
    val path = freshPath("graft-spec-dv-cow")
    TableLog.create(spark, path,
      (0L until 1000L).map(i => (i, i)).toDF("id", "w")
        .repartitionByRange(2, $"id").sortWithinPartitions("id"))
    TableLog.deleteWhereDV(spark, path, $"id" === 10L)
    // conf OFF: a copy-on-write delete over the vectored file must
    // apply the vector (accounting is logical) and drop its entry
    TableLog.deleteWhere(spark, path, $"id" < 100L)
    assert(!TableLog.snapshot(spark, path).hasDvs)
    assert(TableLog.read(spark, path).count() === 900L)
    assert(rows(TableLog.read(spark, path).select("id")) ===
      (100L until 1000L).map(Seq(_)).toSet)
  }
}
