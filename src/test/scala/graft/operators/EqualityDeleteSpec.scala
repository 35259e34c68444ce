package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins equality-delete sidecars (merge-on-read deletes by KEY,
  * Iceberg's streaming-upsert shape): a key delete writes O(|keys|)
  * with ZERO reads or writes of data files — counted against the data
  * dir — the sequence rule scopes each sidecar to files that
  * pre-existed it (the same commit's appends survive, which IS the
  * upsert), every read surface anti-joins the keys out, rewrites fold
  * them in, diff/CDC reconstruct the row-level changes, SQL reads
  * compensate structurally, and vacuum sweeps unreferenced sidecars.
  */
class EqualityDeleteSpec extends GraftSparkSpec {

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
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile) out += s"${s.getPath}@${s.getLen}"
    }
    out.toSet
  }

  private def eqDirs(path: String): Set[String] = {
    val f = fsOf(path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/_eqd")
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).toSet
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("deleteByKey: zero data-file IO, reads/time-travel/history apply") {
    val path = freshPath("graft-spec-eq-core")
    TableLog.create(spark, path,
      (0L until 1000L).map(i => (i, s"p$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))                           // v1
    val before = dataFiles(path)
    TableLog.deleteByKey(spark, path, Seq(5L, 400L, 999L).toDF("id")) // v2
    assert(dataFiles(path) === before,
      "an equality delete must not read or touch a single data file")
    assert(eqDirs(path).size === 1)
    val got = TableLog.read(spark, path)
    assert(got.count() === 997L)
    assert(got.where($"id".isin(5L, 400L, 999L)).count() === 0L)
    // time travel: v1 still serves all rows
    assert(TableLog.read(spark, path, Some(1L)).count() === 1000L)
    // a second delete stacks
    TableLog.deleteByKey(spark, path, Seq(6L).toDF("id"))        // v3
    assert(TableLog.read(spark, path).count() === 996L)
    assert(eqDirs(path).size === 2)
    // history pays the visible-count scan for eq versions — and is right
    assert(TableLog.history(spark, path).orderBy($"version")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1000L), (2L, 997L), (3L, 996L)))
    // snapshot reports the live state
    assert(TableLog.snapshot(spark, path).hasEqDeletes)
    // OPTIMIZE folds: rewritten bytes carry no dead keys, state clears
    TableLog.optimizeRange(spark, path, "id", numFiles = 2)      // v4
    assert(!TableLog.snapshot(spark, path).hasEqDeletes)
    assert(TableLog.read(spark, path).count() === 996L)
    assert(TableLog.read(spark, path).where($"id" === 6L).count() === 0L)
  }

  test("upsertBatch: same-commit appends survive their own delete — epochs last-win") {
    val path = freshPath("graft-spec-eq-upsert")
    TableLog.create(spark, path,
      (0L until 600L).map(i => (i, s"v0-$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))                           // v1
    val before = dataFiles(path)
    // epoch 0: replace ids 1,2 and add 1000
    TableLog.upsertBatch(spark, path,
      Seq((1L, "e0-1"), (2L, "e0-2"), (1000L, "e0-1000")).toDF("id", "p"),
      Seq("id"), "batch-0")                                      // v2
    assert(before.subsetOf(dataFiles(path)),
      "upsert must never read or rewrite existing data files")
    val got = TableLog.read(spark, path)
    assert(got.count() === 601L)
    assert(rows(got.where($"id".isin(1L, 2L, 1000L))) ===
      Set(Seq(1L, "e0-1"), Seq(2L, "e0-2"), Seq(1000L, "e0-1000")))
    // epoch 1 re-upserts id 1 and 1000: epoch-0 copies die, epoch-1 live
    TableLog.upsertBatch(spark, path,
      Seq((1L, "e1-1"), (1000L, "e1-1000")).toDF("id", "p"),
      Seq("id"), "batch-1")                                      // v3
    val got2 = TableLog.read(spark, path)
    assert(got2.count() === 601L)
    assert(rows(got2.where($"id".isin(1L, 2L, 1000L))) ===
      Set(Seq(1L, "e1-1"), Seq(2L, "e0-2"), Seq(1000L, "e1-1000")))
    // replay of epoch 1 is a no-op (tag recognized)
    val vBefore = TableLog.latestVersion(spark, path)
    assert(TableLog.upsertBatch(spark, path,
      Seq((1L, "REPLAYED"), (1000L, "REPLAYED")).toDF("id", "p"),
      Seq("id"), "batch-1") === vBefore)
    assert(TableLog.read(spark, path).where($"p" === "REPLAYED").count() === 0L)
    // time travel reconstructs every epoch exactly
    assert(TableLog.read(spark, path, Some(2L))
      .where($"id" === 1L).select("p").as[String].head() === "e0-1")
    assert(TableLog.read(spark, path, Some(1L)).count() === 600L)
    // duplicate keys within one batch are refused loudly
    val e = intercept[IllegalArgumentException] {
      TableLog.upsertBatch(spark, path,
        Seq((7L, "a"), (7L, "b")).toDF("id", "p"), Seq("id"), "batch-2")
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("validation: unknown column, retype, NULL keys, unsupported type") {
    val path = freshPath("graft-spec-eq-valid")
    TableLog.create(spark, path,
      Seq((1L, "a", 1.5)).toDF("id", "p", "score"))
    assert(intercept[IllegalArgumentException] {
      TableLog.deleteByKey(spark, path, Seq(1L).toDF("nope"))
    }.getMessage.contains("not a table column"))
    assert(intercept[IllegalArgumentException] {
      TableLog.deleteByKey(spark, path, Seq(1).toDF("id")) // int vs long
    }.getMessage.contains("table column"))
    assert(intercept[IllegalArgumentException] {
      TableLog.deleteByKey(spark, path,
        Seq(Some(1L), None).toDF("id"))
    }.getMessage.contains("NULL key"))
    assert(intercept[IllegalArgumentException] {
      TableLog.deleteByKey(spark, path, Seq(1.5).toDF("score"))
    }.getMessage.contains("integral"))
    // zero keys: no commit at all
    val v = TableLog.latestVersion(spark, path)
    assert(TableLog.deleteByKey(spark, path,
      Seq.empty[Long].toDF("id")) === v)
    assert(TableLog.latestVersion(spark, path) === v)
  }

  test("diff and the change feed reconstruct eq-delete and upsert commits") {
    val path = freshPath("graft-spec-eq-diff")
    TableLog.create(spark, path,
      (0L until 400L).map(i => (i, s"v0-$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))                           // v1
    TableLog.deleteByKey(spark, path, Seq(10L, 250L).toDF("id")) // v2
    val d = TableLog.diff(spark, path, 1L, 2L)
    assert(rows(d) === Set(
      Seq(10L, "v0-10", "removed"), Seq(250L, "v0-250", "removed")))
    TableLog.upsertBatch(spark, path,
      Seq((20L, "e0-20"), (900L, "e0-900")).toDF("id", "p"),
      Seq("id"), "b0")                                           // v3
    val d2 = TableLog.diff(spark, path, 2L, 3L)
    assert(rows(d2) === Set(
      Seq(20L, "v0-20", "removed"),
      Seq(20L, "e0-20", "added"), Seq(900L, "e0-900", "added")))
    // restore to v1 resurrects the deleted rows through the feed
    TableLog.restore(spark, path, 1L)                            // v4
    val d3 = TableLog.diff(spark, path, 3L, 4L)
    assert(rows(d3) === Set(
      Seq(10L, "v0-10", "added"), Seq(250L, "v0-250", "added"),
      Seq(20L, "v0-20", "added"),
      Seq(20L, "e0-20", "removed"), Seq(900L, "e0-900", "removed")))
    // the batch change feed composes the same history
    val ch = TableLog.changes(spark, path, 1L, 3L)
    assert(ch.where($"_commit_version" === 2L).count() === 2L)
    assert(ch.where($"_commit_version" === 3L).count() === 3L)
  }

  test("SQL reads compensate: SELECT, CTAS SELECT *, COUNT refusal") {
    graft.sql.TableLogSql.register(spark)
    val src = freshPath("graft-spec-eq-sql-src")
    val dst = freshPath("graft-spec-eq-sql-dst")
    TableLog.create(spark, src,
      (0L until 300L).map(i => (i, s"p$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))
    TableLog.deleteByKey(spark, src, Seq(7L, 42L).toDF("id"))
    TableLog.upsertBatch(spark, src,
      Seq((50L, "UP"), (5000L, "NEW")).toDF("id", "p"), Seq("id"), "b0")
    // plain SELECT: the optimizer rewrite (or scan floor) compensates
    assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$src`")
      .as[Long].head() === 299L)
    assert(spark.sql(
      s"SELECT p FROM tablelog.`$src` WHERE id = 50").as[String].head()
      === "UP")
    // the round-15 resurrection shapes: bare CTAS then INSERT-SELECT
    spark.sql(
      s"CREATE TABLE tablelog.`$dst` AS SELECT * FROM tablelog.`$src`")
    assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$dst`")
      .as[Long].head() === 299L)
    spark.sql(
      s"INSERT INTO tablelog.`$dst` SELECT * FROM tablelog.`$src`")
    assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$dst`")
      .as[Long].head() === 598L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tablelog.`$dst` WHERE id IN (7, 42)")
      .as[Long].head() === 0L, "deleted keys must not resurrect in copies")
    // df.write V1-fallback re-plan: the third resurrection shape
    val out = freshPath("graft-spec-eq-sql-out")
    spark.table(s"tablelog.`$src`").write.parquet(out)
    assert(spark.read.parquet(out).count() === 299L)
  }

  test("scan-floor compensation: rule excluded, pruned-away key cols forced") {
    graft.sql.TableLogSql.register(spark)
    val src = freshPath("graft-spec-eq-floor")
    TableLog.create(spark, src,
      (0L until 200L).map(i => (i, s"p$i", i % 5)).toDF("id", "p", "g")
        .repartitionByRange(2, $"id"))
    TableLog.deleteByKey(spark, src, Seq(3L, 100L).toDF("id"))
    // the correctness floor must hold with NO optimizer rewrite at all
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.sql.TableLogDvReadRewrite")
    try {
      val cnt = spark.sql(s"SELECT count(*) AS n FROM tablelog.`$src`")
      assert(cnt.as[Long].head() === 198L)
      assert(cnt.queryExecution.executedPlan.toString.contains("TableLogDvScan"),
        s"expected the compensated scan in:\n${cnt.queryExecution.executedPlan}")
      // project AWAY the key column: the scan must force `id` into its
      // read schema to evaluate membership, then serve only `p`
      val ps = spark.sql(s"SELECT p FROM tablelog.`$src`")
      assert(ps.count() === 198L)
      assert(!ps.collect().map(_.getString(0)).toSet.contains("p100"))
      // pushed filters still cut below the compensation
      assert(spark.sql(
        s"SELECT id FROM tablelog.`$src` WHERE id BETWEEN 99 AND 102 ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(99L, 101L, 102L))
      // a DV'd AND eq-deleted file: both filters apply in one reader
      spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
      try spark.sql(s"DELETE FROM tablelog.`$src` WHERE id = 7")
      finally spark.conf.unset("spark.graft.tablelog.deletionVectors")
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$src`")
        .as[Long].head() === 197L)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("write amplification duel: an upsert epoch writes <1% of merge bytes") {
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
    // copy-on-write merge: both matched files rewrite (~half the table)
    val cow = newTable("graft-spec-eq-duel-cow")
    val cowBefore = bytesUnder(cow, "data")
    TableLog.merge(spark, cow, src.toDF("id", "p"), "id")
    val cowWritten = bytesUnder(cow, "data") - cowBefore
    assert(cowWritten > cowBefore / 8, "sanity: real file rewrites happened")
    // equality-delete upsert: one key sidecar + the 3 source rows,
    // and NO discovery read of existing data at all
    val eq = newTable("graft-spec-eq-duel-eq")
    val eqBefore = bytesUnder(eq, "data")
    TableLog.upsertBatch(spark, eq, src.toDF("id", "p"), Seq("id"), "b0")
    val eqWritten =
      (bytesUnder(eq, "data") - eqBefore) + bytesUnder(eq, "_eqd")
    assert(eqWritten > 0L)
    assert(eqWritten * 100 < cowWritten,
      s"upsert must write <1% of copy-on-write merge: $eqWritten vs ~$cowWritten")
    assert(rows(TableLog.read(spark, cow)) === rows(TableLog.read(spark, eq)),
      "both upsert modes converge to the same table")
  }

  test("streaming upsert sink: epochs land exactly-once, last write wins") {
    val path = freshPath("graft-spec-eq-stream")
    TableLog.create(spark, path,
      Seq((0L, "seed")).toDF("id", "p"))
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = graft.streaming.StreamingOps.tableLogUpsertSink(
      source.toDF().toDF("id", "p"), path, Seq("id"))
      .option("checkpointLocation", freshPath("graft-spec-eq-stream-ck"))
      .start()
    try {
      source.addData((1L, "e0-1"), (2L, "e0-2"))
      q.processAllAvailable()
      source.addData((1L, "e1-1"), (3L, "e1-3"))
      q.processAllAvailable()
      val got = TableLog.read(spark, path)
      assert(rows(got) === Set(
        Seq(0L, "seed"), Seq(1L, "e1-1"), Seq(2L, "e0-2"), Seq(3L, "e1-3")))
    } finally q.stop()
    // the plain table STREAM refuses eq commits as change commits
    val e = intercept[Exception] {
      val q2 = spark.readStream.table(s"tablelog.`$path`")
        .writeStream.format("memory").queryName("eqstream_refuse")
        .option("checkpointLocation", freshPath("graft-spec-eq-stream-ck2"))
        .start()
      try { q2.processAllAvailable(); q2.stop() } finally
        if (q2.isActive) q2.stop()
    }
    assert(e.getMessage.contains("APPENDS") ||
      Option(e.getCause).exists(_.getMessage.contains("APPENDS")))
  }

  test("SQL DELETE routes key shapes to equality sidecars under the conf") {
    graft.sql.TableLogSql.register(spark)
    val path = freshPath("graft-spec-eq-sqlroute")
    TableLog.create(spark, path,
      (0L until 800L).map(i => (i, s"p$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))
    spark.conf.set("spark.graft.tablelog.equalityDeletes", "true")
    try {
      val before = dataFiles(path)
      spark.sql(s"DELETE FROM tablelog.`$path` WHERE id IN (5, 300, 799)")
      spark.sql(s"DELETE FROM tablelog.`$path` WHERE id = 6")
      assert(dataFiles(path) === before,
        "key-shaped SQL DELETEs must not read or touch data files")
      assert(eqDirs(path).size === 2)
      assert(TableLog.snapshot(spark, path).hasEqDeletes)
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$path`")
        .as[Long].head() === 796L)
      // a non-key shape (band) falls through to the predicate path
      spark.sql(s"DELETE FROM tablelog.`$path` WHERE id < 3")
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$path`")
        .as[Long].head() === 793L)
      assert(eqDirs(path).size === 2, "a band delete is not an eq delete")
    } finally spark.conf.unset("spark.graft.tablelog.equalityDeletes")
  }

  test("merge routes to equality deletes under the conf: no discovery, no rewrites") {
    graft.sql.TableLogSql.register(spark)
    val path = freshPath("graft-spec-eq-merge")
    TableLog.create(spark, path,
      (0L until 600L).map(i => (i, s"v0-$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))                           // v1
    spark.conf.set("spark.graft.tablelog.equalityDeletes", "true")
    try {
      val before = dataFiles(path)
      TableLog.merge(spark, path,
        Seq((5L, "UP-5"), (405L, "UP-405"), (1000L, "NEW"))
          .toDF("id", "p"), "id")                                // v2
      assert(before.subsetOf(dataFiles(path)),
        "eq-routed merge must never read or rewrite a data file")
      assert(TableLog.snapshot(spark, path).hasEqDeletes)
      assert(eqDirs(path).size === 1)
      val got = TableLog.read(spark, path)
      assert(got.count() === 601L)
      assert(rows(got.where($"id".isin(5L, 405L, 1000L))) === Set(
        Seq(5L, "UP-5"), Seq(405L, "UP-405"), Seq(1000L, "NEW")))
      assert(TableLog.read(spark, path, Some(1L)).count() === 600L)
      // SQL whole-row MERGE takes the same route
      Seq((5L, "SQL-5"), (2000L, "SQL-NEW")).toDF("id", "p")
        .createOrReplaceTempView("eqmrg_src")
      val before2 = dataFiles(path)
      spark.sql(
        s"""MERGE INTO tablelog.`$path` t USING eqmrg_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)       // v3
      assert(before2.subsetOf(dataFiles(path)),
        "SQL whole-row MERGE must route through the eq path too")
      assert(eqDirs(path).size === 2)
      val got2 = TableLog.read(spark, path)
      assert(got2.count() === 602L)
      assert(rows(got2.where($"id".isin(5L, 2000L))) === Set(
        Seq(5L, "SQL-5"), Seq(2000L, "SQL-NEW")))
    } finally spark.conf.unset("spark.graft.tablelog.equalityDeletes")
  }

  test("upsert on a PARTITIONED table: hive-dir appends, partition reads apply") {
    val path = freshPath("graft-spec-eq-part")
    TableLog.createPartitioned(spark, path,
      (0L until 300L).map(i => (i, s"p${i % 3}", s"v0-$i"))
        .toDF("id", "lang", "payload").repartition(2), Seq("lang"))   // v1
    val before = dataFiles(path)
    // id 5 lived in lang=p2 (5 % 3); the upsert MOVES it to p0 — a
    // partition move, which eq deletes handle for free (the key
    // delete is partition-agnostic, the new copy lands in its hive
    // dir) where a partition-scoped delete could not
    TableLog.upsertBatch(spark, path,
      Seq((5L, "p0", "moved"), (900L, "p1", "new"))
        .toDF("id", "lang", "payload"),
      Seq("id"), "b0")                                                // v2
    assert(before.subsetOf(dataFiles(path)),
      "partitioned upsert must never rewrite existing hive files")
    val got = TableLog.read(spark, path)
    assert(got.count() === 301L)
    assert(rows(got.where($"id".isin(5L, 900L))
      .select("id", "lang", "payload")) === Set(
      Seq(5L, "p0", "moved"), Seq(900L, "p1", "new")))
    // partition-pruned reads apply the delete on BOTH sides of the move
    assert(TableLog.readPartition(spark, path, Map("lang" -> "p2"))
      .where($"id" === 5L).count() === 0L, "old copy is dead in p2")
    assert(TableLog.readPartition(spark, path, Map("lang" -> "p0"))
      .where($"id" === 5L).select("payload")
      .as[String].collect().toSeq === Seq("moved"))
    assert(TableLog.read(spark, path, Some(1L)).count() === 300L)
  }

  test("vacuum sweeps folded eq sidecars, keeps live ones") {
    val path = freshPath("graft-spec-eq-vacuum")
    TableLog.create(spark, path,
      (0L until 500L).map(i => (i, s"p$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))                           // v1
    TableLog.deleteByKey(spark, path, Seq(5L).toDF("id"))        // v2
    TableLog.deleteByKey(spark, path, Seq(6L).toDF("id"))        // v3
    assert(eqDirs(path).size === 2)
    spark.conf.set("spark.graft.tablelog.retentionMs", "0")
    try {
      // both manifests still retained: nothing sweeps
      TableLog.vacuum(spark, path, keepVersions = 3)
      assert(eqDirs(path).size === 2)
      // fold, then retain only post-fold versions: sidecars leave
      TableLog.optimizeRange(spark, path, "id", numFiles = 2)    // v4
      TableLog.vacuum(spark, path, keepVersions = 1)
      assert(eqDirs(path).isEmpty, "folded sidecars are unreferenced debris")
      assert(TableLog.read(spark, path).count() === 498L)
    } finally spark.conf.unset("spark.graft.tablelog.retentionMs")
  }
}
