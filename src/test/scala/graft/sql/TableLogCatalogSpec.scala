package graft.sql

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.operators.TableLog

/** Pins the DSv2 SQL surface over TableLog: plain SELECT equals the
  * programmatic read, WHERE predicates cut the planned file list
  * against the manifest (counted files, zero footers), total pruning
  * plans ZERO files, VERSION/TIMESTAMP AS OF time travel, INSERT INTO
  * as a committed version, and CREATE TABLE ... PARTITIONED BY with
  * partition-pruned SQL reads.
  */
class TableLogCatalogSpec extends GraftSparkSpec {

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

  test("SELECT equals read; band WHERE prunes files from the manifest; total prune plans zero") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql")
    val base = (0L until 4000L).map(i => (i, i % 7, s"d$i")).toDF("id", "g", "s")
    TableLog.create(spark, path, base.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)

    val all = spark.sql(s"SELECT * FROM tablelog.`$path`")
    assert(rows(all) === rows(base))
    assert(TableLogSql.lastPlanned(path) === Some((8, 8)))

    val band = spark.sql(
      s"SELECT id, g FROM tablelog.`$path` WHERE id >= 600 AND id <= 900")
    assert(rows(band) === rows(base.where(col("id").between(600, 900))
      .select(col("id"), col("g"))))
    val (kept, total) = TableLogSql.lastPlanned(path).get
    assert(total === 8)
    assert(kept <= 2, s"500-wide band over 8 files of 500 rows: planned $kept")

    val eq = spark.sql(s"SELECT s FROM tablelog.`$path` WHERE id = 1234")
    assert(eq.collect().map(_.getString(0)).toSeq === Seq("d1234"))
    assert(TableLogSql.lastPlanned(path).get._1 === 1)

    val none = spark.sql(s"SELECT * FROM tablelog.`$path` WHERE id > 100000")
    assert(none.count() === 0L)
    assert(TableLogSql.lastPlanned(path).get._1 === 0, "total prune plans zero files")
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve manifest versions; INSERT INTO commits") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-tt")
    val b1 = (0L until 100L).map(i => (i, s"a$i")).toDF("id", "s")
    TableLog.create(spark, path, b1.repartition(2))
    Thread.sleep(20) // strictly increasing commit timestamps
    spark.sql(s"INSERT INTO tablelog.`$path` VALUES (200, 'x'), (201, 'y')")

    assert(TableLog.latestVersion(spark, path) === 2L,
      "INSERT INTO committed a version")
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path`")) ===
      rows(b1) ++ Set(Seq(200L, "x"), Seq(201L, "y")))
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path` VERSION AS OF 1")) ===
      rows(b1))

    val ts1 = TableLog.commitTimestamp(spark, path, 1L).get
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    val lit1 = fmt.format(java.time.Instant.ofEpochMilli(ts1))
    assert(rows(spark.sql(
      s"SELECT * FROM tablelog.`$path` TIMESTAMP AS OF '$lit1'")) === rows(b1))

    // time-traveled versions are read-only
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO tablelog.`$path` VERSION AS OF 1 VALUES (1, 'z')")
    }
    assert(e != null)
  }

  test("UPDATE SET WHERE: copy-on-write of matched files only, committed version") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-upd")
    val base = (0L until 4000L).map(i => (i, i % 7, s"s$i")).toDF("id", "g", "s")
    TableLog.create(spark, path, base.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)

    spark.sql(s"UPDATE tablelog.`$path` SET g = g + 100, s = concat(s, '!') " +
      "WHERE id >= 600 AND id <= 900")
    assert(TableLog.latestVersion(spark, path) === 3L, "UPDATE commits a version")
    val expect = base.select(col("id"),
      when(col("id").between(600, 900), col("g") + 100).otherwise(col("g")).as("g"),
      when(col("id").between(600, 900), concat(col("s"), lit("!")))
        .otherwise(col("s")).as("s"))
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path`")) === rows(expect))
    assert(rows(TableLog.read(spark, path, Some(2L))) === rows(base),
      "pre-update version intact")

    // only files overlapping the narrow band rewrite
    val before = TableLog.files(spark, path, Some(2L)).toSet
    val after = TableLog.files(spark, path, Some(3L)).toSet
    assert((before & after).size >= 5, "untouched files carry over by name")

    // updating a partitioned table's partition column is refused
    val p2 = freshPath("graft-spec-tlsql-upd2")
    spark.sql(s"CREATE TABLE tablelog.`$p2` (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO tablelog.`$p2` VALUES (1, 'en'), (2, 'de')")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE tablelog.`$p2` SET lang = 'fr' WHERE id = 1")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("partition columns are not assignable")),
      msgs(e).mkString(" | "))
    // data-column update on the partitioned table works, dirs intact
    spark.sql(s"UPDATE tablelog.`$p2` SET id = id * 10 WHERE lang = 'en'")
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$p2`")) ===
      Set(Seq(10L, "en"), Seq(2L, "de")))
  }

  test("CTAS and DataFrameWriterV2 land through the catalog") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-ctas")
    val base = (0L until 200L).map(i => (i, i % 5)).toDF("id", "g")
    base.createOrReplaceTempView("tlctas_src")

    // CREATE TABLE AS SELECT: createTable + append through the v1 path
    spark.sql(s"CREATE TABLE tablelog.`$path` AS SELECT id, g FROM tlctas_src")
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path`")) === rows(base))
    assert(TableLog.latestVersion(spark, path) >= 1L)

    // DataFrameWriterV2 append
    (200L until 250L).map(i => (i, i % 5)).toDF("id", "g")
      .writeTo(s"tablelog.`$path`").append()
    assert(spark.sql(s"SELECT count(*) AS c FROM tablelog.`$path`")
      .collect().head.getLong(0) === 250L)
  }

  test("null counts: COUNT(col) pushes to the manifest; IS [NOT] NULL prunes files") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-nulls")
    // batch A: x fully null; batch B: x null for odd ids only
    val a = (0L until 500L).map(i => (i, None: Option[Long])).toDF("id", "x")
    val b = (500L until 1000L)
      .map(i => (i, if (i % 2 == 0) Some(i) else None)).toDF("id", "x")
    TableLog.create(spark, path, a.repartition(2))
    TableLog.append(spark, path, b.repartition(2))

    def assertLocal(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
        s"must collapse to LocalTableScan:\n$plan")
    }

    // COUNT(col) = rows - nulls, manifest-only (with min/max over the
    // mixed-null column: all-null files contribute no values)
    val g = spark.sql(
      s"SELECT count(*) AS n, count(x) AS nx, min(x) AS lo, max(x) AS hi " +
        s"FROM tablelog.`$path`")
    assertLocal(g)
    assert(g.collect().map(_.toSeq).toSeq === Seq(Seq(1000L, 250L, 500L, 998L)))

    // IS NOT NULL prunes the all-null batch's files from the scan
    val nn = spark.sql(
      s"SELECT id FROM tablelog.`$path` WHERE x IS NOT NULL")
    assert(nn.count() === 250L)
    val (kept, total) = TableLogSql.lastPlanned(path).get
    assert(kept < total, s"all-null files must prune: $kept/$total")

    // IS NULL keeps everything (batch B's files have SOME nulls)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tablelog.`$path` WHERE x IS NULL")
      .collect().head.getLong(0) === 750L)
  }

  test("MERGE INTO: whole-row upsert through SQL; other shapes refused with a pointer") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-mrg")
    val base = (0L until 1000L).map(i => (i, i % 7, s"v$i")).toDF("id", "g", "s")
    TableLog.create(spark, path, base.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)

    (0L until 50L).map(i => (i, 999L, s"upd$i"))
      .union((2000L until 2020L).map(i => (i, 1L, s"new$i")))
      .toDF("id", "g", "s").createOrReplaceTempView("tlmrg_src")

    spark.sql(
      s"""MERGE INTO tablelog.`$path` t USING tlmrg_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val expect = base.where(col("id") >= 50L)
      .union((0L until 50L).map(i => (i, 999L, s"upd$i")).toDF("id", "g", "s"))
      .union((2000L until 2020L).map(i => (i, 1L, s"new$i")).toDF("id", "g", "s"))
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path`")) === rows(expect))

    // candidate region: only files overlapping the source key range
    // rewrite; the middle of the id-clustered layout carries over
    val before = TableLog.files(spark, path, Some(2L)).toSet
    val after = TableLog.files(spark, path, Some(3L)).toSet
    assert((before & after).size >= 5, "files outside the key range carry over")

    // general shape: conditional DELETE + partial conditional UPDATE
    spark.sql(
      s"""MERGE INTO tablelog.`$path` t USING tlmrg_src s ON t.id = s.id
         |WHEN MATCHED AND s.g = 999 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET g = t.g + s.g""".stripMargin)
    // flags: source rows with g=999 (ids 0..49) delete their matches;
    // the new-id rows (g=1) matched nothing last round... they DO
    // exist now (inserted above), so they update g += 1
    val expect2 = expect
      .where(!(col("id") < 50L))  // upserted ids 0..49 had g=999 -> deleted
      .withColumn("g",
        when(col("id") >= 2000L, col("g") + 1L).otherwise(col("g")))
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path`")) === rows(expect2))

    // NOT MATCHED BY SOURCE (round-14): deletes-by-absence — target
    // rows the source no longer carries leave under the guard
    spark.sql(
      s"""MERGE INTO tablelog.`$path` t USING tlmrg_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET g = s.g
         |WHEN NOT MATCHED BY SOURCE AND t.id < 500 THEN DELETE""".stripMargin)
    // matched survivors (ids 2000+) take the source g; unmatched
    // ids < 500 drop; unmatched ids >= 500 survive untouched
    val expect3 = expect2
      .where(col("id") >= 500L)
      .withColumn("g", when(col("id") >= 2000L, lit(1L)).otherwise(col("g")))
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path`")) === rows(expect3))

    // a same-side ON condition is NOT a key equijoin — refused, never
    // silently rewritten
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO tablelog.`$path` t USING tlmrg_src s ON t.id = t.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("ON condition")), msgs(e).mkString(" | "))
  }

  test("metadata tables: $files/$partitions/$history/$tags as JOIN-able relations") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-meta")
    val base = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    spark.sql(s"CREATE TABLE tablelog.`$path` (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    base.createOrReplaceTempView("tlmeta_src")
    spark.sql(s"INSERT INTO tablelog.`$path` SELECT id, lang FROM tlmeta_src")

    val files = spark.sql(s"SELECT * FROM tablelog.`$path$$files`")
    assert(files.columns.toSeq === Seq("file", "rows", "partition"))
    val snap = TableLog.snapshot(spark, path)
    assert(files.count() === snap.files.size.toLong)
    assert(files.agg(sum(col("rows"))).collect().head.getLong(0) === 300L)

    val parts = spark.sql(
      s"SELECT * FROM tablelog.`$path$$partitions` ORDER BY partition")
      .collect().map(_.toSeq)
    assert(parts.map(_.head).toSeq === Seq("lang=de", "lang=en"))
    assert(parts.map(_(2)).toSeq === Seq(200L, 100L))

    assert(spark.sql(s"SELECT * FROM tablelog.`$path$$history`")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 0L), (2L, 300L)))
    assert(spark.sql(s"SELECT count(*) FROM tablelog.`$path$$tags`")
      .collect().head.getLong(0) === 0L)

    // $files honors VERSION AS OF (the empty CREATE version)
    assert(spark.sql(
      s"SELECT * FROM tablelog.`$path$$files` VERSION AS OF 1").count() === 0L)
  }

  test("streaming maxVersionsPerTrigger bounds each micro-batch's version range") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-rate")
    val ckpt = freshPath("graft-spec-tlsql-rate-ckpt")
    TableLog.create(spark, path, (0L until 10L).map(i => (i, i)).toDF("id", "w"))
    (1 to 4).foreach { k =>
      TableLog.append(spark, path,
        (0L until 10L).map(i => (k * 100L + i, i)).toDF("id", "w"))
    } // v2..v5
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .option("fromVersion", "1")
      .option("maxVersionsPerTrigger", "2")
      .table(s"tablelog.`$path`")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batches.add(b.count())
          ()
      }.start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val sizes = batches.asScala.toSeq.filter(_ > 0)
      assert(sizes.sum === 40L, "all four appended versions arrive")
      assert(sizes.forall(_ <= 20L),
        s"each batch covers at most 2 versions (20 rows): $sizes")
      assert(sizes.size >= 2, "the catch-up splits into multiple batches")
    } finally q.stop()
  }

  test("CALL procedures: optimize/compact/history/restore/vacuum/tags through SQL") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-proc")
    val base = (0L until 2000L).map(i => (i, i % 7)).toDF("id", "g")
    TableLog.create(spark, path, base.repartition(4))

    assert(spark.sql(s"CALL tablelog.optimize('$path', 'id', 8)")
      .collect().head.getLong(0) === 2L)
    // the clustering is real: a narrow band plans few files
    spark.sql(s"SELECT * FROM tablelog.`$path` WHERE id BETWEEN 100 AND 200")
      .count()
    assert(TableLogSql.lastPlanned(path).get._1 <= 2)

    assert(spark.sql(s"CALL tablelog.compact('$path', 1000)")
      .collect().head.getLong(0) === 3L)

    val hist = spark.sql(s"CALL tablelog.history('$path')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hist === Set((1L, 2000L), (2L, 2000L), (3L, 2000L)))

    spark.sql(s"CALL tablelog.restore('$path', 2)")
    assert(TableLog.files(spark, path, Some(4L)) ===
      TableLog.files(spark, path, Some(2L)), "restore re-commits v2's files")

    assert(spark.sql(s"CALL tablelog.vacuum('$path', 2)")
      .collect().head.getLong(0) === 3L, "watermark after keep-2 vacuum")

    assert(spark.sql(s"CALL tablelog.tags('$path')").count() === 0L)

    val auto = spark.sql(
      s"CALL tablelog.auto_optimize('$path', 'id,g', 8)").collect().head
    assert(auto.getLong(0) >= 5L, "advisor ran (commits a version unless 'none')")
    assert(auto.getString(1).nonEmpty)
    assert(auto.getLong(0) === TableLog.latestVersion(spark, path))

    val e = intercept[Exception] {
      spark.sql(s"CALL tablelog.nonsense('$path')")
    }
    assert(e.getMessage.contains("unknown procedure") ||
      e.getMessage.contains("FAILED_TO_LOAD_ROUTINE"))
  }

  test("readStream.table: snapshot then appends; rewrite fails; skipChangeCommits skips it") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-stream")
    val ckpt = freshPath("graft-spec-tlsql-stream-ckpt")
    val base = (0L until 100L).map(i => (i, i % 7)).toDF("id", "g")
    TableLog.create(spark, path, base.repartition(2))

    val got = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Any]]()
    def run(skip: Boolean) = {
      val r = spark.readStream
      (if (skip) r.option("skipChangeCommits", "true") else r)
        .table(s"tablelog.`$path`")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.collect().foreach(r => got.add(r.toSeq))
            ()
        }.start()
    }

    val q1 = run(skip = false)
    try {
      q1.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet === rows(base), "initial batch = table snapshot")
      TableLog.append(spark, path,
        (100L until 110L).map(i => (i, i % 7)).toDF("id", "g"))   // v2
      q1.processAllAvailable()
      assert(got.size === 110, "append streams as a micro-batch")
      // a delete REWRITES files: the append stream must fail loudly
      TableLog.deleteBand(spark, path, "id", 0L, 9L)              // v3
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("serves APPENDS")), msgs(e).mkString(" | "))
    } finally q1.stop()

    // restart with skipChangeCommits: v3 (a change commit) is skipped
    // wholesale — its survivor-rewrite files must NOT stream as appends
    got.clear()
    val q2 = run(skip = true)
    try {
      q2.processAllAvailable()
      assert(got.isEmpty, "change commit skipped, no survivor duplicates")
      TableLog.append(spark, path,
        (200L until 205L).map(i => (i, i % 7)).toDF("id", "g"))   // v4
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet ===
        (200L until 205L).map(i => Seq(i, i % 7)).toSet,
        "appends after the skipped change commit stream normally")
    } finally q2.stop()
  }

  test("LIMIT plans only enough files to cover it (partial push, exact row count)") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-lim")
    val base = (0L until 4000L).map(i => (i, i % 7)).toDF("id", "g")
    TableLog.create(spark, path, base.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)

    assert(spark.sql(s"SELECT * FROM tablelog.`$path` LIMIT 700").count() === 700L)
    val (kept, total) = TableLogSql.lastPlanned(path).get
    assert(total === 8)
    assert(kept <= 3, s"700 rows over ~500-row files: planned $kept")

    assert(spark.sql(s"SELECT id FROM tablelog.`$path` LIMIT 10").count() === 10L)
    assert(TableLogSql.lastPlanned(path).get._1 === 1, "LIMIT 10 plans one file")

    // LIMIT below a non-exact WHERE must NOT cut by counts (the
    // filter is residual; Spark doesn't push the limit then)
    val f = spark.sql(
      s"SELECT * FROM tablelog.`$path` WHERE g = 3 LIMIT 10")
    assert(f.count() === 10L)
  }

  test("COUNT/MIN/MAX answer from the manifest alone: LocalTableScan, zero file reads") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-agg")
    val base = (0L until 3000L)
      .map(i => (i, i * 2 + 1, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "n", "lang")
    spark.sql(
      s"CREATE TABLE tablelog.`$path` (id BIGINT, n BIGINT, lang STRING) " +
        "PARTITIONED BY (lang)")
    base.createOrReplaceTempView("tlagg_src")
    spark.sql(s"INSERT INTO tablelog.`$path` SELECT id, n, lang FROM tlagg_src")

    def assertLocal(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
        s"aggregate must collapse to a LocalTableScan:\n$plan")
    }

    val g = spark.sql(s"SELECT count(*) AS c, min(id) AS lo, max(n) AS hi " +
      s"FROM tablelog.`$path`")
    assertLocal(g)
    assert(TableLogSql.tookAggServed(path))
    assert(g.collect().map(_.toSeq).toSeq === Seq(Seq(3000L, 0L, 5999L)))

    // partition-filtered count: the equality is served exactly by the
    // partition record, so the aggregate still pushes
    val f = spark.sql(
      s"SELECT count(*) AS c FROM tablelog.`$path` WHERE lang = 'en'")
    assertLocal(f)
    assert(f.collect().head.getLong(0) === 1500L)

    // GROUP BY partition column from the partition record
    val byLang = spark.sql(
      s"SELECT lang, count(*) AS c, max(id) AS hi FROM tablelog.`$path` " +
        "GROUP BY lang")
    assertLocal(byLang)
    assert(byLang.collect().map(_.toSeq).toSet ===
      Set(Seq("en", 1500L, 2998L), Seq("de", 1500L, 2999L)))

    // a data-column WHERE keeps residual work: falls back to the scan
    val res = spark.sql(
      s"SELECT count(*) AS c FROM tablelog.`$path` WHERE id < 100")
    assert(!TableLogSql.tookAggServed(path) ||
      !res.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(res.collect().head.getLong(0) === 100L)

    // sanity on an unpartitioned table with deletes in history
    val p2 = freshPath("graft-spec-tlsql-agg2")
    TableLog.create(spark, p2, base.select(col("id"), col("n")).repartition(4))
    TableLog.optimizeRange(spark, p2, "id", numFiles = 8)
    TableLog.deleteBand(spark, p2, "id", 0L, 999L)
    val g2 = spark.sql(s"SELECT count(*) AS c, min(id) AS lo FROM tablelog.`$p2`")
    assertLocal(g2)
    assert(g2.collect().map(_.toSeq).toSeq === Seq(Seq(2000L, 1000L)))
  }

  test("DELETE FROM commits a version; prior versions intact; time-traveled delete refused") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-del")
    val base = (0L until 4000L).map(i => (i, i % 7)).toDF("id", "g")
    TableLog.create(spark, path, base.repartition(4))
    TableLog.optimizeRange(spark, path, "id", numFiles = 8)

    spark.sql(s"DELETE FROM tablelog.`$path` WHERE id < 500 OR id >= 3800")
    assert(TableLog.latestVersion(spark, path) === 3L)
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path`")) ===
      rows(base.where(col("id") >= 500 && col("id") < 3800)))
    assert(rows(spark.sql(s"SELECT * FROM tablelog.`$path` VERSION AS OF 2")) ===
      rows(base), "pre-delete version intact")

    // band delete rewrites only overlapping files: of v2's 8
    // id-clustered files, the middle ones (range-partition boundaries
    // are approximate) must carry over by name
    val before = TableLog.files(spark, path, Some(2L)).toSet
    val after = TableLog.files(spark, path, Some(3L)).toSet
    assert((before & after).size >= 5, "untouched files carry over by name")
    assert((before -- after).size <= 3, "only edge files rewrite")
  }

  test("CREATE TABLE ... PARTITIONED BY; INSERT INTO; partition-equality SQL read prunes") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-part")
    spark.sql(
      s"CREATE TABLE tablelog.`$path` (id BIGINT, n BIGINT, lang STRING) " +
        "PARTITIONED BY (lang)")
    val df = (0L until 300L)
      .map(i => (i, i * 10, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("id", "n", "lang")
    df.createOrReplaceTempView("tlsql_src")
    spark.sql(s"INSERT INTO tablelog.`$path` SELECT id, n, lang FROM tlsql_src")

    val all = spark.sql(s"SELECT * FROM tablelog.`$path`")
    assert(rows(all) === rows(df))

    val en = spark.sql(
      s"SELECT id, n FROM tablelog.`$path` WHERE lang = 'en'")
    assert(rows(en) === rows(df.where(col("lang") === "en")
      .select(col("id"), col("n"))))
    val (kept, total) = TableLogSql.lastPlanned(path).get
    assert(kept < total,
      s"partition equality must prune from the manifest: $kept/$total")

    val snap = TableLog.snapshot(spark, path)
    val idx = snap.partCols.indexOf("lang")
    val enFiles = snap.files.count(n => snap.parts(n)(idx) == "en")
    assert(kept === enFiles, "planned exactly the partition's files")
  }
  test("writeStream.toTable: executor-written epochs, exactly-once under forced replay") {
    TableLogSql.register(spark)
    val src = freshPath("graft-spec-tlsql-swr-src")
    val dst = freshPath("graft-spec-tlsql-swr-dst")
    val ckpt = freshPath("graft-spec-tlsql-swr-ckpt")
    TableLog.create(spark, src,
      (0L until 100L).map(i => (i, i)).toDF("id", "w"))       // src v1
    TableLog.create(spark, dst,
      (9000L until 9010L).map(i => (i, i)).toDF("id", "w"))   // dst seeded
    def runOnce(): Unit = {
      val q = spark.readStream
        .option("fromVersion", "0")
        .table(s"tablelog.`$src`")
        .writeStream
        .option("checkpointLocation", ckpt)
        .toTable(s"tablelog.`$dst`")
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    def cnt(): Long = spark.sql(
      s"SELECT count(*) AS n FROM tablelog.`$dst`").collect().head.getLong(0)
    assert(cnt() === 110L, "epoch 0 appended the source snapshot")
    // restart the query on the same checkpoint with new source data
    TableLog.append(spark, src,
      (100L until 150L).map(i => (i, i)).toDF("id", "w"))     // src v2
    runOnce()
    assert(cnt() === 160L, "restart consumed only the new commit")

    // forced replay: delete the last commits marker so the restarted
    // query RE-EXECUTES the final epoch — fresh files get written,
    // the committed tag is recognized, duplicates are dropped
    val fsys = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fsys.listStatus(
      new org.apache.hadoop.fs.Path(s"$ckpt/commits")).map(_.getPath)
      .filter(_.getName.forall(_.isDigit))
    val last = commits.maxBy(_.getName.toLong)
    assert(fsys.delete(last, false))
    runOnce()
    assert(cnt() === 160L, "replayed epoch must land exactly once")
    // every referenced file exists; duplicate staged files are not
    // referenced by the manifest
    val snap = TableLog.snapshot(spark, dst)
    snap.files.foreach { n =>
      assert(fsys.exists(new org.apache.hadoop.fs.Path(
        s"${TableLog.dataPath(dst)}/$n")), s"manifest references missing $n")
    }
    // the streamed rows really are the source rows (content check)
    assert(rows(spark.sql(s"SELECT id, w FROM tablelog.`$dst`")) ===
      rows(((0L until 150L) ++ (9000L until 9010L)).map(i => (i, i))
        .toDF("id", "w")))
  }

  test("complete-mode writeStream.toTable fails loudly — never silent snapshot re-appends") {
    // the table advertises TRUNCATE (for batch INSERT OVERWRITE), so a
    // complete-mode streaming aggregation passes Spark's capability
    // check; the write itself must refuse non-append streaming modes
    // instead of appending every epoch's full snapshot
    TableLogSql.register(spark)
    val dst = freshPath("graft-spec-tlsql-complete-dst")
    val ckpt = freshPath("graft-spec-tlsql-complete-ckpt")
    TableLog.create(spark, dst, Seq((0L, 1L)).toDF("g", "count"))
    val agg = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .selectExpr("value % 2 AS g").groupBy("g").count()
    val e = intercept[Exception] {
      val q = agg.writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .toTable(s"tablelog.`$dst`")
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("only APPEND")),
      s"want the loud refusal, got: ${chain(e).mkString(" | ")}")
    // nothing landed: the seeded row is still the whole table
    assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$dst`")
      .collect().head.getLong(0) === 1L)
  }

  test("string MIN/MAX: exact footer bounds serve from the manifest, truncated fall back") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-strb")
    // non-ASCII values pin the unsigned-byte (UTF-8) order: 'é' sorts
    // ABOVE 'z' in byte order (0xC3 > 0x7A) though below in UTF-16
    val data = Seq(
      (1L, "apple"), (2L, "zebra"), (3L, "épée"), (4L, "Banana"),
      (5L, "mango"), (6L, "!bang"), (7L, "yak"), (8L, "kiwi"))
      .toDF("id", "s")
    TableLog.create(spark, path, data.repartitionByRange(3, col("id")))
    val q = s"SELECT min(s) AS lo, max(s) AS hi, count(*) AS n " +
      s"FROM tablelog.`$path`"
    val served = spark.sql(q)
    served.queryExecution.executedPlan
    assert(TableLogSql.tookAggServed(path),
      "exact string bounds must serve from the manifest")
    val r = served.collect().head
    assert((r.getString(0), r.getString(1), r.getLong(2)) ===
      (("!bang", "épée", 8L)))

    // rewrite with footer-stat truncation: bounds record kind "t",
    // serving refuses, the scan answers (still correctly)
    TableLog.optimizeBloom(spark, path, Seq("id"), 2,
      extraWriterOptions = Map("parquet.statistics.truncate.length" -> "2"))
    val snap = TableLog.snapshot(spark, path)
    val kinds = snap.files.flatMap(n =>
      snap.stats.get(n).flatMap(_.get("s")).map(_.kind)).toSet
    assert(kinds === Set("t"),
      s"truncated stats must classify inexact, got kinds $kinds")
    val after = spark.sql(q)
    after.queryExecution.executedPlan
    assert(!TableLogSql.tookAggServed(path),
      "possibly-truncated bounds must never serve MIN/MAX")
    val r2 = after.collect().head
    assert((r2.getString(0), r2.getString(1), r2.getLong(2)) ===
      (("!bang", "épée", 8L)))
    // pruning with truncated bounds stays sound (superset range)
    assert(TableLog.readBand(spark, path, "s", "kiwi", "mango")
      .collect().map(_.getString(1)).toSet === Set("kiwi", "mango"))
  }

  test("LEGACY manifests (no fmt marker) downgrade string 's' bounds to prune-only") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-legacyfmt")
    TableLog.create(spark, path,
      Seq((1L, "apple"), (2L, "zebra"), (3L, "kiwi"))
        .toDF("id", "s").repartition(1))
    // simulate a pre-exactness manifest: strip the fmt field from the
    // committed JSON (legacy writers recorded kind "s" unconditionally
    // — even for truncated stats — so "s" there proves nothing)
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(s"$path/_log/v0000001.json")
    val body = {
      val in = fsys.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(body.contains("\"fmt\":"), "current manifests carry the marker")
    val legacy = body.replaceFirst("""\"fmt\":\d+,""", "")
    fsys.delete(mp, false)
    val out = fsys.create(mp, true)
    out.write(legacy.getBytes("UTF-8"))
    out.close()
    // string MIN/MAX must NOT serve from the manifest any more...
    val q = s"SELECT min(s) AS lo, max(s) AS hi FROM tablelog.`$path`"
    val df = spark.sql(q)
    df.queryExecution.executedPlan
    assert(!TableLogSql.tookAggServed(path),
      "legacy string bounds must never serve as MIN/MAX answers")
    assert(df.collect().head.toSeq === Seq("apple", "zebra"))
    // ...numeric bounds (kind 'l') are unaffected...
    val qn = s"SELECT min(id) AS lo, max(id) AS hi FROM tablelog.`$path`"
    val dfn = spark.sql(qn)
    dfn.queryExecution.executedPlan
    assert(TableLogSql.tookAggServed(path))
    assert(dfn.collect().head.toSeq === Seq(1L, 3L))
    // ...and string bounds still PRUNE (superset range stays sound)
    assert(TableLog.readBand(spark, path, "s", "kiwi", "kiwi")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("deletion vectors through SQL: DELETE writes a sidecar, reads compensate") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-dv")
    TableLog.create(spark, path,
      (0L until 2000L).map(i => (i, i % 7))
        .toDF("id", "g").repartitionByRange(4, col("id"))
        .sortWithinPartitions("id"))
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataListing(): Set[String] = {
      val it = fsys.listFiles(new org.apache.hadoop.fs.Path(s"$path/data"), true)
      val out = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile) out += s"${s.getPath}@${s.getLen}"
      }
      out.toSet
    }
    val before = dataListing()
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    try {
      spark.sql(s"DELETE FROM tablelog.`$path` WHERE id = 77")
      assert(dataListing() === before,
        "SQL DELETE under the conf must be merge-on-read: zero data-file IO")
      assert(TableLog.snapshot(spark, path).hasDvs)

      // SELECTs compensate (the optimizer rule swaps the v2 scan)
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$path`")
        .collect().head.getLong(0) === 1999L)
      assert(!TableLogSql.tookAggServed(path),
        "manifest-served aggregates must refuse while DVs are live")
      assert(spark.sql(
        s"SELECT id FROM tablelog.`$path` WHERE id BETWEEN 75 AND 79 ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(75L, 76L, 78L, 79L))
      // time travel: v1 still whole, and still manifest-servable
      assert(spark.sql(
        s"SELECT count(*) AS n FROM tablelog.`$path` VERSION AS OF 1")
        .collect().head.getLong(0) === 2000L)

      // INSERT ... SELECT from the DV'd table copies only LIVE rows
      val dst = freshPath("graft-spec-tlsql-dv-dst")
      TableLog.create(spark, dst, Seq((999999L, 0L)).toDF("id", "g"))
      spark.sql(s"INSERT INTO tablelog.`$dst` " +
        s"SELECT id, g FROM tablelog.`$path` WHERE id < 100")
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$dst`")
        .collect().head.getLong(0) === 100L,
        "99 live rows under 100 (77 is dead) + the seed")

      // OPTIMIZE folds; manifest aggregate serving resumes
      spark.sql(s"CALL tablelog.optimize('$path', 'id', 4)")
      assert(!TableLog.snapshot(spark, path).hasDvs)
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$path`")
        .collect().head.getLong(0) === 1999L)
      assert(TableLogSql.tookAggServed(path),
        "after the fold the count serves from the manifest again")
    } finally spark.conf.unset("spark.graft.tablelog.deletionVectors")
  }

  test("DV compensation survives every write-command shape (round-15 resurrection bug)") {
    TableLogSql.register(spark)
    val src = freshPath("graft-spec-tlsql-dvshape")
    TableLog.create(spark, src,
      (0L until 100L).map(i => (i, i % 3)).toDF("id", "g").repartition(2))
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    try {
      spark.sql(s"DELETE FROM tablelog.`$src` WHERE id = 7")
      assert(TableLog.snapshot(spark, src).hasDvs)

      // CTAS SELECT * — the relation is the command's DIRECT child
      // after projection collapse (the shape the round-15 blanket
      // Command-child exemption resurrected row 7 in)
      val ctas = freshPath("graft-spec-tlsql-dvshape-ctas")
      spark.sql(s"CREATE TABLE tablelog.`$ctas` AS SELECT * FROM tablelog.`$src`")
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$ctas`")
        .collect().head.getLong(0) === 99L,
        "CTAS from a DV'd table must not copy deleted rows")

      // bare INSERT INTO ... SELECT * (no Filter to shield the relation)
      val dst = freshPath("graft-spec-tlsql-dvshape-ins")
      TableLog.create(spark, dst, Seq((-1L, -1L)).toDF("id", "g"))
      spark.sql(s"INSERT INTO tablelog.`$dst` SELECT * FROM tablelog.`$src`")
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$dst`")
        .collect().head.getLong(0) === 100L,
        "bare INSERT-SELECT must append 99 live rows + the seed")

      // df.write — the V1-fallback re-plan under
      // InsertIntoHadoopFsRelationCommand (explain showed the
      // anti-join, the EXECUTED plan dropped it in round 15)
      val out = freshPath("graft-spec-tlsql-dvshape-write")
      spark.table(s"tablelog.`$src`").write.mode("overwrite").parquet(out)
      assert(spark.read.parquet(out).count() === 99L,
        "df.write from a DV'd table must not write deleted rows")

      // DV table visible ONLY through subquery expressions (the rule
      // runs before subquery rewrite — its pre-scan guard must look
      // inside expression plans)
      spark.range(0, 100).toDF("id").createOrReplaceTempView("dv_probe")
      assert(spark.sql(
        "SELECT count(*) AS n FROM dv_probe WHERE id IN " +
          s"(SELECT id FROM tablelog.`$src`)")
        .collect().head.getLong(0) === 99L,
        "IN-subquery over a DV'd table must not match deleted ids")
      assert(spark.sql(
        s"SELECT (SELECT count(*) FROM tablelog.`$src`) AS n")
        .collect().head.getLong(0) === 99L,
        "scalar subquery over a DV'd table must count live rows")
    } finally spark.conf.unset("spark.graft.tablelog.deletionVectors")
  }

  test("scan-level DV compensation: correct with the rewrite rule EXCLUDED") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-dvscan")
    TableLog.create(spark, path,
      (0L until 2000L).map(i => (i, i % 7))
        .toDF("id", "g").repartitionByRange(4, col("id"))
        .sortWithinPartitions("id"))
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    // the correctness floor must hold with NO optimizer rewrite at
    // all (e.g. a session that registered the catalog without graft
    // extensions)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.sql.TableLogDvReadRewrite")
    try {
      spark.sql(s"DELETE FROM tablelog.`$path` WHERE id IN (77, 577, 1077, 1577)")
      assert(TableLog.snapshot(spark, path).hasDvs)
      val cnt = spark.sql(s"SELECT count(*) AS n FROM tablelog.`$path`")
      assert(cnt.collect().head.getLong(0) === 1996L)
      // the plan really is the DV-compensated SCAN, not the rewrite
      // (string match: AQE hides the BatchScanExec from plan.collect)
      assert(cnt.queryExecution.executedPlan.toString.contains("TableLogDvScan"),
        s"expected the DV-compensated scan in:\n${cnt.queryExecution.executedPlan}")
      // pushed filters still cut rows below the compensation
      assert(spark.sql(
        s"SELECT id FROM tablelog.`$path` WHERE id BETWEEN 75 AND 79 ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(75L, 76L, 78L, 79L))
      // column pruning through the compensated path
      assert(spark.sql(s"SELECT g FROM tablelog.`$path` WHERE id = 577")
        .collect().isEmpty)
      // multi-split DV'd files: per-PartitionedFile regrouping keeps
      // each split's dead set file-correct even when one file planned
      // as several byte-range splits
      val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      try {
        assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$path`")
          .collect().head.getLong(0) === 1996L)
        assert(spark.sql(s"SELECT sum(id) AS s FROM tablelog.`$path`")
          .collect().head.getLong(0) ===
          (0L until 2000L).sum - 77L - 577L - 1077L - 1577L)
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)

      // partitioned table: hive-dir files + partition pruning
      val ppath = freshPath("graft-spec-tlsql-dvscan-part")
      TableLog.createPartitioned(spark, ppath,
        (0L until 300L).map(i => (i, s"p${i % 3}")).toDF("id", "lang")
          .repartition(2), Seq("lang"))
      spark.sql(s"DELETE FROM tablelog.`$ppath` WHERE id < 30")
      assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$ppath`")
        .collect().head.getLong(0) === 270L)
      assert(spark.sql(
        s"SELECT count(*) AS n FROM tablelog.`$ppath` WHERE lang = 'p1'")
        .collect().head.getLong(0) === 90L)
    } finally {
      spark.conf.unset("spark.sql.optimizer.excludedRules")
      spark.conf.unset("spark.graft.tablelog.deletionVectors")
    }
  }

  test("manifest-served GROUP BY partition column: hive null sentinel maps to NULL") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-nullpart")
    val df = Seq((1L, "en"), (2L, null), (3L, "de"), (4L, null))
      .toDF("id", "lang")
    TableLog.createPartitioned(spark, path, df.repartition(1), Seq("lang"))
    val got = spark.sql(
      s"SELECT lang, count(*) AS n FROM tablelog.`$path` GROUP BY lang")
      .collect().map(r =>
        (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    assert(TableLogSql.tookAggServed(path),
      "the rollup must answer from the manifest")
    assert(got === Map(("en": Any) -> 1L, ("de": Any) -> 1L, (null: Any) -> 2L))

    // integral partition column: the sentinel must not NumberFormat-crash
    val path2 = freshPath("graft-spec-tlsql-nullpart2")
    val df2 = Seq((1L, Option(7L)), (2L, Option.empty[Long]), (3L, Option(7L)))
      .toDF("id", "g")
    TableLog.createPartitioned(spark, path2, df2.repartition(1), Seq("g"))
    val got2 = spark.sql(
      s"SELECT g, count(*) AS n FROM tablelog.`$path2` GROUP BY g")
      .collect().map(r =>
        (if (r.isNullAt(0)) null else r.getLong(0)) -> r.getLong(1)).toMap
    assert(TableLogSql.tookAggServed(path2))
    assert(got2 === Map((7L: Any) -> 2L, (null: Any) -> 1L))
  }

  test("VERSION AS OF: committed version numbers win, all-digit tags still reachable") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-numtag")
    TableLog.create(spark, path,
      (0L until 10L).map(i => (i, i)).toDF("id", "w"))        // v1
    TableLog.appendBatch(spark, path,
      (10L until 20L).map(i => (i, i)).toDF("id", "w"), "7")  // v2, tag "7"
    // no version 7 exists: the all-digit string falls through to the
    // tag map (streaming sinks tag by numeric batch id)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tablelog.`$path` VERSION AS OF '7'")
      .collect().head.getLong(0) === 20L)
    // a live version number shadows a same-named tag (documented)
    TableLog.appendBatch(spark, path,
      (20L until 25L).map(i => (i, i)).toDF("id", "w"), "1")  // v3, tag "1"
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tablelog.`$path` VERSION AS OF '1'")
      .collect().head.getLong(0) === 10L, "version 1, not tag '1'")
  }
  test("ALTER TABLE ADD COLUMN through SQL: schema-only version, refusals intact") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-alter")
    spark.sql(s"CREATE TABLE tablelog.`$path` (id BIGINT, w BIGINT)")
    spark.sql(s"INSERT INTO tablelog.`$path` VALUES (1, 10), (2, 20)")
    val filesBefore = TableLog.files(spark, path)

    spark.sql(s"ALTER TABLE tablelog.`$path` ADD COLUMN note STRING")
    assert(TableLog.files(spark, path) === filesBefore,
      "ADD COLUMN is a pure manifest edit")
    spark.sql(s"INSERT INTO tablelog.`$path` VALUES (3, 30, 'fresh')")
    assert(rows(spark.sql(s"SELECT id, w, note FROM tablelog.`$path`")) ===
      Set(Seq(1L, 10L, null), Seq(2L, 20L, null), Seq(3L, 30L, "fresh")))
    // old versions keep their narrow schema (time travel unaffected)
    assert(spark.sql(s"SELECT * FROM tablelog.`$path` VERSION AS OF 2")
      .columns.toSeq === Seq("id", "w"))

    def refused(sql: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      def msgs(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).nonEmpty, s"expected a refusal for: $sql")
    }
    refused(s"ALTER TABLE tablelog.`$path` DROP COLUMN w")
    refused(s"ALTER TABLE tablelog.`$path` ALTER COLUMN w TYPE STRING")
    refused(s"ALTER TABLE tablelog.`$path` RENAME COLUMN w TO v")
    // the table still reads after the refused ALTERs
    assert(spark.sql(s"SELECT count(*) AS n FROM tablelog.`$path`")
      .collect().head.getLong(0) === 3L)
  }
  test("CALL tablelog.recover_transactions heals a crashed multi-table commit") {
    TableLogSql.register(spark)
    val pA = freshPath("graft-spec-tlsql-txn-a")
    val pB = freshPath("graft-spec-tlsql-txn-b")
    import spark.implicits._
    TableLog.create(spark, pA, (0L until 10L).map(i => (i, i)).toDF("id", "w"))
    TableLog.create(spark, pB, (0L until 10L).map(i => (i, i)).toDF("id", "n"))
    TableLog.testPreCommit.put(pB, () =>
      throw new RuntimeException("injected crash"))
    intercept[RuntimeException] {
      TableLog.transaction(spark, Seq(
        pA -> Seq((100L, 1L)).toDF("id", "w"),
        pB -> Seq((100L, 1L)).toDF("id", "n")))
    }
    val first = Seq(pA, pB).min
    assert(spark.sql(s"CALL tablelog.recover_transactions('$first')")
      .collect().head.getInt(0) === 1)
    assert(TableLog.read(spark, pB).count() === 11L)
    assert(TableLog.read(spark, pA).count() === 11L)
  }
  test("INSERT OVERWRITE: truncate by default, per-partition under dynamic mode") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-tlsql-ovw")
    spark.sql(s"CREATE TABLE tablelog.`$path` (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO tablelog.`$path` " +
      "VALUES (1, 'en'), (2, 'en'), (3, 'de'), (4, 'zh')")

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE tablelog.`$path` VALUES (10, 'en')")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(rows(spark.sql(s"SELECT id, lang FROM tablelog.`$path`")) ===
      Set(Seq(10L, "en"), Seq(3L, "de"), Seq(4L, "zh")),
      "dynamic overwrite replaces only the present partition")

    // default (static/truncate) replaces the table
    spark.sql(s"INSERT OVERWRITE tablelog.`$path` VALUES (99, 'fr')")
    assert(rows(spark.sql(s"SELECT id, lang FROM tablelog.`$path`")) ===
      Set(Seq(99L, "fr")))
    // every state is a version: the pre-overwrite table is intact
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tablelog.`$path` VERSION AS OF 3")
      .collect().head.getLong(0) === 3L)
  }
  test("writeStream.toTable into a PARTITIONED table: rows route to hive dirs") {
    TableLogSql.register(spark)
    val src = freshPath("graft-spec-tlsql-pswr-src")
    val dst = freshPath("graft-spec-tlsql-pswr-dst")
    val ckpt = freshPath("graft-spec-tlsql-pswr-ckpt")
    val base = (0L until 300L).map(i =>
      (i, i, Seq("en", "de", null)((i % 3L).toInt))).toDF("id", "w", "lang")
    TableLog.create(spark, src, base)
    spark.sql(s"CREATE TABLE tablelog.`$dst` (id BIGINT, w BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    val q = spark.readStream.option("fromVersion", "0")
      .table(s"tablelog.`$src`")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable(s"tablelog.`$dst`")
    try q.processAllAvailable() finally q.stop()
    // content round-trips, including the NULL partition
    assert(rows(spark.sql(s"SELECT id, w, lang FROM tablelog.`$dst`")) ===
      rows(base.select(col("id"), col("w"), col("lang"))))
    // the streamed files carry partition records: a partition WHERE
    // plans only that partition's files
    spark.sql(s"SELECT * FROM tablelog.`$dst` WHERE lang = 'en'").count()
    val (kept, total) = TableLogSql.lastPlanned(dst).get
    assert(kept < total, s"partition pruning on streamed data: $kept/$total")
    val snap = TableLog.snapshot(spark, dst)
    assert(snap.files.forall(snap.parts.contains),
      "every streamed file must carry its partition record")
    assert(snap.files.forall(n => n.startsWith("lang=")),
      s"hive layout expected, got ${snap.files.take(3)}")
  }
  test("sorted-spill writer: a 100-partition adversarial epoch writes <= partitions + maxOpen files") {
    val dst = freshPath("graft-spec-tlsql-spill")
    val dataDir = s"$dst/data"
    new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(dataDir))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    val (hconf, codec) = TableLogWriteConf.snapshot(spark)
    val factory = new TableLogStreamingWriterFactory(
      dataDir, schema.json, "lang", codec,
      new org.apache.spark.SerializableWritable(hconf), maxOpenPartitions = 8)
    // run INSIDE a task (the spill sorter is task-memory-managed);
    // round-robin row order is the adversarial worst case for an
    // evict-and-reopen LRU (every row past the cap would churn a file)
    val files = spark.sparkContext.parallelize(Seq(0), 1).map { _ =>
      val w = factory.createWriter(0, 0L, 0L)
      (0 until 3000).foreach { i =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(
          i.toLong, (i * 7).toLong,
          org.apache.spark.unsafe.types.UTF8String.fromString(s"p${i % 100}")))
      }
      w.commit().asInstanceOf[TableLogPartFilesMessage].files
    }.collect().head
    assert(files.map(_._2).toSet.size === 100, "every partition present")
    assert(files.size <= 100 + 8,
      s"sorted spill must bound files at partitions + maxOpen, got ${files.size}")
    // content exact after the spill-sort drain
    val got = spark.read.option("basePath", dataDir)
      .parquet(files.map(f => s"$dataDir/${f._1}"): _*)
    assert(got.count() === 3000L)
    assert(got.agg(sum(col("w"))).collect().head.getLong(0) ===
      (0 until 3000).map(i => (i * 7).toLong).sum)
    assert(got.where(col("lang") === "p37").count() === 30L)
    assert(rows(got.where(col("lang") === "p5").select(col("id"))) ===
      (0 until 3000).filter(_ % 100 == 5).map(i => Seq(i.toLong)).toSet)
  }

  test("partitioned writer cap: high fan-out batches bound open writers, content exact") {
    TableLogSql.register(spark)
    val src = freshPath("graft-spec-tlsql-cap-src")
    val dst = freshPath("graft-spec-tlsql-cap-dst")
    val ckpt = freshPath("graft-spec-tlsql-cap-ckpt")
    // 12 partition values interleaved so every task cycles through
    // far more partitions than the cap of 2
    val base = (0L until 600L).map(i => (i, i, s"p${i % 12L}"))
      .toDF("id", "w", "lang")
    TableLog.create(spark, src, base)
    spark.sql(s"CREATE TABLE tablelog.`$dst` (id BIGINT, w BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.conf.set("spark.graft.tablelog.maxOpenPartitionWriters", "2")
    try {
      val q = spark.readStream.option("fromVersion", "0")
        .table(s"tablelog.`$src`")
        .writeStream.option("checkpointLocation", ckpt)
        .toTable(s"tablelog.`$dst`")
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.unset("spark.graft.tablelog.maxOpenPartitionWriters")
    assert(rows(spark.sql(s"SELECT id, w, lang FROM tablelog.`$dst`")) ===
      rows(base), "LRU eviction must lose no rows")
    val snap = TableLog.snapshot(spark, dst)
    assert(snap.files.forall(snap.parts.contains),
      "every spilled and still-open file carries its partition record")
    // the cap really bit: more files than partitions (each task keeps
    // <= 2 open and spill-drains the other 10 into its own files)
    assert(snap.files.size > 12,
      s"expected the cap to split files across tasks, got ${snap.files.size}")
  }
}






