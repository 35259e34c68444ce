package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.operators.TableLog

/** Pins [[TableLogChangeFeed]]: the streamed micro-batches are
  * prefix-equal to the batch [[TableLog.changes]] chain over the same
  * commit sequence — including changes committed WHILE the stream
  * runs — and the default start position streams only new commits.
  */
class TableLogChangeFeedSpec extends GraftSparkSpec {

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

  test("micro-batches prefix-equal the batch diff chain; live commits stream") {
    val path = freshPath("graft-spec-cf")
    val data = (0L until 1000L).map(i => (i, i * 2)).toDF("id", "w")
    TableLog.create(spark, path, data.repartition(4))          // v1
    TableLog.optimizeRange(spark, path, "id", numFiles = 4)    // v2
    TableLog.deleteBand(spark, path, "id", 0L, 99L)            // v3

    val feed = spark.readStream
      .format("graft.streaming.TableLogChangeFeed")
      .option("path", path)
      .option("fromVersion", "2")
      .load()
    val q = feed.writeStream.outputMode("append").format("memory")
      .queryName("cf_out").start()
    try {
      q.processAllAvailable()
      // prefix 1: everything in (2, 3]
      assert(rows(spark.table("cf_out")) ===
        rows(TableLog.changes(spark, path, 2L, 3L)))
      assert(spark.table("cf_out").count() === 100L)

      // commits landing while the stream runs become the next batches
      TableLog.append(spark, path,
        (5000L until 5010L).map(i => (i, i)).toDF("id", "w"))  // v4
      TableLog.deleteBand(spark, path, "id", 5000L, 5004L)     // v5
      q.processAllAvailable()
      assert(rows(spark.table("cf_out")) ===
        rows(TableLog.changes(spark, path, 2L, 5L)),
        "streamed prefix must equal the batch chain after live commits")
      val byVersion = spark.table("cf_out")
        .groupBy(col("_commit_version")).count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(byVersion === Map(3L -> 100L, 4L -> 10L, 5L -> 5L))
    } finally q.stop()
  }

  test("deletion-vector commits stream as position-level removals") {
    val path = freshPath("graft-spec-cf-dv")
    TableLog.create(spark, path,
      (0L until 500L).map(i => (i, s"r$i")).toDF("id", "p")
        .repartitionByRange(2, $"id"))                          // v1
    val feed = spark.readStream
      .format("graft.streaming.TableLogChangeFeed")
      .option("path", path)
      .option("fromVersion", "1")
      .load()
    val q = feed.writeStream.outputMode("append").format("memory")
      .queryName("cf_dv_out").start()
    try {
      TableLog.deleteWhereDV(spark, path, $"id".isin(3L, 400L)) // v2
      TableLog.updateWhereDV(spark, path,
        Seq("p" -> lit("UP")), $"id" === 5L)                    // v3
      TableLog.compactDvs(spark, path)                          // v4 (no-op rows)
      q.processAllAvailable()
      val got = rows(spark.table("cf_dv_out"))
      assert(got === Set(
        Seq(3L, "r3", "removed", 2L), Seq(400L, "r400", "removed", 2L),
        Seq(5L, "r5", "removed", 3L), Seq(5L, "UP", "added", 3L)),
        s"got $got")
    } finally q.stop()
  }

  test("end-to-end incremental pipeline: change feed -> exactly-once derived table") {
    // the round-12 write side (tableLogSink's tagged appends) closed
    // with the round-13 read side: a SOURCE table's change feed
    // maintains a DERIVED delta table through exactly-once tagged
    // appends; the derived rollup equals a from-scratch batch
    // recomputation after every prefix
    val srcPath = freshPath("graft-spec-cf-src")
    val derPath = freshPath("graft-spec-cf-der")
    TableLog.create(spark, srcPath,
      (0L until 300L).map(i => (i, Seq("en", "de")((i % 2L).toInt), i))
        .toDF("id", "lang", "w"))                                   // v1
    TableLog.create(spark, derPath,
      Seq(("_seed", 0L)).toDF("lang", "delta"))                     // derived seed

    val feed = spark.readStream
      .format("graft.streaming.TableLogChangeFeed")
      .option("path", srcPath)
      .option("fromVersion", "1")
      .load()
    // per-BATCH delta aggregation inside foreachBatch (a streaming
    // groupBy would emit running totals and double-count on append);
    // the tagged append makes a replayed batch a no-op
    val q = feed.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val delta = b.groupBy(col("lang"))
          .agg(sum(when(col("change") === "added", 1L).otherwise(-1L))
            .as("delta"))
        if (!delta.isEmpty)
          TableLog.appendBatch(spark, derPath, delta, s"cf-der-$id")
        ()
      }.start()

    def derivedCounts: Map[String, Long] =
      TableLog.read(spark, derPath).where(col("lang") =!= "_seed")
        .groupBy("lang").agg(sum("delta").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).filter(_._2 != 0L).toMap
    def sourceCounts: Map[String, Long] =
      TableLog.read(spark, srcPath).groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = sourceCounts

    try {
      TableLog.deleteWhere(spark, srcPath, col("id") < 100L)        // v2
      q.processAllAvailable()
      val drift1 = sourceCounts.map { case (k, v) => k -> (v - base(k)) }
        .filter(_._2 != 0L)
      assert(derivedCounts === drift1,
        s"derived $derivedCounts must equal source drift $drift1 after the delete")
      TableLog.append(spark, srcPath,
        (1000L until 1050L).map(i => (i, "en", i)).toDF("id", "lang", "w")) // v3
      q.processAllAvailable()
      val drift = sourceCounts.map { case (k, v) => k -> (v - base(k)) }
        .filter(_._2 != 0L)
      assert(derivedCounts === drift,
        s"derived $derivedCounts must equal source drift $drift")
    } finally q.stop()
  }

  test("change feed keeps a persisted ANN index fresh: search equals a same-quantizer rebuild") {
    val tbl = freshPath("graft-spec-cf-annsrc")
    val idx = freshPath("graft-spec-cf-annidx")
    val ref = freshPath("graft-spec-cf-annref")
    def vec(i: Long): Seq[Double] =
      (0 until 8).map(d => math.sin(i * 1.0 + d * 0.7))
    val v1 = (0L until 400L).map(i => (i, vec(i))).toDF("id", "vec")
    TableLog.create(spark, tbl, v1.repartition(4))
    StreamingOps.annIngestInit(
      TableLog.read(spark, tbl), "id", "vec", idx, nlist = 8)

    // the downstream incremental consumer the verdict's change-feed
    // item names: index maintenance subscribed to the table's CDC —
    // removals tombstone, additions assign against the SAVED quantizer
    val feed = spark.readStream
      .format("graft.streaming.TableLogChangeFeed")
      .option("path", tbl).option("fromVersion", "1").load()
    val q = feed.writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val dels = b.where(col("change") === "removed").select(col("id"))
        if (!dels.isEmpty) graft.vector.Ivf.removeFromIndex(dels, "id", idx)
        val adds = b.where(col("change") === "added")
          .select(col("id"), col("vec"))
        if (!adds.isEmpty) {
          val stored = spark.read.parquet(s"$idx/vectors.parquet")
            .select(col("id").as("_s"))
          adds.join(stored, col("id") === col("_s"), "left_anti")
            .select("id", "vec")
            .write.mode("append").parquet(s"$idx/vectors.parquet")
          graft.vector.Ivf.appendToIndex(adds, "id", "vec", idx)
        }
        ()
    }.start()
    try {
      TableLog.deleteBand(spark, tbl, "id", 0L, 49L)               // v2
      TableLog.append(spark, tbl,
        (1000L until 1050L).map(i => (i, vec(i))).toDF("id", "vec")) // v3
      q.processAllAvailable()
    } finally q.stop()

    // reference: the SAME quantizer re-assigned over the table's
    // CURRENT state — the maintained index must search identically
    val cur = TableLog.read(spark, tbl)
    graft.vector.Ivf.writeIndex(cur, "id", "vec", ref,
      graft.vector.Ivf.loadCentroids(spark, idx))
    val queries = (0 until 10).map(i => (i.toLong, vec(i * 37L + 3L)))
      .toDF("qid", "qv")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val maintained = norm(StreamingOps.annIngestSearch(
      spark, idx, queries, "qid", "qv", k = 3, nprobe = 8))
    val rebuilt = norm(graft.vector.Ivf.searchIndex(
      cur, "id", "vec", queries, "qid", "qv", ref, k = 3, nprobe = 8))
    assert(maintained === rebuilt,
      "maintained index must search exactly like the same-quantizer rebuild")
    // deleted rows really are gone from results
    val ids = StreamingOps.annIngestSearch(
      spark, idx, queries, "qid", "qv", k = 3, nprobe = 8)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(i => i >= 50L))
  }

  test("restart from the stream checkpoint resumes at the committed offset, no duplicates") {
    val path = freshPath("graft-spec-cf-restart")
    val ckpt = freshPath("graft-spec-cf-restart-ckpt")
    TableLog.create(spark, path, (0L until 100L).map(i => (i, i)).toDF("id", "w"))
    def feed = spark.readStream
      .format("graft.streaming.TableLogChangeFeed")
      .option("path", path)
      .option("fromVersion", "1")
      .load()
    // foreachBatch sink: recoverable from a checkpoint (the memory
    // sink is not), collecting into a per-run buffer
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Any]]()
    def run() = feed.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => got.add(r.toSeq))
          ()
      }.start()
    val q1 = run()
    try {
      TableLog.append(spark, path,
        (100L until 110L).map(i => (i, i)).toDF("id", "w"))  // v2
      q1.processAllAvailable()
      assert(got.size === 10)
    } finally q1.stop()
    // commits landing while the stream is DOWN
    TableLog.deleteBand(spark, path, "id", 0L, 4L)           // v3
    // restart against the same checkpoint: only (v2, v3] replays —
    // the engine hands our source a SerializedOffset for v2
    got.clear()
    val q2 = run()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet ===
        rows(TableLog.changes(spark, path, 2L, 3L)),
        "restart must resume after the committed offset, never replay v2")
      assert(got.size === 5)
    } finally q2.stop()
  }

  test("onSchemaChange=fail: evolution fails the batch pre-commit; restart replays it wide") {
    val path = freshPath("graft-spec-cf-evolve")
    val ckpt = freshPath("graft-spec-cf-evolve-ckpt")
    TableLog.create(spark, path, (0L until 50L).map(i => (i, i)).toDF("id", "w"))
    def feed = spark.readStream
      .format("graft.streaming.TableLogChangeFeed")
      .option("path", path)
      .option("fromVersion", "1")
      .option("onSchemaChange", "fail")
      .load()
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Any]]()
    def run() = feed.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => got.add(r.toSeq))
          ()
      }.start()
    val q1 = run()
    try {
      TableLog.append(spark, path,
        (50L until 60L).map(i => (i, i)).toDF("id", "w"))      // v2
      q1.processAllAvailable()
      assert(got.size === 10)
      // mid-stream evolution: v3 adds 'tag' — the batch must FAIL
      // before its offset commits (the default would silently drop it)
      TableLog.append(spark, path,
        (60L until 65L).map(i => (i, i, s"t$i")).toDF("id", "w", "tag")) // v3
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("evolved mid-stream")), msgs(e).mkString(" | "))
    } finally q1.stop()
    // restart against the same checkpoint: the source re-resolves the
    // now-wider table schema and REPLAYS (v2, v3] with tag populated
    got.clear()
    val q2 = run()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet === rows(TableLog.changes(spark, path, 2L, 3L)),
        "replayed evolution commit must carry the new column")
      assert(got.asScala.forall(_.size === 5), "wide rows: id, w, tag, change, version")
      assert(got.asScala.count(r => r(2) != null) === 5, "tag populated on v3 adds")
    } finally q2.stop()
  }

  test("default start position streams only commits after stream start") {
    val path = freshPath("graft-spec-cf-def")
    TableLog.create(spark, path, (0L until 50L).map(i => (i, i)).toDF("id", "w"))
    TableLog.append(spark, path, (50L until 60L).map(i => (i, i)).toDF("id", "w"))
    val feed = spark.readStream
      .format("graft.streaming.TableLogChangeFeed")
      .option("path", path)
      .load()
    val q = feed.writeStream.outputMode("append").format("memory")
      .queryName("cf_def").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cf_def").count() === 0L,
        "no new commits -> nothing streamed")
      TableLog.append(spark, path, Seq((100L, 100L)).toDF("id", "w")) // v3
      q.processAllAvailable()
      assert(rows(spark.table("cf_def")) ===
        rows(TableLog.changes(spark, path, 2L, 3L)))
    } finally q.stop()
  }
}
