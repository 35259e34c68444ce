package graft.sql

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.operators.TableLog

/** Pins the `$changes` DSv2 streaming metadata table: materialized
  * change dirs (incl. deletion-vector and equality-delete commits)
  * stream as row-level changes, pure appends stream without any
  * materialization, and an unmaterialized change commit fails the
  * stream loudly instead of silently dropping rows.
  */
class TableLogChangesStreamSpec extends GraftSparkSpec {

  import spark.implicits._

  private def freshPath(stem: String): String = {
    val p = graft.SparkEntry.perProcessTmpDir(stem)
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    p
  }

  test("streams appends, DV deletes, eq deletes, and updates as row-level changes") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-cdfstream")
    spark.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
    spark.conf.set("spark.graft.tablelog.deletionVectors", "true")
    try {
      TableLog.create(spark, path,
        (0L until 100L).map(i => (i, s"v0-$i")).toDF("id", "p")
          .repartitionByRange(2, $"id"))                         // v1
      TableLog.append(spark, path,
        Seq((100L, "v2-100"), (101L, "v2-101")).toDF("id", "p")) // v2
      TableLog.deleteWhereDV(spark, path, $"id" === 7L)          // v3
      TableLog.deleteByKey(spark, path, Seq(8L).toDF("id"))      // v4
      TableLog.updateWhere(spark, path,
        Seq("p" -> lit("UPDATED")), $"id" === 100L)              // v5

      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      val q = spark.readStream
        .option("fromVersion", "0")
        .table(s"tablelog.`$path$$changes`")
        .writeStream
        .option("checkpointLocation", freshPath("graft-spec-cdfstream-ck"))
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
            buf.synchronized {
              buf ++= b.collect().map(r => (r.getLong(0), r.getString(1),
                r.getString(2), r.getLong(3)))
            }
            ()
        }.start()
      try q.processAllAvailable() finally q.stop()

      val byV = buf.groupBy(_._4)
      // v1: the whole CREATE as 'added' (pure append, no change dir)
      assert(byV(1L).size === 100 && byV(1L).forall(_._3 == "added"))
      // v2: exactly the appended rows
      assert(byV(2L).toSet === Set((100L, "v2-100", "added", 2L),
        (101L, "v2-101", "added", 2L)))
      // v3: the DV position delete as one 'removed' row
      assert(byV(3L).toSet === Set((7L, "v0-7", "removed", 3L)))
      // v4: the equality delete as one 'removed' row
      assert(byV(4L).toSet === Set((8L, "v0-8", "removed", 4L)))
      // v5: the update as remove + add
      assert(byV(5L).toSet === Set((100L, "v2-100", "removed", 5L),
        (100L, "UPDATED", "added", 5L)))
      assert(buf.size === 100 + 2 + 1 + 1 + 2)
    } finally {
      spark.conf.unset("spark.graft.tablelog.writeChangeFiles")
      spark.conf.unset("spark.graft.tablelog.deletionVectors")
    }
  }

  test("unmaterialized change commit fails the stream; appends never need one") {
    TableLogSql.register(spark)
    val path = freshPath("graft-spec-cdfstream-refuse")
    // NO writeChangeFiles: appends still stream, a rewrite cannot
    TableLog.create(spark, path,
      (0L until 50L).map(i => (i, s"p$i")).toDF("id", "p"))      // v1
    TableLog.append(spark, path, Seq((50L, "p50")).toDF("id", "p")) // v2
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream
        .option("fromVersion", "0")
        .table(s"tablelog.`$path$$changes`")
        .writeStream
        .option("checkpointLocation",
          freshPath(s"graft-spec-cdfstream-refuse-ck-${buf.size}"))
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) => buf.synchronized { buf += b.count() }; ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(buf.sum === 51L, "pure appends stream with no materialization")
    TableLog.deleteWhere(spark, path, $"id" < 5L)                // v3 rewrite
    val e = intercept[Exception] { drain() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("writeChangeFiles")),
      s"expected the enable-conf pointer, got: ${msgs(e)}")
  }
}
