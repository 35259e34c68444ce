package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Incremental span dedup against a persisted window-hash index:
  * batch-2 output equals the batch-2 slice of a global run over the
  * union (ascending-id contract), replays are no-ops, and the
  * ledger-only crash state degrades to in-batch dedup only.
  */
class SpanIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private val block = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens

  private def outMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, String)] =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("new batch trims spans already seen in history; equals the global run's slice") {
    val dir = Files.createTempDirectory("span_idx").toString
    val b1 = Seq(
      1L -> (block + " iota kappa"),
      2L -> "some ordinary first batch document with enough tokens").toDF("doc_id", "text")
    val b2 = Seq(
      10L -> ("intro " + block + " ending"), // contains batch-1's block
      11L -> "a fresh unrelated second batch document here",
      12L -> (block + " iota kappa")) // exact copy of doc 1
      .toDF("doc_id", "text")
    SpanDedup.buildSpanIndex(b1, "doc_id", "text", dir)
    val inc = outMap(SpanDedup.dedupSpansNewBatch(b2, "doc_id", "text", dir))
    val global = outMap(
      SpanDedup.dedupSpans(b1.unionByName(b2), "doc_id", "text")
        .filter(col("doc_id") >= 10))
    assert(inc == global)
    assert(inc(10L) === ((10L, 8L, "intro ending")))
    assert(inc(12L)._3 === "")
    assert(inc(11L)._2 === 0L)
  }

  test("replayed ids drop whole; ledger-only crash state degrades to in-batch dedup") {
    val dir = Files.createTempDirectory("span_idx2").toString
    val b1 = Seq(1L -> (block + " iota kappa")).toDF("doc_id", "text")
    SpanDedup.buildSpanIndex(b1, "doc_id", "text", dir)
    // replay of batch 1 -> no rows
    assert(SpanDedup.dedupSpansNewBatch(b1, "doc_id", "text", dir).count() == 0)
    // simulate crash between ledger and window writes: windows missing
    val p = new org.apache.hadoop.fs.Path(s"$dir/windows.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val b2 = Seq(20L -> (block + " new"), 21L -> (block + " new")).toDF("doc_id", "text")
    val out = outMap(SpanDedup.dedupSpansNewBatch(b2, "doc_id", "text", dir))
    // history lost its windows, but in-batch dedup still applies and
    // the replay ledger still drops id 1
    assert(out.keySet == Set(20L, 21L))
    assert(out(20L)._2 === 0L && out(21L)._3 === "")
  }

  test("streaming span ingest: trims against the growing index, replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("span_stream").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val q = graft.streaming.StreamingOps.spanDedupIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      (df, bid) => got.synchronized {
        got ++= df.select("doc_id", "text_dedup").collect()
          .map(r => (bid, r.getLong(0), r.getString(1)))
      }).start()
    try {
      input.addData(1L -> (block + " iota kappa"))
      q.processAllAvailable()
      // batch 1: one doc repeating batch-0's block, one replayed id
      input.addData(10L -> ("intro " + block + " tail"), 1L -> "whatever")
      q.processAllAvailable()
      val byBatch = got.synchronized {
        got.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap }
      assert(byBatch(0L) == Set((1L, block + " iota kappa")))
      assert(byBatch(1L) == Set((10L, "intro tail")))
      // ledger holds both delivered ids; windows cover both batches
      val ids = spark.read.parquet(s"$dir/ids.parquet").as[Long].collect().toSet
      assert(ids == Set(1L, 10L))
    } finally q.stop()
  }
}
