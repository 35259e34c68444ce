package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class StreamingOpsSpec extends GraftSparkSpec {
  import spark.implicits._

  test("streaming sessionization groups by 60s gaps (session_window)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val logs = input.toDF().toDF("source", "ip", "ep")
      .withColumn("utc_timestamp", col("ep").cast("timestamp")).drop("ep")

    val q = StreamingOps.sessionize(logs, gapSeconds = 60)
      .writeStream.outputMode("complete").format("memory").queryName("sess_out").start()
    try {
      input.addData(
        ("a", "1.1.1.1", 1000L), ("a", "1.1.1.1", 1030L), // same session
        ("a", "1.1.1.1", 2000L),                          // gap > 60 -> new session
        ("a", "2.2.2.2", 1000L))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("ip", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(rows == Seq(("1.1.1.1", 1L), ("1.1.1.1", 2L), ("2.2.2.2", 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val logs = input.toDF().toDF("ip", "request_uri", "ep")
      .withColumn("utc_timestamp", col("ep").cast("timestamp")).drop("ep")

    val q = StreamingOps.dedupExact(logs, Seq("ip", "request_uri"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        ("1.1.1.1", "/a", 1000L), ("1.1.1.1", "/a", 1001L), // dup key, second dropped
        ("1.1.1.1", "/b", 1000L), ("2.2.2.2", "/a", 1000L))
      q.processAllAvailable()
      // same batch: duplicate key emitted once
      assert(spark.table("dedup_out").count() == 3)
      // later batch, same key, still inside the watermark: dropped
      input.addData(("1.1.1.1", "/a", 1100L))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3)
    } finally q.stop()
  }

  test("streaming tool scan emits collected rows when all keywords arrive in-window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.ToolEvent]
    val sig = graft.rules.ToolSignature("DS01", "DirSearch", "d",
      Seq("/.access", ".bak_0.log", ".chef"), timeWindowSeconds = 100)
    val q = StreamingOps.toolScan(input.toDS(), Seq(sig))
      .writeStream.outputMode("append").format("memory").queryName("tool_out").start()
    try {
      def ev(uri: String, sec: Long, id: Long) =
        StreamingOps.ToolEvent("a", "1.1.1.1", uri, sec * 1000000L, id)
      // two of three keywords + one noise row: nothing emitted
      input.addData(ev("/.access", 0, 1), ev("/x.bak_0.log", 10, 2), ev("/index.html", 11, 3))
      q.processAllAvailable()
      assert(spark.table("tool_out").count() == 0)
      // third keyword inside the window (cross-batch state): emit all collected
      input.addData(ev("/.chef/config.rb", 20, 4))
      q.processAllAvailable()
      val got = spark.table("tool_out").as[StreamingOps.ToolAssignment].collect()
        .map(a => (a.rowId, a.tool)).toSet
      assert(got == Set((1L, "DS01"), (2L, "DS01"), (4L, "DS01")), s"got $got")
      // expired window: a fresh hit restarts instead of completing
      input.addData(ev("/.access", 500, 5))
      q.processAllAvailable()
      assert(spark.table("tool_out").count() == 3)
    } finally q.stop()
  }

  test("streaming burst alerts fire once at the threshold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.BurstEvent]
    val alerts = StreamingOps.burstAlerts(input.toDS(), minRequests = 3, maxGapSeconds = 1.0)
    val q = alerts.writeStream.outputMode("append").format("memory")
      .queryName("burst_out").start()
    try {
      def ev(us: Long, status: Int = 500) =
        StreamingOps.BurstEvent("a", "1.1.1.1", "/u", us, status)
      // batch 1: two fast 500s — below threshold
      input.addData(ev(0L), ev(500000L))
      q.processAllAvailable()
      assert(spark.table("burst_out").count() == 0)
      // batch 2: third fast 500 crosses threshold -> exactly one alert
      input.addData(ev(1000000L))
      q.processAllAvailable()
      val a = spark.table("burst_out").as[StreamingOps.BurstAlert].collect()
      assert(a.length == 1 && a.head.n == 3 && a.head.startMicros == 0L)
      // batch 3: slow 500 after a big gap resets state, no new alert
      input.addData(ev(100000000L))
      q.processAllAvailable()
      assert(spark.table("burst_out").count() == 1)
    } finally q.stop()
  }
}
