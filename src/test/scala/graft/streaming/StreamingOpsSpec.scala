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

  test("streaming as-of join: out-of-order right updates win before the watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    def ev(key: String, sec: Long, isLeft: Boolean, rowId: Long, value: String) =
      StreamingOps.AsofEvent(key, new java.sql.Timestamp(sec * 1000L), isLeft, rowId, value)
    val input = MemoryStream[StreamingOps.AsofEvent]
    val q = StreamingOps.asofJoin(input.toDS(), watermark = "5 seconds")
      .writeStream.outputMode("append").format("memory").queryName("asof_out").start()
    try {
      def results() = spark.table("asof_out").as[StreamingOps.AsofResult]
        .collect().map(r => r.rowId -> r).toMap

      // batch 1: a right at 90s and a left at 100s. Watermark is still
      // far behind 100s, so NOTHING is answered yet.
      input.addData(ev("k", 90, isLeft = false, 0, "r90"), ev("k", 100, isLeft = true, 1, null))
      q.processAllAvailable()
      assert(results().isEmpty)

      // batch 2: an OUT-OF-ORDER right at 97s arrives after the left it
      // must win (wm = 100 - 5 = 95s: the left at 100s still waits, and
      // 97s is legally inside the horizon — anything at or behind the
      // watermark would be dropped as late, which is the contract).
      input.addData(ev("k", 97, isLeft = false, 0, "r97"))
      q.processAllAvailable()
      assert(results().isEmpty)

      // batch 3: a second left far ahead pushes the watermark later
      input.addData(ev("k", 200, isLeft = true, 2, null))
      q.processAllAvailable()

      // batch 4: traffic on ANOTHER key advances the global watermark to
      // 295s; key "k" gets no events, so its pending lefts drain through
      // the EVENT-TIME TIMEOUT path. Left@100 must match the
      // out-of-order r97 (not r90); left@200 must match the r97 CARRY
      // that survived pruning.
      input.addData(ev("other", 300, isLeft = false, 0, "x"))
      q.processAllAvailable()
      val got = results()
      assert(got.keySet == Set(1L, 2L))
      assert(got(1L).value.contains("r97") && got(1L).matchTsMs.contains(97000L))
      assert(got(2L).value.contains("r97") && got(2L).matchTsMs.contains(97000L))

      // a left with no preceding right yields an explicit no-match row
      input.addData(ev("fresh", 310, isLeft = true, 3, null))
      q.processAllAvailable()
      input.addData(ev("other", 400, isLeft = false, 0, "x"))
      q.processAllAvailable()
      assert(results()(3L).value.isEmpty && results()(3L).matchTsMs.isEmpty)
    } finally q.stop()
  }

  test("streaming as-of join: null event times follow the batch twin's contract") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.AsofEvent]
    val q = StreamingOps.asofJoin(input.toDS(), watermark = "5 seconds")
      .writeStream.outputMode("append").format("memory").queryName("asof_null_out").start()
    try {
      input.addData(
        // null-time right: dropped (would otherwise match everything)
        StreamingOps.AsofEvent("k", null, isLeft = false, 0, "ghost"),
        // null-time left: immediate no-match row, no watermark wait
        StreamingOps.AsofEvent("k", null, isLeft = true, 7, null),
        // two rights tied on time, one with a NULL value: ordering must
        // not NPE, and the non-null value sorts last (asc_nulls_first)
        StreamingOps.AsofEvent("k", new java.sql.Timestamp(10000L), isLeft = false, 0, null),
        StreamingOps.AsofEvent("k", new java.sql.Timestamp(10000L), isLeft = false, 0, "real"),
        StreamingOps.AsofEvent("k", new java.sql.Timestamp(20000L), isLeft = true, 8, null))
      q.processAllAvailable()
      input.addData( // advance the watermark past the left at 20s
        StreamingOps.AsofEvent("other", new java.sql.Timestamp(90000L), isLeft = false, 0, "x"))
      q.processAllAvailable()
      val got = spark.table("asof_null_out").as[StreamingOps.AsofResult]
        .collect().map(r => r.rowId -> r).toMap
      assert(got(7L).value.isEmpty && got(7L).matchTsMs.isEmpty)
      assert(got(8L).value.contains("real") && got(8L).matchTsMs.contains(10000L))
    } finally q.stop()
  }

  test("streaming incremental near-dup ingestion dedups against the growing index") {
    implicit val sqlCtx = spark.sqlContext
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "mu")
    def doc(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(30)(words(rnd.nextInt(words.length))).mkString(" ")
    }
    val dir = java.nio.file.Files.createTempDirectory("stream_minhash").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StreamingOps.dedupIngest(docs, "doc_id", "text", dir,
      (df, bid) => got.synchronized {
        got ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
      }).start()
    try {
      // batch 0: three distinct docs + one IN-batch near-dup of doc 0
      input.addData((0L, doc(0)), (1L, doc(1)), (2L, doc(2)), (5L, doc(0) + " mu"))
      q.processAllAvailable()
      // batch 1: two fresh docs, one near-dup of the INDEXED doc 1, one
      // in-batch near-dup of doc 10
      input.addData((10L, doc(10)), (11L, doc(11)),
        (12L, doc(1) + " mu"), (13L, doc(10) + " mu"))
      q.processAllAvailable()
      // batch 2: an id the index already holds — replay-style no-op
      input.addData((10L, doc(10)))
      q.processAllAvailable()
      val byBatch = got.synchronized {
        got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap }
      assert(byBatch(0L) == Set(0L, 1L, 2L))
      assert(byBatch(1L) == Set(10L, 11L))
      assert(byBatch.getOrElse(2L, Set.empty[Long]) == Set.empty[Long])
      // the index holds exactly the survivors; streaming state is empty
      val idxIds = spark.read.parquet(s"$dir/shingles.parquet")
        .select("id").as[Long].collect().toSet
      assert(idxIds == Set(0L, 1L, 2L, 10L, 11L))
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L))
    } finally q.stop()
  }

  test("streaming fingerprint (image) ingestion dedups against the growing index") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("stream_phash").toString + "/idx"
    val input = MemoryStream[Long]
    // pattern images per id; ids >= 100000 are brightness-shifted twins
    // of id - 100000 (dHash-identical, byte-distinct)
    val media = graft.multimodal.Multimodal.patternImages(
      input.toDF().toDF("media_id"), "media_id")
      .withColumn("fp", graft.multimodal.PerceptualHash.dhash64(col("bytes")))
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StreamingOps.dedupIngestFingerprints(media, "media_id", "fp", dir,
      (df, bid) => got.synchronized {
        got ++= df.select("media_id").collect().map(r => (bid, r.getLong(0)))
      }, maxHamming = 4).start()
    try {
      // batch 0: three distinct images + one in-batch twin of image 1
      input.addData(1L, 2L, 3L, 100001L)
      q.processAllAvailable()
      // batch 1: one fresh image, one twin of the INDEXED image 2, one
      // replayed id
      input.addData(7L, 100002L, 3L)
      q.processAllAvailable()
      val byBatch = got.synchronized {
        got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap }
      assert(byBatch(0L) == Set(1L, 2L, 3L))
      assert(byBatch.getOrElse(1L, Set.empty[Long]) == Set(7L))
      import spark.implicits._
      val idxIds = spark.read.parquet(s"$dir/fp.parquet")
        .select("id").as[Long].collect().toSet
      assert(idxIds == Set(1L, 2L, 3L, 7L))
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L))
    } finally q.stop()
  }

  test("streaming line cleaning: lines turn boilerplate once history proves them") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_lines").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val q = StreamingOps.lineCleanIngest(docs, "doc_id", "text", dir,
      minDf = 3, (df, bid) => got.synchronized {
        got ++= df.select("doc_id", "text_clean").collect()
          .map(r => (bid, r.getLong(0), r.getString(1)))
      }).start()
    try {
      // batch 0: banner df reaches 3 in the INDEX only after append —
      // batch 0 itself is cleaned against an empty history, untouched
      input.addData(
        (1L, "banner\nu1"), (2L, "banner\nu2"), (3L, "banner\nu3"))
      q.processAllAvailable()
      // batch 1: history df(banner) = 3 >= minDf -> cleaned
      input.addData((4L, "banner\nu4"), (5L, "fresh\nu5"))
      q.processAllAvailable()
      // batch 2: replayed doc 4 — cleaned output re-delivers (sink
      // at-least-once) but the index must not double-count
      input.addData((4L, "banner\nu4"))
      q.processAllAvailable()
      val byBatch = got.synchronized {
        got.groupBy(_._1).view
          .mapValues(_.map(t => (t._2, t._3)).toSet).toMap }
      assert(byBatch(0L) == Set((1L, "banner\nu1"), (2L, "banner\nu2"),
        (3L, "banner\nu3")), "history empty: nothing cleaned yet")
      assert(byBatch(1L) == Set((4L, "u4"), (5L, "fresh\nu5")))
      assert(byBatch(2L) == Set((4L, "u4")))
      // ledger dropped the replay: df(banner) counts docs 1..4 once
      val bannerDf = graft.textops.LineDedup.lineIndexDf(spark, dir)
        .filter(col("lh") === org.apache.spark.sql.functions.xxhash64(lit("banner")))
        .collect()
      assert(bannerDf.length == 1 && bannerDf(0).getLong(1) == 4L)
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L))
    } finally q.stop()
  }

  test("streaming CDC ingest: dedup accounting against everything ingested so far") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_cdc").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = StreamingOps.cdcChunkIngest(docs, "doc_id", "text", dir,
      (df, bid) => got.synchronized {
        got ++= df.select("doc_id", "n_chunks", "n_dup_chunks").collect()
          .map(r => (bid, r.getLong(0), r.getLong(1), r.getLong(2)))
      }).start()
    val base = (1 to 40).map(i => s"shared run $i token${i % 5}").mkString(" ")
    try {
      // batch 0: empty history — zero dup chunks
      input.addData((1L, base))
      q.processAllAvailable()
      // batch 1: an exact re-upload under a new id — every chunk dup;
      // plus a fresh doc sharing a long middle run with doc 1
      input.addData((2L, base),
        (3L, "totally new prefix " + base.substring(40, 400) + " new tail"))
      q.processAllAvailable()
      // batch 2: replayed id 1 — stats re-deliver (at-least-once),
      // the ledger drops its re-append
      input.addData((1L, base))
      q.processAllAvailable()
      val byBatch = got.synchronized {
        got.groupBy(_._1).view
          .mapValues(_.map(t => (t._2, t._3, t._4)).toSet).toMap }
      val b0 = byBatch(0L)
      assert(b0.size == 1 && b0.head._3 == 0L, s"batch 0 must have no dups: $b0")
      val byId1 = byBatch(1L).map(t => t._1 -> ((t._2, t._3))).toMap
      // doc 2 = exact re-upload: all chunks known
      assert(byId1(2L)._1 == byId1(2L)._2 && byId1(2L)._1 > 0)
      // doc 3 shares interior content: SOME but not all chunks known
      assert(byId1(3L)._2 > 0 && byId1(3L)._2 < byId1(3L)._1,
        s"doc 3 expected partial dedup: ${byId1(3L)}")
      // batch 2: replay reports fully-dup against history
      val byId2 = byBatch(2L).map(t => t._1 -> ((t._2, t._3))).toMap
      assert(byId2(1L)._1 == byId2(1L)._2)
      // ledger: doc 1 ingested once (ids.parquet holds 1,2,3)
      import spark.implicits._
      assert(spark.read.parquet(s"$dir/ids.parquet")
        .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L))
    } finally q.stop()
  }

  test("streaming corpus stats equal the batch sketches after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val terms = input.toDF().toDF("lang", "term")

    def proj(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Seq[(String, Long)], Seq[Long], Seq[Long], Seq[Long], Long)] =
      df.select(col("lang"), col("n_terms"),
          col("distinct_sketch.est_distinct"), col("heavy_hitters"),
          col("freq_sketch"), col("len_quantiles.values"),
          col("len_quantiles.counts"), col("hll_sketch.est_x1000"))
        .collect().map { r =>
          r.getString(0) -> ((r.getLong(1), r.getLong(2),
            r.getSeq[org.apache.spark.sql.Row](3)
              .map(e => (e.getString(0), e.getLong(1))),
            r.getSeq[Long](4), r.getSeq[Long](5), r.getSeq[Long](6),
            r.getLong(7)))
        }.toMap

    def batchTwin(rows: Seq[(String, String)]) = proj(
      StreamingOps.corpusStats(
        rows.toDF("lang", "term"), "lang", "term", mgCapacity = 32, kmvK = 4,
        cmsDepth = 2, cmsWidth = 32))

    def streamed() = proj(spark.table("cstats_out"))

    val q = StreamingOps.corpusStats(terms, "lang", "term",
      mgCapacity = 32, kmvK = 4, cmsDepth = 2, cmsWidth = 32)
      .writeStream.outputMode("complete").format("memory")
      .queryName("cstats_out").start()
    try {
      val b1 = (1 to 60).map(i => ("en", s"t${i % 6}")) ++
        (1 to 9).map(i => ("de", s"d${i % 3}"))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(streamed() == batchTwin(b1), "after batch 1")

      // batch 2 pushes en past kmvK (new distinct terms) and shifts
      // the heavy-hitter order; state must merge, not reset. Distinct
      // counts stay under mgCapacity: MG content is only
      // order-independent in the no-decrement regime
      val b2 = (1 to 40).map(i => ("en", s"x${i % 9}")) ++
        (1 to 5).map(_ => ("de", "d0"))
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(streamed() == batchTwin(b1 ++ b2), "after batch 2")
    } finally q.stop()
  }

  test("streaming politeness schedule: prefix-equal to the batch scheduler with carryover") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val delays = Seq(("h1", 500L), ("h2", 200L)).toDF("host", "delay_ms")

    // batch twin with carried-over per-host offsets: apply q147's
    // scheduler to each batch alone, then shift its slots by the
    // host's cumulative count from earlier batches
    def expected(batches: Seq[Seq[(String, String)]]): Set[(String, String, Long, Long)] = {
      val counters = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val delayOf = Map("h1" -> 500L, "h2" -> 200L).withDefaultValue(1000L)
      val out = Set.newBuilder[(String, String, Long, Long)]
      for (b <- batches) {
        val sched = graft.operators.CrawlScheduler.schedule(
          b.toDF("host", "url"), "host", "url", delays, defaultDelayMs = 1000L)
          .select("host", "url", "fetch_slot")
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        for ((h, u, s) <- sched) {
          val slot = counters(h) + s
          out += ((h, u, slot, slot * delayOf(h)))
        }
        for ((h, n) <- b.groupBy(_._1).view.mapValues(_.size)) counters(h) += n
      }
      out.result()
    }

    def streamed(): Set[(String, String, Long, Long)] =
      spark.table("polite_out")
        .select("host", "url", "fetch_slot", "fetch_time_ms")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet

    val q = StreamingOps.politenessSchedule(
      input.toDF().toDF("host", "url"), "host", "url", delays,
      defaultDelayMs = 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("polite_out").start()
    try {
      val b1 = Seq(("h1", "u/a"), ("h1", "u/b"), ("h2", "u/c"), ("h3", "u/d"))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(streamed() == expected(Seq(b1)), "after batch 1")

      // batch 2 revisits h1/h2: slots must CONTINUE, not restart —
      // the politeness contract the per-host counter state carries
      val b2 = Seq(("h1", "u/e"), ("h1", "u/f"), ("h2", "u/g"))
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(streamed() == expected(Seq(b1, b2)), "after batch 2")
      // h1 saw 2 + 2 urls: its max slot is 3; h3 used the default delay
      val byHost = streamed().groupBy(_._1)
      assert(byHost("h1").map(_._3) == Set(0L, 1L, 2L, 3L))
      assert(byHost("h3").head._4 == 0L * 1000L)
    } finally q.stop()
  }

  test("streaming crawl frontier: robots + blocklist gates feed the politeness state") {
    implicit val sqlCtx = spark.sqlContext
    val robotsTxt =
      "User-agent: *\nDisallow: /private\nAllow: /private/ok\nCrawl-delay: 2"
    val parsed = graft.operators.RobotsGate.parseRobots(
      Seq(("h1.example.com", robotsTxt)).toDF("host", "robots"),
      "host", "robots", "graftbot").localCheckpoint()
    val input = MemoryStream[String]
    val q = StreamingOps.frontierSchedule(
      input.toDF().toDF("url"), "url", parsed,
      blockedDomains = Seq("spam.net"), defaultDelayMs = 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("frontier_out").start()
    try {
      val b1 = Seq(
        "https://h1.example.com/private/x", // disallowed
        "https://h1.example.com/private/ok/x", // re-allowed (longest prefix)
        "https://h1.example.com/pub", // no rule matches -> allowed
        "https://ads.spam.net/z", // blocklisted subdomain
        "https://notspam.net/z", // NOT blocklisted (label-aligned rule)
        "https://other.com/a") // ruleless host, default delay
      input.addData(b1: _*)
      q.processAllAvailable()
      def rows() = spark.table("frontier_out")
        .select("host", "url", "fetch_slot", "fetch_time_ms")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      val got1 = rows()
      assert(got1.map(_._2) === Set(
        "https://h1.example.com/private/ok/x", "https://h1.example.com/pub",
        "https://notspam.net/z", "https://other.com/a"))
      // allowed-set parity with the batch gate on the same urls
      val batchAllowed = graft.operators.RobotsGate.decide(
        b1.toDF("u").withColumn("host",
          graft.operators.Blocklist.urlHost(col("u")))
          .filter(!col("host").isin("ads.spam.net")),
        Seq(col("u")), col("u"),
        parsed.filter(col("kind") === "rule")
          .select(col("host"), col("allow"), col("prefix")))
        .filter(col("allowed")).select("u")
        .collect().map(_.getString(0)).toSet
      assert(got1.map(_._2) === batchAllowed)
      // h1's crawl-delay (2 s) prices its slots; ruleless hosts use
      // the default
      val h1 = got1.filter(_._1 == "h1.example.com")
      assert(h1.map(t => (t._3, t._4)) === Set((0L, 0L), (1L, 2000L)))
      // batch 2: slots continue per host across batches
      input.addData("https://h1.example.com/pub2")
      q.processAllAvailable()
      val h1b2 = rows().filter(_._1 == "h1.example.com").map(_._3)
      assert(h1b2 === Set(0L, 1L, 2L))
    } finally q.stop()
  }

  test("streaming dictionary match: the AC automaton is a stateless streaming projection") {
    import graft.textops.PhraseAutomaton
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val auto = PhraseAutomaton.build(Seq("bad phrase", "spam"))
    val q = input.toDF().toDF("id", "text")
      .select(col("id"),
        PhraseAutomaton.ac_match(spark, col("text"), auto).as("m"))
      .select(col("id"),
        PhraseAutomaton.ac_hits(col("m")).as("hits"),
        PhraseAutomaton.ac_distinct(col("m")).as("pats"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ac_out").start()
    try {
      input.addData((1L, "clean doc"), (2L, "SPAM and a bad phrase here"),
        (3L, "spam spam spam"))
      q.processAllAvailable()
      val got = spark.table("ac_out").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == Map(1L -> ((0L, 0L)), 2L -> ((2L, 2L)), 3L -> ((3L, 1L))))
    } finally q.stop()
  }

  test("streaming crawl-ingest projections: outlinks, mojibake fix, unigram " +
    "segment are stateless streaming expressions") {
    import graft.textops.{LinkExtract, Mojibake, Unigram}
    implicit val sqlCtx = spark.sqlContext
    // a tiny pre-trained model: the broadcast is ingest-time state the
    // STREAM never mutates (train-offline/apply-online, the production
    // shape for tokenizers)
    val model = {
      import spark.implicits._
      Unigram.train(Seq("ab ab ab").toDF("text"), "text",
        vocabSize = 20, maxPieceLen = 3, emIters = 1)
    }
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("id", "url", "html")
      .select(col("id"),
        LinkExtract.resolve_url(col("url"),
          try_element_at(LinkExtract.rawHrefs(col("html")), lit(1))).as("first_link"),
        Mojibake.fix_mojibake(col("html")).as("fixed"),
        Unigram.unigram_segment(spark, col("html"), model).as("pieces"))
      .writeStream.outputMode("append").format("memory")
      .queryName("crawl_out").start()
    try {
      input.addData(
        (1L, "https://a.example.com/x/page.html", """<a href="sub/y">cafÃ©</a>"""),
        (2L, "https://b.example.com/", "ab plain"))
      q.processAllAvailable()
      val got = spark.table("crawl_out").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          r.getString(2), r.getSeq[String](3).toList))
        .sortBy(_._1).toList
      assert(got.head._1 === 1L)
      assert(got.head._2 === "https://a.example.com/x/sub/y")
      assert(got.head._3.contains("café")) // mojibake repaired in-stream
      assert(got(1)._2 === null) // no anchor -> no edge
      assert(got(1)._4.take(1) === List(Unigram.Marker + "ab"))
    } finally q.stop()
  }

  test("streaming round-10 projections: trained lang ID, HTML structure, " +
    "char entropy are stateless streaming expressions") {
    import graft.textops.{HtmlStructure, LangClassifier, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    // train-offline/apply-online: the softmax model broadcasts once,
    // the stream only scores (the q135 production shape)
    val model = {
      import spark.implicits._
      LangClassifier.train(
        Seq((1L, "en", "the quick brown fox jumps over the lazy dog today"),
          (2L, "de", "der schnelle braune fuchs springt über den faulen hund"),
          (3L, "en", "a quiet morning with strong coffee and an old book"),
          (4L, "de", "ein ruhiger morgen mit starkem kaffee und einem buch"))
          .toDF("id", "label", "text"),
        "text", "label", "id", epochs = 60)
    }
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "html")
      .select(col("id"),
        LangClassifier.lang_score(spark, col("html"), model)
          .getField("pred").as("lang"),
        HtmlStructure.ulMarkdown(col("html")).as("ul_md"),
        round(TextAnalysis.charEntropy(col("html")), 2).as("h"))
      .writeStream.outputMode("append").format("memory")
      .queryName("r10_out").start()
    try {
      input.addData(
        (1L, "<li>the fox and the dog play today</li>"),
        (2L, "<li>der fuchs und der hund</li>"))
      q.processAllAvailable()
      val got = spark.table("r10_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
        .sortBy(_._1).toList
      assert(got.map(_._2) === List("en", "de"))
      assert(got.head._3 === "- the fox and the dog play today")
      assert(got.forall(_._4 > 0.0))
    } finally q.stop()
  }

  test("streaming ANN ingest: append-grown index ≡ rebuilt index; replays dropped") {
    implicit val sqlCtx = spark.sqlContext
    def vec(i: Long): Seq[Double] =
      Seq.tabulate(8)(j => if (j == (i % 8).toInt) 1.0 else 0.01 * ((i + j) % 5))
    val dir = graft.SparkEntry.perProcessTmpDir("graft-spec-ann-ingest")
    val bootstrap = (0L until 50L).map(i => (i, vec(i))).toDF("vid", "emb")
    StreamingOps.annIngestInit(bootstrap, "vid", "emb", dir, nlist = 4)

    val input = MemoryStream[(Long, Seq[Double])]
    val vecs = input.toDF().toDF("vid", "emb")
    val sunk = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingOps.annIngest(vecs, "vid", "emb", dir,
      (df, _) => { sunk ++= df.select("vid").collect().map(_.getLong(0)); () })
      .option("checkpointLocation",
        graft.SparkEntry.perProcessTmpDir("graft-spec-ann-ingest-ckpt"))
      .start()
    try {
      val b1 = (50L until 70L).map(i => (i, vec(i)))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(sunk.sorted == (50L until 70L).toSeq, "batch 1 delivered")

      // replay protection: same ids again -> dropped, stores unchanged
      input.addData(b1.map { case (i, _) => (i, vec(i + 1)) }: _*)
      q.processAllAvailable()
      assert(sunk.size === 20, "replayed ids must not re-deliver")
      assert(spark.read.parquet(s"$dir/vectors.parquet").count() === 70L)

      val b2 = (70L until 80L).map(i => (i, vec(i)))
      input.addData(b2: _*)
      q.processAllAvailable()

      // append-grown ≡ rebuilt with the same saved quantizer
      val queries = Seq((1000L, vec(3)), (1001L, vec(11))).toDF("qid", "qv")
      val grown = StreamingOps.annIngestSearch(
        spark, dir, queries, "qid", "qv", k = 5, nprobe = 2)
      val union = bootstrap.union(
        (b1 ++ b2).toDF("vid", "emb"))
      val rebuilt = graft.SparkEntry.perProcessTmpDir("graft-spec-ann-rebuilt")
      graft.vector.Ivf.writeIndex(union, "vid", "emb", rebuilt,
        graft.vector.Ivf.loadCentroids(spark, dir))
      val expect = graft.vector.Ivf.searchIndex(
        union, "vid", "emb", queries, "qid", "qv", rebuilt, k = 5, nprobe = 2)
      assert(grown.collect().map(_.toSeq).toSet ===
        expect.collect().map(_.toSeq).toSet)
    } finally q.stop()
  }

  test("tableLogSink: each micro-batch is one atomic version, replays skipped") {
    implicit val sqlCtx = spark.sqlContext
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-tlog-sink")
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    graft.operators.TableLog.create(spark, path,
      Seq((0L, "seed")).toDF("id", "v"))

    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.tableLogSink(input.toDF().toDF("id", "v"), path)
      .option("checkpointLocation",
        graft.SparkEntry.perProcessTmpDir("graft-spec-tlog-sink-ckpt"))
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      assert(graft.operators.TableLog.versions(spark, path).size === 3)
      assert(graft.operators.TableLog.read(spark, path).count() === 4L)
      // a crashed-and-replayed batch: same tag -> no fourth version
      graft.operators.TableLog.appendBatch(spark, path,
        Seq((9L, "dup")).toDF("id", "v"), "batch-1")
      assert(graft.operators.TableLog.versions(spark, path).size === 3)
      assert(graft.operators.TableLog.read(spark, path).count() === 4L)
      // mid-stream readers see whole versions: v2 is exactly batch 0
      assert(graft.operators.TableLog.read(spark, path, Some(2L)).count() === 3L)
    } finally q.stop()
  }

  test("tableLogSink: compactAboveFiles bounds the table's file count") {
    implicit val sqlCtx = spark.sqlContext
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-tlog-sinkc")
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    graft.operators.TableLog.create(spark, path,
      Seq((0L, "seed")).toDF("id", "v"))
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.tableLogSink(input.toDF().toDF("id", "v"), path,
      compactAboveFiles = 3, targetRowsPerFile = 1000L)
      .option("checkpointLocation",
        graft.SparkEntry.perProcessTmpDir("graft-spec-tlog-sinkc-ckpt"))
      .start()
    try {
      for (b <- 0 until 6) {
        input.addData((10L + b, s"r$b"))
        q.processAllAvailable()
      }
      // steady state: the fold keeps the CURRENT version's file list
      // bounded (each append adds >= 1 file; compact folds to 1 at
      // these row counts) while every row survives
      assert(graft.operators.TableLog.files(spark, path).size <= 4,
        s"file count ${graft.operators.TableLog.files(spark, path).size}")
      assert(graft.operators.TableLog.read(spark, path).count() === 7L)
    } finally q.stop()
  }

  test("streaming ANN ingest: compactAboveFiles bounds store file counts") {
    implicit val sqlCtx = spark.sqlContext
    def vec(i: Long): Seq[Double] =
      Seq.tabulate(8)(j => if (j == (i % 8).toInt) 1.0 else 0.0)
    val dir = graft.SparkEntry.perProcessTmpDir("graft-spec-ann-compact")
    StreamingOps.annIngestInit(
      (0L until 40L).map(i => (i, vec(i))).toDF("vid", "emb"),
      "vid", "emb", dir, nlist = 4)
    def files(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))

    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamingOps.annIngest(input.toDF().toDF("vid", "emb"),
      "vid", "emb", dir, (_, _) => (), compactAboveFiles = 6)
      .option("checkpointLocation",
        graft.SparkEntry.perProcessTmpDir("graft-spec-ann-compact-ckpt"))
      .start()
    try {
      for (b <- 0 until 6) {
        input.addData((40L + b * 5 until 45L + b * 5).map(i => (i, vec(i))): _*)
        q.processAllAvailable()
      }
      assert(files(s"$dir/cells.parquet") <= 10,
        s"index files unbounded: ${files(s"$dir/cells.parquet")}")
      assert(files(s"$dir/vectors.parquet") <= 10,
        s"store files unbounded: ${files(s"$dir/vectors.parquet")}")
      assert(spark.read.parquet(s"$dir/vectors.parquet").count() === 70L)
      // search still serves the full corpus after the folds
      val got = StreamingOps.annIngestSearch(spark, dir,
        Seq((9000L, vec(2))).toDF("qid", "qv"), "qid", "qv", k = 3, nprobe = 4)
      assert(got.count() === 3L)
    } finally q.stop()
  }

  test("streaming funnel equals the batch report after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Option[Int], Option[Int])]
    val rows = input.toDF().toDF("id", "a", "b")
    val gates = Seq(
      "gateA" -> (col("a") > 0), "gateB" -> (col("b") > 0))

    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select("gate", "n_rows", "n_fail", "n_first_fail",
          "n_unique_fail", "n_survive")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet

    def batchTwin(data: Seq[(Long, Option[Int], Option[Int])]) =
      proj(graft.operators.Funnel.report(data.toDF("id", "a", "b"), gates))

    val q = StreamingOps.funnelIngest(rows, gates)
      .writeStream.outputMode("complete").format("memory")
      .queryName("funnel_out").start()
    try {
      val b1 = Seq((1L, Option(5), Option(5)), (2L, Option(0), Option(5)),
        (3L, Option(5), Option(0)))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(proj(spark.table("funnel_out")) === batchTwin(b1), "after batch 1")

      val b2 = Seq((4L, Option(0), Option(0)),
        (5L, Option.empty[Int], Option(5)))
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(proj(spark.table("funnel_out")) === batchTwin(b1 ++ b2),
        "after batch 2 (null-escape row included)")
    } finally q.stop()
  }
}
