package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** CoreLog query registry — reference log-parity surface + core relational ops (agg/join/window/sessionize/filters/rules/as-of).
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object CoreLogQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-style aggregation (hash agg, partial+final)
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("cnt"))
    }),


    // J1/A1 — request_count as a window count (no self-join)
    "q2_window_count" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
      eventsTable(s, dir)
        .select(col("event_id"), count(lit(1)).over(w).as("request_count"))
    }),


    // join shape (broadcast dim + shuffled fact agg)
    "q3_join" -> ((s, dir) => {
      val orders = table(s, dir, "orders")
      val cust = table(s, dir, "customer")
      val li = table(s, dir, "lineitem")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
    }),


    // W1 — time-gap sessionization over the events table
    "q4_sessionize" -> ((s, dir) => {
      val logs = eventsTable(s, dir).select(
        col("event_id"),
        col("event_type").as("source"),
        col("user_id").cast("string").as("ip"),
        col("ts").as("utc_timestamp"))
      Sessionizer.withClusters(logs, threshold = 300L)
        .select(col("event_id"), col("cluster"))
    }),


    // filter surface F1/F5/F6 over events
    "q5_filter" -> ((s, dir) => {
      eventsTable(s, dir)
        .filter(col("event_type").isin("click", "view") &&
          col("value") >= 5.0 && col("value") <= 50.0 &&
          col("ts") >= lit("2024-01-01 12:00:00").cast("timestamp"))
        .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
    }),


    // S6 — the real multi-format parser over generated apache lines
    "q6_parse" -> ((s, dir) => {
      val lg = PseudoLog.logs(s, dir)
      val line = concat(
        col("ip"), lit(" - - ["),
        date_format(col("utc_timestamp"), "dd/MMM/yyyy:HH:mm:ss Z"),
        lit("] \""), col("method"), lit(" "), col("request_uri"),
        lit(" HTTP/1.1\" "), col("status").cast("string"), lit(" "),
        col("resp_size").cast("string"),
        lit(" \""), col("referrer"), lit("\" \""), col("user_agent"), lit("\""))
      lg.select(col("event_id"), ParseLogLine.parse_log_line(line).as("p"))
        .select(col("event_id"),
          col("p.ip").as("ip"), col("p.timestamp").as("timestamp"),
          col("p.method").as("method"), col("p.request_uri").as("request_uri"),
          col("p.status").as("status"), col("p.resp_size").as("resp_size"),
          col("p.referrer").as("referrer"), col("p.user_agent").as("user_agent"))
    }),


    // D1 generalized — exact dedup with cross-source semantics
    "q7_dedup_exact" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.operators.Dedup.exact(
        docs,
        keyCols = Seq(col("lang"), expr("n_chars DIV 50")),
        orderCol = col("doc_id"),
        sourceCol = Some(col("source")))
        .select(col("doc_id"))
    }),


    // C1 — composite uri_risk over the pseudo-log URI inventory
    "q8_uri_risk" -> ((s, dir) => {
      PseudoLog.logs(s, dir).select(
        col("event_id"), col("request_uri"),
        RiskFeatures.uriRisk(col("request_uri"),
          GraftConfig.defaultSensitivePaths,
          GraftConfig.extPatterns(GraftConfig.defaultSensitiveExtensions),
          oracleShells).as("uri_risk"))
    }),


    // C7/C8 — scalar method/status risk
    "q9_scalar_risk" -> ((s, dir) => {
      PseudoLog.logs(s, dir).select(
        col("event_id"),
        RiskFeatures.methodRisk(col("method")).as("method_risk"),
        RiskFeatures.statusRisk(col("status")).as("status_risk"))
    }),


    // the full rule-engine pipeline: sessionize -> request_count ->
    // risk features -> sigma fold (one rule per operator class)
    "q10_rules" -> ((s, dir) => {
      // NOT widened at the source (round-17 A/B: widen(lg) regressed
      // 1.88 -> 2.62 s — the extra full-row round-robin exchange costs
      // more than the single-evaluation of the cheap planted-log
      // projection saves); the expensive rule pass below IS widened
      val lg = PseudoLog.logs(s, dir)
      val sess = Sessionizer.withClusters(lg, threshold = 300L)
      val counted = Sessionizer.withRequestCount(sess)
      // widen: the regex-heavy feature + rule evaluation sits ABOVE the
      // session windows, whose post-shuffle output AQE coalesces to one
      // partition at bench bytes — 2.96 s serialized on one core
      // (ProfileOne round 16); rule results are row-local, so the
      // repartition cannot change them
      val featured = graft.operators.Widen.widen(counted)
        .withColumn("uri_risk", RiskFeatures.uriRisk(col("request_uri"),
          GraftConfig.defaultSensitivePaths,
          GraftConfig.extPatterns(GraftConfig.defaultSensitiveExtensions),
          oracleShells))
        .withColumn("method_risk", RiskFeatures.methodRisk(col("method")))
        .withColumn("status_risk", RiskFeatures.statusRisk(col("status")))
      RuleEngine(featured, RuleEngine.parseRules(oracleRulesYaml))
        .select(col("event_id"), col("risk_score"), col("rule_applied"))
    }),


    // F9/C12 — CIDR include filter (pure-Column IPv4 arithmetic path)
    "q11_cidr" -> ((s, dir) => {
      PseudoLog.logs(s, dir)
        .filter(Cidr.inCidrs(col("ip"),
          Seq("10.5.0.0/16", "10.17.0.0/16", "10.42.0.0/16", "10.99.0.0/24")))
        .select(col("event_id"), col("ip"))
    }),


    // W2 — the real burst detector over the sessionized pseudo-log.
    // URI coarsened to 3 buckets + whole-user sessions so 500-bursts of
    // >=2 rows actually occur in the natural event spacing; gap splitting
    // boundaries are pinned by BurstDetectorSpec.
    "q12_burst" -> ((s, dir) => {
      val coarse = PseudoLog.logs(s, dir)
        .withColumn("request_uri", concat(lit("/u"), (col("event_id") % 3).cast("string")))
      val sess = Sessionizer.withClusters(coarse, threshold = 100000000L)
        .withColumn("risk_score", lit(0.0))
        .withColumn("rule_applied", lit(""))
      graft.operators.BurstDetector(sess, minRequests = 2, maxGapSeconds = 300000.0)
        .select(col("event_id"), col("risk_score"), col("rule_applied"))
    }),


    // F13 — tool-focus first/last membership per (source, ip, tool)
    "q13_tool_focus" -> ((s, dir) => {
      val lg = PseudoLog.logs(s, dir)
        .withColumn("tool",
          when((col("user_id") % 10) < 2,
            concat(lit("T"), (col("user_id") % 10).cast("string")))
            .otherwise(lit("")))
      lg.withColumn("_tf", graft.query.Filters.toolFocusFlag(col("event_id")))
        .filter(col("_tf"))
        .select(col("event_id"), col("tool"))
    }),


    // F1/F2/F5-F8/F10 — the conjunctive filter surface + O1 sort
    "q14_filters" -> ((s, dir) => {
      graft.query.Filters(
        PseudoLog.logs(s, dir),
        graft.query.FilterOptions(
          startTime = Some("2024-01-05 00:00:00"),
          endTime = Some("2024-01-25 00:00:00"),
          statusIgnore = Seq(302),
          methodIgnore = Seq("DELETE"),
          uriInclude = Seq("/page"),
          uriIgnore = Seq("dump"),
          extensionIgnore = GraftConfig.defaultIgnoreExtensions,
          uaIgnore = Seq("curl"),
          minSize = Some(50L)),
        orderTieCol = col("event_id"))
        .select(col("event_id"))
    }),


    // W3 — the real tool scanner (single-keyword reduction is exactly
    // SQL-expressible: every candidate row is assigned, later tool wins)
    "q15_tool_scan" -> ((s, dir) => {
      val sess = Sessionizer.withClusters(PseudoLog.logs(s, dir), threshold = 300L)
      val sigs = Seq(
        graft.rules.ToolSignature("T1", "DumpTool", "d1", Seq("dump"), 3600),
        graft.rules.ToolSignature("T2", "PhpTool", "d2", Seq("php"), 3600))
      graft.operators.ToolScanner(sess, sigs, rowIdCol = "event_id")
        .select(col("event_id"), col("tool"))
    }),


    // D1 proper — the reference's 8-col NORMALIZED dedup key over planted
    // cross-source duplicates (copies re-sourced with case/whitespace
    // noise that the C9 normalization must fold away)
    "q16_dedup_norm" -> ((s, dir) => {
      val lg = PseudoLog.logs(s, dir)
        .withColumn("timestamp",
          date_format(col("utc_timestamp"), "dd/MMM/yyyy:HH:mm:ss Z"))
        .withColumn("_row_id", col("event_id"))
      val noisy = lg
        .withColumn("source", lit("resrc.log"))
        .withColumn("user_agent", concat(lit("  "), upper(col("user_agent")), lit(" ")))
        .withColumn("method", lower(col("method")))
        .withColumn("_row_id", col("event_id") + 10000000L)
      // widen: the 8-column normalization (lower/trim/regex per col)
      // is narrow CPU over two 1-partition scans (see operators.Widen)
      val planted = graft.operators.Widen.widen(lg.unionByName(noisy))
      graft.norm.Normalizer.removeDuplicates(planted, col("_row_id"))
        .select(col("_row_id").as("rid"))
    }),


    // W1 at scale — the skew-proof two-phase sessionizer must produce
    // byte-identical clusters through the same oracle as q4
    "q17_sessionize_chunked" -> ((s, dir) => {
      val logs = eventsTable(s, dir).select(
        col("event_id"),
        col("event_type").as("source"),
        col("user_id").cast("string").as("ip"),
        col("ts").as("utc_timestamp"))
      Sessionizer.withClustersChunked(logs, threshold = 300L, chunkSeconds = 3600L)
        .select(col("event_id"), col("cluster"))
    }),


    // As-of join: every event aligned to its user's most recent
    // checkpoint (events with event_id % 10 == 0) at or before it —
    // DuckDB's native ASOF LEFT JOIN is the oracle. Times are epoch
    // nanos longs (raw parquet nanos when available, else converted
    // from the timestamp) == epoch_ns on the oracle side.
    // bucketized point-in-interval join — the range join Spark lacks
    // natively (the naive form is a BroadcastNestedLoopJoin): 200
    // overlapping 10-minute windows every 7 minutes × the events
    // stream. Intervals replicate to covered 600 s chunks, each point
    // maps to ONE chunk, equi-join + exact between-filter — every
    // qualifying pair emerges exactly once, no dedup. Oracle is the
    // plain theta join
    "q155_interval_join" -> ((s, dir) => {
      val base = 1704067200L // 2024-01-01 00:00:00 UTC
      val intervals = s.range(0, 200).select(
        col("id").as("interval_id"),
        (lit(base) + col("id") * 420L).as("start_sec"),
        (lit(base) + col("id") * 420L + 600L).as("end_sec"))
      val points = eventsTable(s, dir).select(col("event_id"),
        col("ts").cast("long").as("ts_sec"))
      graft.operators.IntervalJoin.pointsInIntervals(
        intervals, "start_sec", "end_sec", points, "ts_sec",
        chunkSeconds = 600)
        .select("interval_id", "event_id", "ts_sec")
    }),


    // interval × interval overlap join — q155's two-sided sibling
    // (downtime correlation / session co-occurrence): both planted
    // window sets replicate to covered chunks; the first-shared-chunk
    // rule (keep the pair only at max(startChunkA, startChunkB))
    // makes emission exactly-once with NO dedup pass. Oracle is the
    // plain inclusive-overlap theta join
    "q156_interval_overlap" -> ((s, dir) => {
      val base = 1704067200L
      val ids = table(s, dir, "documents").select(col("doc_id"))
      val a = ids.select(col("doc_id").as("aid"),
        (lit(base) + col("doc_id") * 540L).as("a_start"),
        (lit(base) + col("doc_id") * 540L + 720L).as("a_end"))
      val b = ids.select(col("doc_id").as("bid"),
        (lit(base) + col("doc_id") * 420L).as("b_start"),
        (lit(base) + col("doc_id") * 420L + 300L).as("b_end"))
      graft.operators.IntervalJoin.intervalOverlaps(
        a, "a_start", "a_end", b, "b_start", "b_end", chunkSeconds = 600)
        .select("aid", "bid")
    }),


    "q46_asof" -> ((s, dir) => {
      val ev = eventsNanos(s, dir)
      val left = ev.select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsofJoin.asofBackward(
        left, q46Checkpoints(ev), Seq("user_id"), "ts", "rts",
        Seq("ckpt_id", "ckpt_value"))
        .select(col("event_id"), col("ckpt_id"), col("ckpt_value"))
    }),


    // same as-of semantics through the skew-proof chunked twin
    // (hourly chunks over nano timestamps) — same oracle as q46
    "q50_asof_chunked" -> ((s, dir) => {
      val ev = eventsNanos(s, dir)
      val left = ev.select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsofJoin.asofBackwardChunked(
        left, q46Checkpoints(ev), Seq("user_id"), "ts", "rts",
        Seq("ckpt_id", "ckpt_value"),
        chunkSize = 3600L * 1000000000L)
        .select(col("event_id"), col("ckpt_id"), col("ckpt_value"))
    }),


    // exact interpolated quantiles per group: Spark's percentile and
    // DuckDB's quantile_cont share the (n-1)*p linear-interpolation
    // definition, so the values agree bit-for-bit after rounding
    "q47_quantiles" -> ((s, dir) => {
      table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
    }),


    // rollup aggregation (subtotals + grand total) — Spark rollup and
    // SQL ROLLUP share null-marker semantics
    "q49_rollup" -> ((s, dir) => {
      table(s, dir, "events")
        .withColumn("user_band", col("user_id") % 10)
        .rollup(col("event_type"), col("user_band"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    }),


    // URI anomaly scoring — the reference-domain × textops-LM
    // composition: train the q97 char-trigram stupid-backoff LM over
    // the pseudo-log's URI characters (each char a token via the
    // space-join), score every DISTINCT URI, rank the top 25 by
    // perplexity — traversal/webshell/encoded segments are rare in
    // the corpus, so they surface without any rule list. The
    // unpartitioned window ranks a URI-inventory-bounded frame
    // (hundreds of rows), not the event stream. Oracle: q97's
    // embedded independent scorer over the engine-trained model,
    // distinct URIs + ranking recomputed in SQL
    "q120_uri_anomaly" -> ((s, dir) => {
      val lg = PseudoLog.logs(s, dir).select(col("event_id"), col("request_uri"))
      val charified = lg.select(col("event_id"),
        concat_ws(" ", split(col("request_uri"), "")).as("ctext"))
      val model = graft.textops.NgramLm.trainTrigram(
        charified, "ctext", vocabSize = 256)
      // widen after the distinct: the per-URI trigram scoring runs on
      // the distinct's AQE-coalesced single post-shuffle partition
      val scored = graft.operators.Widen.widen(
        lg.select(col("request_uri")).distinct())
        .withColumn("_c", concat_ws(" ", split(col("request_uri"), "")))
        .select(col("request_uri"),
          graft.textops.NgramLm.lm_score3(s, col("_c"), model).as("_lm"))
        .select(col("request_uri"),
          col("_lm.n_tokens").as("n_chars"),
          round(col("_lm.ppl"), 4).as("char_ppl"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("char_ppl").desc, col("request_uri").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 25)
    }),


    // graft's scalar surface as SQL FUNCTIONS (round-13): the q8/q9
    // risk composites through plain spark.sql text — the session
    // extensions (GraftExtensions.injectFunction) register
    // graft_uri_risk / graft_method_risk / graft_status_risk, so a
    // SQL-only user gets the same codegen'd expressions. Oracle is
    // the q8/q9 replay combined
    "q218_sql_functions" -> ((s, dir) => {
      PseudoLog.logs(s, dir).createOrReplaceTempView("q218_logs")
      s.sql(
        """SELECT event_id, request_uri,
          |  graft_uri_risk(request_uri) AS uri_risk,
          |  graft_method_risk(method) AS method_risk,
          |  graft_status_risk(status) AS status_risk
          |FROM q218_logs""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,


    "q2_window_count" ->
      """SELECT event_id,
        |  count(*) OVER (PARTITION BY user_id, event_type) AS request_count
        |FROM events""".stripMargin,


    "q3_join" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,


    "q4_sessionize" -> oracleSqlQ4,


    "q5_filter" ->
      """SELECT event_id, event_type, round(value, 2) AS value
        |FROM events
        |WHERE event_type IN ('click', 'view')
        |  AND value >= 5.0 AND value <= 50.0
        |  AND ts >= TIMESTAMP '2024-01-01 12:00:00'""".stripMargin,


    "q6_parse" -> {
      val pat = """^(\S+) \S+ \S+ \[(\d{2}/[A-Za-z]{3}/\d{4}:\d{2}:\d{2}:\d{2}\s[+-]\d{4})\] "([A-Z]+) ([^ ]+) HTTP/[0-9.]+" (\d{3}) (\d+|-) "(.*?|-)" "(.*?|-)"\s*$"""
      def g(i: Int) = s"regexp_extract(l, '$pat', $i)"
      "WITH " + PseudoLog.sqlLogs + """,
        |lines AS (
        |  SELECT event_id,
        |    ip || ' - - [' || strftime(utc_timestamp, '%d/%b/%Y:%H:%M:%S') || ' +0000] "'
        |       || method || ' ' || request_uri || ' HTTP/1.1" '
        |       || CAST(status AS VARCHAR) || ' ' || CAST(resp_size AS VARCHAR)
        |       || ' "' || referrer || '" "' || user_agent || '"' AS l
        |  FROM logs)
        |""".stripMargin +
        s"""SELECT event_id, ${g(1)} AS ip, ${g(2)} AS timestamp, ${g(3)} AS method,
           |  ${g(4)} AS request_uri, CAST(${g(5)} AS INT) AS status,
           |  CAST(${g(6)} AS BIGINT) AS resp_size, ${g(7)} AS referrer,
           |  ${g(8)} AS user_agent
           |FROM lines""".stripMargin
    },


    "q7_dedup_exact" ->
      """WITH k AS (SELECT doc_id, source, lang, n_chars // 50 AS bucket FROM documents),
        |g AS (SELECT lang, bucket, count(DISTINCT source) AS nsrc FROM k GROUP BY 1, 2),
        |w AS (SELECT k.doc_id, k.lang, k.bucket,
        |        row_number() OVER (PARTITION BY k.lang, k.bucket ORDER BY k.doc_id) AS rn
        |      FROM k)
        |SELECT w.doc_id FROM w JOIN g USING (lang, bucket)
        |WHERE rn = 1 OR nsrc <= 1""".stripMargin,


    "q8_uri_risk" ->
      ("WITH " + PseudoLog.sqlLogs + "\nSELECT event_id, request_uri, " +
        PseudoLog.sqlUriRisk("request_uri") + " AS uri_risk\nFROM logs"),


    "q9_scalar_risk" ->
      ("WITH " + PseudoLog.sqlLogs + "\nSELECT event_id, " +
        PseudoLog.sqlMethodRisk("method") + " AS method_risk, " +
        PseudoLog.sqlStatusRisk("status") + " AS status_risk\nFROM logs"),


    "q218_sql_functions" ->
      ("WITH " + PseudoLog.sqlLogs + "\nSELECT event_id, request_uri, " +
        PseudoLog.sqlUriRisk("request_uri") + " AS uri_risk, " +
        PseudoLog.sqlMethodRisk("method") + " AS method_risk, " +
        PseudoLog.sqlStatusRisk("status") + " AS status_risk\nFROM logs"),


    "q10_rules" -> {
      val uriRisk = PseudoLog.sqlUriRisk("request_uri")
      val statusRisk = PseudoLog.sqlStatusRisk("status")
      val aton = "(CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216 + " +
        "CAST(split_part(ip, '.', 2) AS BIGINT) * 65536 + " +
        "CAST(split_part(ip, '.', 3) AS BIGINT) * 256 + " +
        "CAST(split_part(ip, '.', 4) AS BIGINT))"
      val conds = Seq(
        ("(uri_risk >= 70 AND status IN (200, 201, 202))", "75.0", "R1 High URI Risk OK"),
        ("(regexp_matches(request_uri, '(?i)whoami') AND resp_size >= 10)", "71.1", "R2 Whoami"),
        ("(referrer LIKE 'https://fofa%')", "67.5", "R3 Fofa Referrer"),
        (s"(($aton // 65536) IN (2577, 2602) AND user_agent LIKE '%1.7')", "66.0", "R4 Scanner In Range"),
        ("(request_count >= 2 AND status IN (500, 502, 503, 504))", "42.0", "R5 Session Repeats With Errors"),
        ("(status_risk >= 70)", "40.0", "R7 Status Risk"),
        ("(regexp_matches(request_uri, '(?i)p[0-9]+\\.css$') AND method IN ('PUT', 'DELETE'))", "30.0", "R6 Risky Method On Static"),
        ("(method NOT IN ('GET', 'POST', 'HEAD', 'PUT', 'DELETE') AND uri_risk < 5)", "20.0", "R8 Unknown Method"))
      val scoreCase = conds.map { case (c, sc, _) => s"WHEN $c THEN $sc" }
        .mkString("CAST(CASE ", " ", " ELSE 0.0 END AS DOUBLE)")
      val titleCase = conds.map { case (c, _, t) => s"WHEN $c THEN '$t'" }
        .mkString("CASE ", " ", " ELSE '' END")
      "WITH " + PseudoLog.sqlLogs + ",\n" + PseudoLog.sqlSessionized() + ",\n" +
        s"""featured AS (
           |  SELECT *, $uriRisk AS uri_risk, $statusRisk AS status_risk
           |  FROM counted)
           |SELECT event_id, $scoreCase AS risk_score, $titleCase AS rule_applied
           |FROM featured""".stripMargin
    },


    "q11_cidr" -> {
      val aton = "(CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216 + " +
        "CAST(split_part(ip, '.', 2) AS BIGINT) * 65536 + " +
        "CAST(split_part(ip, '.', 3) AS BIGINT) * 256 + " +
        "CAST(split_part(ip, '.', 4) AS BIGINT))"
      "WITH " + PseudoLog.sqlLogs +
        s"""
           |SELECT event_id, ip FROM logs
           |WHERE ($aton // 65536) IN (2565, 2577, 2602)
           |   OR ($aton // 256) = 680704""".stripMargin
    },


    "q12_burst" -> {
      val hit = "c.status = 200 AND s.mt IS NOT NULL AND c.utc_timestamp >= s.mt"
      "WITH " + PseudoLog.sqlLogs + ",\n" +
        "logs2 AS (SELECT * REPLACE('/u' || CAST(event_id % 3 AS VARCHAR) AS request_uri) FROM logs),\n" +
        PseudoLog.sqlSessionized(threshold = 100000000L, src = "logs2") + ",\n" +
        s"""s500 AS (SELECT * FROM counted WHERE status = 500),
           |lag500 AS (
           |  SELECT *, CASE WHEN (epoch_us(utc_timestamp) - lag(epoch_us(utc_timestamp)) OVER w)
           |                      / 1000000.0 > 300000.0 THEN 1 ELSE 0 END AS nb
           |  FROM s500
           |  WINDOW w AS (PARTITION BY source, ip, cluster, request_uri, method
           |               ORDER BY utc_timestamp)),
           |bursts AS (
           |  SELECT *, sum(nb) OVER (PARTITION BY source, ip, cluster, request_uri, method
           |                          ORDER BY utc_timestamp ROWS UNBOUNDED PRECEDING) AS burst_id
           |  FROM lag500),
           |bstats AS (
           |  SELECT source, ip, cluster, request_uri, method, burst_id,
           |         count(*) AS c, min(utc_timestamp) AS mt
           |  FROM bursts GROUP BY ALL),
           |sus AS (
           |  SELECT source, ip, cluster, request_uri, min(mt) AS mt
           |  FROM bstats WHERE c >= 2 GROUP BY 1, 2, 3, 4)
           |SELECT c.event_id,
           |  CAST(CASE WHEN $hit THEN 95.0 ELSE 0.0 END AS DOUBLE) AS risk_score,
           |  CASE WHEN $hit THEN 'Attack Success After High-Frequency Server Failures'
           |       ELSE '' END AS rule_applied
           |FROM counted c LEFT JOIN sus s USING (source, ip, cluster, request_uri)""".stripMargin
    },


    "q13_tool_focus" ->
      ("WITH " + PseudoLog.sqlLogs + ",\n" +
        """tooled AS (
          |  SELECT *, CASE WHEN user_id % 10 < 2
          |                 THEN 'T' || CAST(user_id % 10 AS VARCHAR) ELSE '' END AS tool
          |  FROM logs),
          |ranked AS (
          |  SELECT *,
          |    row_number() OVER (PARTITION BY source, ip, tool
          |                       ORDER BY utc_timestamp ASC, event_id ASC) AS rn_a,
          |    row_number() OVER (PARTITION BY source, ip, tool
          |                       ORDER BY utc_timestamp DESC, event_id ASC) AS rn_d
          |  FROM tooled)
          |SELECT event_id, tool FROM ranked
          |WHERE tool != '' AND (rn_a = 1 OR rn_d = 1)""".stripMargin),


    "q14_filters" -> {
      val path = "(CASE WHEN position('?' IN request_uri) > 0 " +
        "THEN substr(request_uri, 1, position('?' IN request_uri) - 1) " +
        "ELSE request_uri END)"
      val extCond = GraftConfig.defaultIgnoreExtensions
        .map(e => s"ends_with(lower($path), '$e')").mkString("(", " OR ", ")")
      "WITH " + PseudoLog.sqlLogs +
        s"""
           |SELECT event_id FROM logs
           |WHERE utc_timestamp >= TIMESTAMP '2024-01-05 00:00:00'
           |  AND utc_timestamp <= TIMESTAMP '2024-01-25 00:00:00'
           |  AND NOT $extCond
           |  AND resp_size >= 50
           |  AND status NOT IN (302)
           |  AND method NOT IN ('DELETE')
           |  AND contains(request_uri, '/page')
           |  AND NOT contains(request_uri, 'dump')
           |  AND NOT contains(user_agent, 'curl')""".stripMargin
    },


    "q15_tool_scan" ->
      ("WITH " + PseudoLog.sqlLogs +
        """
          |SELECT event_id,
          |  CASE WHEN contains(lower(request_uri), 'php') THEN 'T2'
          |       WHEN contains(lower(request_uri), 'dump') THEN 'T1'
          |       ELSE '' END AS tool
          |FROM logs""".stripMargin),


    "q16_dedup_norm" -> {
      def nk(x: String) =
        s"(CASE WHEN regexp_replace(lower(trim($x)), '^\"|\"$$', '', 'g') = 'nan' " +
          s"THEN '' ELSE regexp_replace(lower(trim($x)), '^\"|\"$$', '', 'g') END)"
      "WITH " + PseudoLog.sqlLogs + ",\n" +
        s"""ts_logs AS (
           |  SELECT *, strftime(utc_timestamp, '%d/%b/%Y:%H:%M:%S') || ' +0000' AS timestamp
           |  FROM logs),
           |planted AS (
           |  SELECT event_id AS rid, source, timestamp, ip, method, request_uri,
           |         status, resp_size, user_agent, referrer FROM ts_logs
           |  UNION ALL
           |  SELECT event_id + 10000000 AS rid, 'resrc.log' AS source, timestamp, ip,
           |         lower(method) AS method, request_uri, status, resp_size,
           |         '  ' || upper(user_agent) || ' ' AS user_agent, referrer FROM ts_logs),
           |keyed AS (
           |  SELECT rid, source,
           |    ${nk("timestamp")} AS k1, ${nk("ip")} AS k2, ${nk("method")} AS k3,
           |    ${nk("request_uri")} AS k4, CAST(status AS BIGINT) AS k5,
           |    CAST(resp_size AS BIGINT) AS k6, ${nk("user_agent")} AS k7,
           |    ${nk("referrer")} AS k8
           |  FROM planted),
           |grp AS (
           |  SELECT k1, k2, k3, k4, k5, k6, k7, k8, count(DISTINCT source) AS nsrc
           |  FROM keyed GROUP BY ALL),
           |ranked AS (
           |  SELECT keyed.*, row_number() OVER (PARTITION BY k1, k2, k3, k4, k5, k6, k7, k8
           |                                     ORDER BY rid) AS rn
           |  FROM keyed)
           |SELECT r.rid FROM ranked r
           |JOIN grp USING (k1, k2, k3, k4, k5, k6, k7, k8)
           |WHERE r.rn = 1 OR grp.nsrc <= 1""".stripMargin
    },


    "q17_sessionize_chunked" -> oracleSqlQ4,


    "q46_asof" -> oracleSqlQ46,

    // q156: plain inclusive-overlap theta join over the same planted
    // window sets
    "q156_interval_overlap" ->
      """WITH a AS (
        |  SELECT doc_id AS aid, 1704067200 + doc_id * 540 AS s,
        |         1704067200 + doc_id * 540 + 720 AS e
        |  FROM documents),
        |b AS (
        |  SELECT doc_id AS bid, 1704067200 + doc_id * 420 AS s,
        |         1704067200 + doc_id * 420 + 300 AS e
        |  FROM documents)
        |SELECT a.aid, b.bid
        |FROM a JOIN b ON a.s <= b.e AND b.s <= a.e""".stripMargin,

    // q155: the plain theta join the engine's bucketized form must
    // reproduce pair-for-pair; second-resolution epochs (floor the
    // double epoch(), the DuckDB-1.0 rule)
    "q155_interval_join" ->
      """WITH iv AS (
        |  SELECT t.k AS interval_id,
        |    1704067200 + t.k * 420 AS s,
        |    1704067200 + t.k * 420 + 600 AS e
        |  FROM range(200) t(k)),
        |p AS (
        |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events)
        |SELECT iv.interval_id, p.event_id, p.ts_sec
        |FROM iv JOIN p ON p.ts_sec >= iv.s AND p.ts_sec <= iv.e""".stripMargin,

    "q50_asof_chunked" -> oracleSqlQ46,


    "q47_quantiles" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin,


    "q49_rollup" ->
      """SELECT event_type, user_id % 10 AS user_band,
        |  count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY ROLLUP(event_type, (user_id % 10))""".stripMargin
  )
}
