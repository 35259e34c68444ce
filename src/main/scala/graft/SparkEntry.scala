package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared done in SURVEY §2 has a `queries` entry (run
  * by Verify/Bench against the driver's parquet tables) and, where
  * ANSI-SQL-expressible, a DuckDB `oracleSql` twin. Column names/aliases
  * match pairwise — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` arrives in one of three shapes depending on how the
    * driver generated the parquet and on the session config, so adapt by
    * the OBSERVED type rather than assuming one:
    *  - nanos LONG (TIMESTAMP(NANOS) parquet +
    *    `spark.sql.legacy.parquet.nanosAsLong=true`): convert with
    *    integer division (a double division would lose precision above
    *    2^53 nanos); [[graft.plans.NanoTsPushdown]] restores pushdown.
    *  - TIMESTAMP_NTZ (timestamp[us] parquet, no isAdjustedToUTC): cast
    *    to session-zoned timestamp — the session runs UTC, so values are
    *    identical and downstream `epoch`-based math is unchanged.
    *  - TIMESTAMP: already the canonical shape.
    */
  def eventsTable(s: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(s, dir, "events"))

  /** Normalize an event-shaped frame's `colName` to session-zoned
    * TIMESTAMP regardless of which physical shape the parquet carried
    * (see [[eventsTable]]). Shared by every direct `events.parquet`
    * reader so a driver-side regeneration of the testdata cannot break
    * one copy of the conversion silently.
    */
  def normalizeEventTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast("timestamp"))
      case _ => df
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the real log pipeline over synthetic apache lines generated
    * from the events table (parse -> normalize -> sessionize -> risk).
    */
  def entry(spark: SparkSession): DataFrame =
    Flagship.run(spark, "/root/testdata/sf0.001")

  /** Webshell basenames used by the oracle queries (mirrors the SQL twin
    * in PseudoLog.sqlUriRisk — keep in lockstep).
    */
  val oracleShells: Set[String] = Set("cmd.php", "shell.php", "c99.php", "alfa3.php", "1.php")

  /** Rule set for the q10 oracle: one rule per sigma operator class
    * (gte/lt numeric, contains, startswith, endswith, regex, in, notin,
    * cidr, bare field) with thresholds that actually fire on the
    * pseudo-log distribution.
    */
  val oracleRulesYaml: String =
    """- title: R1 High URI Risk OK
      |  detection: { selection: { uri_risk|gte: 70, status: [200, 201, 202] } }
      |  tags: [ { risk_score: 75.0 } ]
      |- title: R2 Whoami
      |  detection: { selection: { request_uri|contains: whoami, resp_size|gte: 10 } }
      |  tags: [ { risk_score: 71.1 } ]
      |- title: R3 Fofa Referrer
      |  detection: { selection: { referrer|startswith: "https://fofa" } }
      |  tags: [ { risk_score: 67.5 } ]
      |- title: R4 Scanner In Range
      |  detection: { selection: { ip|cidr: ["10.17.0.0/16", "10.42.0.0/16"], user_agent|endswith: "1.7" } }
      |  tags: [ { risk_score: 66.0 } ]
      |- title: R5 Session Repeats With Errors
      |  detection: { selection: { request_count|gte: 2, status: [500, 502, 503, 504] } }
      |  tags: [ { risk_score: 42.0 } ]
      |- title: R7 Status Risk
      |  detection: { selection: { status_risk|gte: 70 } }
      |  tags: [ { risk_score: 40.0 } ]
      |- title: R6 Risky Method On Static
      |  detection: { selection: { request_uri|regex: "p[0-9]+\\.css$", method|in: [PUT, DELETE] } }
      |  tags: [ { risk_score: 30.0 } ]
      |- title: R8 Unknown Method
      |  detection: { selection: { method|notin: [GET, POST, HEAD, PUT, DELETE], uri_risk|lt: 5 } }
      |  tags: [ { risk_score: 20.0 } ]""".stripMargin

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      val lg = PseudoLog.logs(s, dir)
      val sess = Sessionizer.withClusters(lg, threshold = 300L)
      val counted = Sessionizer.withRequestCount(sess)
      val featured = counted
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
      val planted = lg.unionByName(noisy)
      graft.norm.Normalizer.removeDuplicates(planted, col("_row_id"))
        .select(col("_row_id").as("rid"))
    }),

    // ---- beyond-reference: text analysis over documents --------------

    "q20_lang_id" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        graft.textops.TextAnalysis.languageId(col("text")).as("lang_pred"))
    }),

    // char-trigram-profile language ID (the n-gram heuristic variant;
    // q20 is the stopword-count variant) — fully oracle-checked
    "q35_lang_ngram" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        graft.textops.LangNgram.languageIdNgram(col("text")).as("lang_ngram"))
    }),

    "q21_quality" -> ((s, dir) => {
      import graft.textops.TextAnalysis._
      table(s, dir, "documents").select(
        col("doc_id"),
        nTokens(col("text")).as("n_tokens"),
        round4(punctRatio(col("text"))).as("punct_ratio"),
        round4(stopwordRatio(col("text"))).as("stop_ratio"),
        qualityScore(col("text")).as("quality"))
    }),

    // token-repetition ratio (Gopher-style repetition quality signal)
    "q38_repetition" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        graft.textops.TextAnalysis.repetitionRatio(col("text")).as("rep_ratio"))
    }),

    "q22_tokens" -> ((s, dir) => {
      import graft.textops.TextAnalysis._
      table(s, dir, "documents").select(
        col("doc_id"),
        nTokens(col("text")).as("ws_tokens"),
        lexTokenCount(col("text")).as("lex_tokens"))
    }),

    "q23_fingerprint" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        graft.textops.TextAnalysis.fingerprint(col("text")).as("fp"))
    }),

    // exact n-gram Jaccard pairs within (lang, source) buckets
    "q24_ngram_jaccard" -> ((s, dir) => {
      graft.textops.NearDup.ngramJaccardPairs(
        table(s, dir, "documents"), "doc_id", "text",
        bucketCols = Seq(col("lang"), col("source"), expr("n_chars DIV 100")),
        shingleSize = 3, threshold = 0.05)
    }),

    // MinHash+LSH near-dup over the planted corpus (rows-only check:
    // the LSH band hashes are engine-internal; recall is pinned in
    // NearDupSpec against planted duplicates)
    "q25_minhash_lsh" -> ((s, dir) => {
      graft.textops.NearDup.minhashPairs(
        plantedDocs(s, dir), "doc_id", "text", threshold = 0.5)
    }),

    // SimHash near-dup over the planted corpus (rows-only). Capped:
    // boilerplate corpora collapse chunk buckets and an uncapped bucket
    // goes quadratic (ScaleBench's simhash_adversarial_* workloads
    // measure it); the cap never binds on the planted corpus
    // (NearDupSpec pins capped == uncapped there), and the uncapped
    // guarantee is exercised by q40_simhash_recall on its bounded slice.
    "q26_simhash" -> ((s, dir) => {
      graft.textops.NearDup.simhashPairs(
        plantedDocs(s, dir), "doc_id", "text", maxHamming = 6, maxBucketSize = 1000)
    }),

    // brute-force exact cosine top-5 for the first 20 vectors
    "q27_embed_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Ann.cosineTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5)
    }),

    // LSH ANN over the same queries (rows-only; recall pinned in AnnSpec)
    "q28_ann_lsh" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Ann.lshTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nPlanes = 4)
    }),

    // IVF-flat ANN: kmeans coarse quantizer + nprobe cells (rows-only;
    // recall vs brute pinned in AnnSpec)
    "q32_ann_ivf" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Ivf.ivfTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, cacheKey = Some(dir + "#embeddings"))
    }),

    // IVF-PQ ANN: coarse cells + product-quantized codes + ADC
    // shortlist + exact re-rank (rows-only; recall + exact-re-rank
    // equality pinned in AnnSpec)
    "q34_ann_pq" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Pq.ivfPqTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, m = 8, ks = 64, refine = 8,
        cacheKey = Some(dir + "#embeddings"))
    }),

    // winnowing rolling-hash fingerprint overlap (rows-only; passage-
    // copy detection guarantee pinned in WinnowingSpec)
    "q31_winnow_pairs" -> ((s, dir) => {
      graft.textops.NearDup.winnowPairs(
        plantedDocs(s, dir), "doc_id", "text", minSharedRatio = 0.5)
    }),

    // embedding-cosine near-dup pairs over planted perturbed copies
    // (exact, fully oracle-checkable: brute pairwise with the tight-loop
    // dot product)
    "q33_embed_pairs" -> ((s, dir) => {
      graft.textops.NearDup.embeddingCosinePairs(
        plantedEmbeddings(s, dir), "vec_id", "embedding", threshold = 0.99)
    }),

    // near-dup clustering: connected components over a deterministic
    // pair graph (consecutive doc ids sharing a length bucket), the
    // step that turns pairwise near-dup evidence into droppable groups
    "q36_components" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = docs.select(col("doc_id").as("id_a"), expr("n_chars DIV 100").as("_ba"))
        .join(docs.select(col("doc_id").as("id_b"), expr("n_chars DIV 100").as("_bb")),
          col("id_b") === col("id_a") + 1 && col("_ba") === col("_bb"))
        .select("id_a", "id_b")
      graft.operators.Dedup.connectedComponents(docs, "doc_id", edges)
        .select(col("id").as("doc_id"), col("component"))
    }),

    // near-dup DROP: keep each component's smallest-id row (the
    // pipeline action the clustering feeds)
    "q37_drop_neardups" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = docs.select(col("doc_id").as("id_a"), expr("n_chars DIV 100").as("_ba"))
        .join(docs.select(col("doc_id").as("id_b"), expr("n_chars DIV 100").as("_bb")),
          col("id_b") === col("id_a") + 1 && col("_ba") === col("_bb"))
        .select("id_a", "id_b")
      graft.operators.Dedup.dropNearDups(docs, "doc_id", edges)
        .select(col("doc_id"))
    }),

    // multimodal binary-column stats (no decode needed)
    "q29_multimodal_stats" -> ((s, dir) => {
      graft.multimodal.Multimodal.stats(
        graft.multimodal.Multimodal.fromDocuments(table(s, dir, "documents")))
    }),

    // multimodal decode: REAL ImageIO decode for image rows (payloads
    // are deterministically-sized synthetic PNGs, so the oracle predicts
    // the codec's output), deterministic stub for audio/video
    "q30_decode" -> ((s, dir) => {
      graft.multimodal.Multimodal.decode(
        graft.multimodal.Multimodal.withSyntheticVideoPayloads(
          graft.multimodal.Multimodal.withSyntheticAudioPayloads(
            graft.multimodal.Multimodal.withSyntheticImagePayloads(
              graft.multimodal.Multimodal.fromDocuments(table(s, dir, "documents"))))))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"), col("sample_rate"), col("decoded_real"))
    }),

    // ---- recall gates for the candidate-generation families ----
    // Each plants EXACT twins (structural ground truth the oracle
    // recomputes from the base tables) and reports recall over the truth
    // set as a deterministic scalar. The guarantee making the value
    // oracle-predictable: exact copies collide in every minhash band /
    // simhash chunk / winnow fingerprint bucket (uncapped), and an exact
    // twin vector shares every LSH signature + coarse cell, then wins
    // the exact re-rank at cosine 1.0.
    //
    // The near-dup gates run UNCAPPED (that is the guarantee under
    // test), so their corpus is bounded to a fixed 500-doc slice —
    // recall evidence doesn't improve with corpus size, but an uncapped
    // pair join's cost does (winnow at sf0.1 was 188s unbounded).

    "q39_minhash_recall" -> ((s, dir) => {
      val docs = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
      val corpus = docs.unionByName(twinDocs(docs))
      val pairs = graft.textops.NearDup.minhashPairs(
        corpus, "doc_id", "text", threshold = 0.9, maxBucketSize = 0) // 0 = uncapped
      val truth = docs
        .filter(size(graft.textops.NearDup.hashedShingles(col("text"), 3)) > 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("minhash", truth, pairs)
    }),

    "q40_simhash_recall" -> ((s, dir) => {
      val docs = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
      val corpus = docs.unionByName(twinDocs(docs))
      val pairs = graft.textops.NearDup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      val truth = docs
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("simhash", truth, pairs)
    }),

    "q41_winnow_recall" -> ((s, dir) => {
      val docs = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
      val corpus = docs.unionByName(twinDocs(docs))
      val pairs = graft.textops.NearDup.winnowPairs(
        corpus, "doc_id", "text", minSharedRatio = 0.5, maxBucketSize = 0) // 0 = uncapped
      val truth = docs.filter(length(col("text")) >= 5) // k=5: below one k-gram -> no fingerprints
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("winnow", truth, pairs)
    }),

    "q42_lsh_twin_recall" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val res = graft.vector.Ann.lshTopK(
        twinEmbeddings(emb), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5, nPlanes = 4)
      twinRecallOf("ann_lsh", res)
    }),

    "q43_ivf_twin_recall" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val res = graft.vector.Ivf.ivfTopK(
        twinEmbeddings(emb), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, cacheKey = Some(dir + "#embeddings-twin"))
      twinRecallOf("ann_ivf", res)
    }),

    "q44_pq_twin_recall" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val res = graft.vector.Pq.ivfPqTopK(
        twinEmbeddings(emb), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, m = 8, ks = 64, refine = 8,
        cacheKey = Some(dir + "#embeddings-twin"))
      twinRecallOf("ann_pq", res)
    }),

    // PII scrub: deterministic planted emails/IPs/SSNs (by doc_id mod 4;
    // one class in four docs stays clean), counts + redacted text — the
    // oracle replants and re-redacts with the SAME pattern strings
    "q45_pii" -> ((s, dir) => {
      val planted = table(s, dir, "documents").select(
        col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 1,
            concat(lit(" from 10."), col("doc_id") % 256, lit(".0."), col("doc_id") % 100))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 2,
            concat(lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          // phones: E.164 on doc_id%8==7, separated US form on the
          // rest of doc_id%4==3
          when(col("doc_id") % 4 === 3,
            when(col("doc_id") % 8 === 7,
              concat(lit(" call +1555123"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(concat(lit(" call (555) 123-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))))
            .otherwise(lit("")),
          // cards: a Luhn-VALID card on doc_id%10==0 (redacted, counted)
          // and a Luhn-INVALID candidate on doc_id%10==6 (kept, counted
          // only as candidate) — the checksum, not the shape, decides
          when(col("doc_id") % 10 === 0, lit(" card 4242 4242 4242 4242"))
            .when(col("doc_id") % 10 === 6, lit(" card 4242-4242-4242-4243"))
            .otherwise(lit(""))).as("text"))
      graft.textops.Pii.withPiiStats(planted, "text")
        .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_ssn"),
          col("n_phones"), col("n_card_candidates"), col("n_cards"), col("redacted"))
    }),

    // As-of join: every event aligned to its user's most recent
    // checkpoint (events with event_id % 10 == 0) at or before it —
    // DuckDB's native ASOF LEFT JOIN is the oracle. Times are epoch
    // nanos longs (raw parquet nanos when available, else converted
    // from the timestamp) == epoch_ns on the oracle side.
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

    // near-dup drop keeping the BEST row per component (score =
    // n_chars, ties to the smallest id) — same deterministic pair
    // graph as q36/q37, recursive-CTE + window oracle
    "q51_drop_best" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = docs.select(col("doc_id").as("id_a"), expr("n_chars DIV 100").as("_ba"))
        .join(docs.select(col("doc_id").as("id_b"), expr("n_chars DIV 100").as("_bb")),
          col("id_b") === col("id_a") + 1 && col("_ba") === col("_bb"))
        .select("id_a", "id_b")
      // project BEFORE the drop: the component join and the
      // per-component window shuffle only the two columns they need,
      // not the full text payload
      graft.operators.Dedup.dropNearDupsBy(
        docs.select(col("doc_id"), col("n_chars")), "doc_id", col("n_chars"), edges)
    }),

    // composite C4/Gopher-style quality filter: keep verdict + ordered
    // fail reasons from the oracled round4 signals
    "q52_quality_filter" -> ((s, dir) => {
      val v = graft.textops.TextAnalysis.qualityVerdict(col("text"))
      table(s, dir, "documents").select(col("doc_id"), v.as("_v"))
        .select(col("doc_id"), col("_v.n_tokens").as("n_tokens"),
          col("_v.fail_reasons").as("fail_reasons"), col("_v.keep").as("keep"))
    }),

    // substring-level exact dedup: duplicated >=8-token spans (planted
    // licence boilerplate on every 5th doc) trimmed to their globally
    // first occurrence; oracle recomputes windows/keep-first/coverage
    // from the parquet text with string windows (hash-free)
    "q53_dedup_spans" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" " + spanBoiler)))
          .otherwise(col("text")).as("text"))
      graft.textops.SpanDedup.dedupSpans(docs, "doc_id", "text", k = 8)
    }),

    // REAL video pixel decode: video rows get MJPEG-in-AVI payloads
    // (00dc chunks are genuine ImageIO JPEGs), frameFeatures decodes
    // every 2nd frame; the oracle predicts geometry/frame indices from
    // the synthetic-payload formulas and luma_ok = TRUE pins the decoded
    // mean luminance within ±3 of the encoded gray (solid-gray JPEG DC
    // quantization error is <1 level at the default quality)
    "q54_video_frames" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.withSyntheticAviVideoPayloads(
        graft.multimodal.Multimodal.fromDocuments(table(s, dir, "documents")))
      graft.multimodal.Multimodal.frameFeatures(media, stride = 2, maxFrames = 4)
        .select(col("media_id"), col("frame_idx"), col("frame_w"), col("frame_h"),
          (abs(col("mean_luma") -
            (lit(16) + (col("media_id") * 37 + col("frame_idx") * 11) % 224)) <= 3)
            .as("luma_ok"))
    }),

    // BPE token counting under the built-in merges table — the unit a
    // training-data budget is set in (q22's nTokens counts whitespace
    // tokens); oracle = generated from an independent driver-side BPE
    // reference over the same merges (OracleGen.bpeOracle)
    "q55_bpe_tokens" -> ((s, dir) => {
      table(s, dir, "documents").select(col("doc_id"),
        graft.textops.Bpe.bpe_token_count(s, col("text"),
          graft.textops.Bpe.defaultMerges).as("n_bpe_tokens"))
    }),

    // token-budget corpus cut: keep documents in doc_id order while
    // the running whitespace-token total stays within budget — the
    // "fill the training mix" step, via the two-phase range-partitioned
    // cumsum (no unpartitioned window anywhere in the plan)
    "q56_budget_cut" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.Budget.takeWhileBudget(
        docs, col("doc_id"), col("n_tokens"), budget = 20000L,
        cumCol = "cum_tokens", chunkSize = 1000L)
    }),

    // per-(lang, source) quota — the anti-over-representation cap of a
    // corpus mix; one hash shuffle on the group key
    "q57_source_quota" -> ((s, dir) => {
      graft.operators.Budget.quotaPerGroup(
        table(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        Seq(col("lang"), col("source")), col("doc_id"), quota = 20)
    }),

    // C4-style cleaning over planted dirt: tags on doc_id%3==0, a BEL
    // control char + ragged whitespace on %3==1 — the oracle replants
    // identically and runs the same explicit-class regex chain (both
    // dialects' \s differ, so no bare \s anywhere)
    "q58_clean" -> ((s, dir) => {
      val planted = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(lit("<p class=\"x\">"), col("text"), lit("</p> <br>")))
          .when(col("doc_id") % 3 === 1, concat(lit(" "), col("text"), lit("\u0007\t\t end  ")))
          .otherwise(col("text")).as("text"))
      planted.select(col("doc_id"),
        graft.textops.TextAnalysis.cleanText(col("text"), stripTags = true).as("text_clean"))
        .withColumn("n_chars_clean", length(col("text_clean")))
    }),

    // stratified deterministic sample: downweight the over-represented
    // lang (en keeps 32/256), keep the rare ones whole (zh 256), drop
    // strata with no rate (default 0) — same md5 bucket as q48, so the
    // oracle recomputes row fates exactly
    "q59_stratified" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedSample(
        table(s, dir, "documents").select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        Map("en" -> 32, "de" -> 128, "zh" -> 256), defaultKeepBuckets = 64)
    }),

    // per-language token budget (the mix-spec form): one hash shuffle,
    // per-group windowed cumsum, same alias discipline as q56
    "q60_budget_per_lang" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("lang"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.Budget.takeWhileBudgetPerGroup(
        docs, Seq(col("lang")), col("doc_id"), col("n_tokens"),
        budget = 5000L, cumCol = "cum_tokens")
    }),

    // token-bounded output sharding — the materialize-for-training
    // last stage: cut the corpus (in doc_id order) into contiguous
    // <=5000-token shards (a doc never splits; an oversized doc gets
    // its own shard); rides q56's chunked cumsum — ONE full-data
    // shuffle, the shard assignment is a row-local integral DIV
    "q70_token_shards" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.Budget.shardByTokenBudget(
        docs, col("doc_id"), col("n_tokens"), shardBudget = 5000L,
        shardCol = "shard_id", cumCol = "cum_tokens", chunkSize = 1000L)
    }),

    // deterministic global corpus shuffle composed with sharding: the
    // seeded xxhash64 permutation defines the training order, the
    // token cumsum runs in THAT order, shards cut the shuffled stream
    // — shuffle-then-shard, still ONE full-data shuffle. Oracle is
    // generated: engine emits only (doc_id, shuffle_key); DuckDB
    // independently recomputes tokens, the (key, id) order, the
    // cumsum, and the shard assignment
    "q71_shuffle_shard" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.CorpusOrder.shuffleShard(
        docs, seed = 42L, idCol = col("doc_id"), weightCol = col("n_tokens"),
        shardBudget = 5000L)
    }),

    // URL canonicalization + URL-level dedup: the canonicalize-then-
    // dedup step a crawl pipeline runs BEFORE content dedup. Messy
    // URLs planted from doc_id (the q58 replant pattern): variants
    // 0/1/2 collapse to one canonical form (default port, host/scheme
    // case, dot segments, fragment, tracking params), 3 keeps a real
    // param, 4 keeps a non-default port — the oracle replants and
    // canonicalizes with DuckDB string/regex functions and keeps
    // row_number()=1 per canonical key
    "q72_url_dedup" -> ((s, dir) => {
      val n = (col("doc_id") % 50).cast("string")
      val planted = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(lit("https://Example.COM:443/articles/"), n, lit("?utm_source=feed&utm_campaign=x#frag")))
          .when(col("doc_id") % 5 === 1, concat(lit("https://example.com/articles/"), n))
          .when(col("doc_id") % 5 === 2, concat(lit("HTTPS://EXAMPLE.com/news/../articles/"), n, lit("?ref=tw")))
          .when(col("doc_id") % 5 === 3, concat(lit("https://example.com/./articles/"), n, lit("?utm_medium=y&keep=1")))
          .otherwise(concat(lit("http://example.com:8080/Articles/"), n, lit("?a=1&gclid=z&b=2")))
          .as("url"))
      val canon = planted.withColumn("url_canon",
        graft.functions.UrlCanon.canonicalize_url(col("url")))
      graft.operators.Dedup.exact(canon, Seq(col("url_canon")), col("doc_id"))
        .select(col("doc_id"), col("url"), col("url_canon"))
    }),

    // hashed-feature linear quality classifier (fastText-style): train
    // deterministic logistic regression driver-side on the labeled
    // slice (doc_id%10<3), broadcast the weight table, score the whole
    // corpus in one codegen'd pass. Oracle: an independent scorer
    // (own FNV/tokenizer/arithmetic) sharing only the weight vector
    // embeds expected per-doc scores
    "q73_quality_classifier" -> ((s, dir) => {
      val planted = qualityLabeledDocs(s, dir)
      val wts = graft.textops.QualityClassifier.train(
        planted.filter(col("doc_id") % 10 < 3), "text", "label", "doc_id")
      planted.select(col("doc_id"), col("label"),
        graft.textops.QualityClassifier.quality_score(s, col("text"), wts).as("_qs"))
        .select(col("doc_id"), col("label"),
          round(col("_qs.score"), 4).as("score"), col("_qs.pred").as("pred"))
    }),

    // perceptual-hash image near-dup: REAL ImageIO decode -> dHash ->
    // the simhash family's pigeonhole chunk join (fingerprintPairs).
    // Corpus = structured PNGs + byte-distinct brightness-shifted twins
    // (bounded gate corpus, same bound as q39-q44); oracle = generated
    // (engine emits each image's dHash, DuckDB recomputes chunk keys,
    // cap, candidate join, and Hamming verify)
    "q62_image_neardup" -> ((s, dir) => {
      val fps = imageTwinCorpus(s, dir).select(col("media_id"),
        graft.multimodal.PerceptualHash.dhash64(col("bytes")).as("fp"))
      graft.textops.NearDup.fingerprintPairs(
        fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 1000)
    }),

    // planted near-identical-image recall gate: every base image must
    // pair with its brightness-shifted twin (dHash identity under
    // uniform shift => hamming 0 => full recall, uncapped)
    "q63_phash_recall" -> ((s, dir) => {
      val fps = imageTwinCorpus(s, dir).select(col("media_id"),
        graft.multimodal.PerceptualHash.dhash64(col("bytes")).as("fp"))
      val pairs = graft.textops.NearDup.fingerprintPairs(
        fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 0)
      val truth = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("phash", truth, pairs)
    }),

    // audio perceptual near-dup: REAL javax.sound PCM decode ->
    // slice-energy gradient hash -> the same pigeonhole chunk join as
    // q62; corpus = structured WAVs + half-gain twins (byte-distinct,
    // hash-identical); generated oracle recomputes chunk/cap/Hamming
    // from the emitted hashes
    "q66_audio_neardup" -> ((s, dir) => {
      val fps = audioTwinCorpus(s, dir).select(col("media_id"),
        graft.multimodal.PerceptualHash.audio_hash64(col("bytes")).as("fp"))
      graft.textops.NearDup.fingerprintPairs(
        fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 1000)
    }),

    // planted half-gain-twin recall gate (gain invariance => hamming 0
    // => full recall, uncapped)
    "q67_audio_recall" -> ((s, dir) => {
      val fps = audioTwinCorpus(s, dir).select(col("media_id"),
        graft.multimodal.PerceptualHash.audio_hash64(col("bytes")).as("fp"))
      val pairs = graft.textops.NearDup.fingerprintPairs(
        fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 0)
      val truth = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("audiohash", truth, pairs)
    }),

    // video perceptual near-dup: per-sampled-frame dHashes through the
    // REAL MJPEG-in-AVI decode, videos pairing on shared frame hashes
    // via the winnow containment machinery; corpus = structured AVIs +
    // re-edit twins (sampled frames byte-identical, container bytes
    // distinct); generated oracle recomputes cap/denominators/
    // containment from the emitted per-video frame-hash sets
    "q68_video_neardup" -> ((s, dir) => {
      graft.textops.NearDup.fingerprintSetPairs(
        videoFrameHashFrame(s, dir), minSharedRatio = 0.6, maxBucketSize = 200)
    }),

    // planted re-edit-twin recall gate: sampled frame-hash sets are
    // identical -> containment 1.0 -> full recall, uncapped
    "q69_video_recall" -> ((s, dir) => {
      val pairs = graft.textops.NearDup.fingerprintSetPairs(
        videoFrameHashFrame(s, dir), minSharedRatio = 0.6, maxBucketSize = 0)
      val truth = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("videohash", truth, pairs)
    }),

    // bigram-LM perplexity (CCNet-style quality signal): counts trained
    // on the doc_id%10<3 clean slice, broadcast, every doc scored in
    // one narrow codegen'd pass; oracle = generated from an independent
    // driver-side scorer sharing only the trained count table
    "q64_lm_perplexity" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val model = graft.textops.NgramLm.train(
        docs.filter(col("doc_id") % 10 < 3), "text")
      docs.select(col("doc_id"),
        graft.textops.NgramLm.lm_score(s, col("text"), model).as("_lm"))
        .select(col("doc_id"), col("_lm.n_tokens").as("n_tokens"),
          round(col("_lm.avg_nll"), 4).as("avg_nll"),
          round(col("_lm.ppl"), 4).as("ppl"))
    }),

    // eval-set decontamination: the eval corpus = two literal benchmark
    // probes + every 97th document's raw text (a leaked-eval-doc
    // stand-in); corpus docs get a probe planted on doc_id%7 in {3,5}.
    // The eval side's window hashes broadcast; the corpus side is ONE
    // narrow scan — zero shuffles. Oracle recomputes everything from
    // literal token-string windows (q53's hash-free technique)
    "q61_decontaminate" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" " + evalProbe1)))
          .when(col("doc_id") % 7 === 5, concat(col("text"), lit(" " + evalProbe2)))
          .otherwise(col("text")).as("text"))
      graft.textops.SpanDedup.decontaminate(
        docs, "doc_id", "text", evalCorpus(s, dir), "text", k = 8)
    }),

    // the curation-pipeline FLAGSHIP: the full staged chain a real
    // training-data run executes — clean → lang-id → quality filter →
    // content gate (blocked phrases) → exact dedup → near-dup
    // keep-best → span dedup → decontaminate → global token-budget
    // cut → training-shard assignment — composed
    // from the individually-oracled
    // operators into ONE query with ONE generated oracle that
    // recomputes every stage (engine supplies only the stage-4 minhash
    // keys; ExplainAudit records the whole-chain plan in PLANS.md)
    "q65_curation_pipeline" -> ((s, dir) => {
      // three consumers reference stage 4 (edge generation, keep-best,
      // the final lang join) — checkpoint it once instead of
      // recomputing the clean+verdict+dedup subtree per consumer (the
      // parquet-staging shape a production pipeline uses between
      // phases; eager, so the cost lands inside this query's timing)
      val s4 = curationStage4(s, dir).localCheckpoint()
      val edges = graft.textops.NearDup.minhashPairs(
        s4, "doc_id", "text", threshold = 0.5, maxBucketSize = 100)
        .select("id_a", "id_b")
      // project the score early: the component join + keep-best window
      // shuffle (doc_id, len), not the text payload
      val s5 = graft.operators.Dedup.dropNearDupsBy(
        s4.select(col("doc_id"), col("text"), length(col("text")).as("_len")),
        "doc_id", col("_len"), edges).drop("_len")
      val s6 = graft.textops.SpanDedup.dedupSpans(s5, "doc_id", "text", k = 8)
        .select(col("doc_id"), col("text_dedup").as("text"))
      val s7 = graft.textops.SpanDedup.decontaminate(
        s6, "doc_id", "text", evalCorpus(s, dir), "text", k = 8)
        .filter(!col("flagged"))
        .select(col("doc_id"), col("text_clean").as("text"), col("n_tokens"))
      val s8 = graft.operators.Budget.takeWhileBudget(
        s7, col("doc_id"), col("n_tokens"), budget = 15000L, cumCol = "cum_tokens")
      // stage 9: training-shard assignment over the kept prefix — the
      // materialize-for-training tail (write with writeTokenShards);
      // a row-local DIV on the cumsum stage 8 already computed
      s8.join(s4.select(col("doc_id"), col("lang_pred")), Seq("doc_id"))
        .select(col("doc_id"), col("lang_pred"), col("text"),
          col("n_tokens"), col("cum_tokens"))
        .withColumn("shard_id", expr("greatest(cum_tokens - 1L, 0L) div 2000L"))
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

    // deterministic md5-bucket sampling (~12.5%): same kept set in any
    // engine/run/partitioning — the oracle recomputes the bucket in SQL
    "q48_sample" -> ((s, dir) => {
      graft.operators.Sampling.deterministicSample(
        table(s, dir, "documents"), col("doc_id"), keepBuckets = 32)
        .select(col("doc_id"), col("lang"))
    }),

    // rollup aggregation (subtotals + grand total) — Spark rollup and
    // SQL ROLLUP share null-marker semantics
    "q49_rollup" -> ((s, dir) => {
      table(s, dir, "events")
        .withColumn("user_band", col("user_id") % 10)
        .rollup(col("event_type"), col("user_band"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    }),

    // token-window chunking (RAG/embedding prep): 20-token windows,
    // stride 15 (5-token overlap); chunk boundaries are a pure function
    // of the token count, the last chunk is the first to reach the
    // tail. One narrow codegen'd pass — no shuffle; the oracle
    // recomputes windows with list_slice over the same token twin
    "q74_chunk" -> ((s, dir) => {
      graft.textops.Chunker.chunkByTokens(
        table(s, dir, "documents"), col("text"),
        window = 20, stride = 15, keep = Seq(col("doc_id")))
    }),

    // temperature-weighted mixture with repetition (the mT5/XLM-R
    // alpha-smoothing recipe): chars-weighted lang rebalancing against
    // a 400k-char budget at alpha=0.5 — rare langs upsample (epochs
    // repeat whole docs), the dominant lang downweights. Oracle is
    // generated: an independent driver implementation recomputes the
    // per-stratum (n_full, thr) plan from the raw columns; DuckDB
    // recomputes the per-doc 24-bit md5 coin and the epoch explosion
    "q75_mixture" -> ((s, dir) => {
      graft.operators.Mixture.temperatureMix(
        table(s, dir, "documents"), col("doc_id"), col("lang"), col("n_chars"),
        alpha = 0.5, budget = 400000L)
        .select(col("id").as("doc_id"), col("stratum").as("lang"), col("epoch"))
    }),

    // per-source quota cap (the C4/RefinedWeb per-host cap): keep the
    // 8 longest docs per source, rank in rk. ONE window + rank filter
    // — the plan Catalyst bounds map-side via InferWindowGroupLimit
    // (each scan task forwards <= k rows per key before the exchange;
    // ScaleBench phase 1f measures it against both the salted
    // two-phase and the rule-disabled truly-naive window)
    "q76_quota" -> ((s, dir) => {
      graft.operators.Quota.capPerKey(
        table(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        key = Seq(col("source")), order = Seq(col("n_chars").desc),
        id = col("doc_id"), k = 8)
        .select(col("doc_id"), col("source"), col("n_chars"), col("rk").cast("long").as("rk"))
    }),

    // heavy hitters via a Misra-Gries TypedImperativeAggregate:
    // capacity-bounded summary per task, pairwise-merged — the shuffle
    // carries <= capacity rows per task instead of one per distinct
    // term. Capacity (256) exceeds the corpus vocabulary (31 at every
    // sf), so every estimate is EXACT (the MG no-decrement regime) and
    // the exact group-count oracle applies; the bounded-error regime
    // is spec-pinned (HeavyHittersSpec)
    "q80_heavy_hitters" -> ((s, dir) => {
      val terms = table(s, dir, "documents").select(
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      graft.operators.HeavyHitters.topK(terms, "term", capacity = 256, k = 20)
    }),

    // BPE tokenizer TRAINING (the Sennrich learn half; q55 applies a
    // fixed table): one distributed word-count shuffle bounds the
    // corpus work, the merge loop runs driver-side over the frequency
    // table. Output = the ordered merges. Oracle is generated: an
    // INDEPENDENT driver learner (own tokenizer, own counting, own
    // merge rewrite) recomputes the full table from the same corpus
    "q79_bpe_train" -> ((s, dir) => {
      val merges = graft.textops.Bpe.train(
        table(s, dir, "documents"), "text", numMerges = 40)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r) }
        .toDF("rank", "lhs", "rhs")
    }),

    // BM25 inverted-index keyword search: postings built from the
    // lowered token twin, Lucene-variant idf, doc length denormalized
    // into the postings (no doc-side join), top-10 for a 2-term query.
    // Rounded score ranks on both sides; the 2-term sum is
    // order-exact (IEEE addition of two values commutes). Static
    // oracle recomputes tf/df/dl/avgdl/idf from the raw table
    "q77_bm25" -> ((s, dir) => {
      graft.textops.TextIndex.bm25TopK(
        table(s, dir, "documents"), "doc_id", "text",
        query = Seq("table", "window"), k = 10)
        .select(col("id").as("doc_id"), col("score"),
          col("n_terms"), col("rank").cast("long").as("rank"))
    }),

    // SemDeDup-style semantic dedup: k-means cells block the candidate
    // pairs, within-cell cosine >= 0.99 drops the higher id. Planted
    // twin corpus (q33's) so real semantic dups exist. Oracle is
    // generated: engine emits ONLY (vec_id, cell); DuckDB recomputes
    // the within-cell pair join, the cosine arithmetic, and the
    // keep-first rule from the raw embeddings
    "q78_semdedup" -> ((s, dir) => {
      graft.vector.SemDedup.semanticDedup(
        plantedEmbeddings(s, dir), "vec_id", "embedding",
        nClusters = 8, threshold = 0.99,
        cacheKey = Some(dir + "#embeddings-planted"))
        .select(col("id").as("vec_id"), col("cell"), col("kept"))
    }),

    // line-level boilerplate removal (the C4/CCNet line-frequency
    // filter): lines reaching document frequency >= 50 vanish from
    // EVERY doc — the all-occurrences semantics span dedup's
    // history-wins cannot express. Fixture plants a universal nav bar
    // + copyright footer, an every-3rd-doc banner (all df >= 50,
    // dropped) and a per-doc permalink (df = 1, kept) around the real
    // text; the oracle recomputes DF counting, the trim rule, and the
    // list_filter reassembly from scratch
    "q81_line_dedup" -> ((s, dir) => {
      graft.textops.LineDedup.removeBoilerplate(
        lineFixture(s, dir), "doc_id", "text", minDf = 50)
    }),

    // shard-write manifest: the integrity record a materialized
    // training corpus carries — per shard, doc count, token sum, id
    // range, and an ORDER-INDEPENDENT bit_xor checksum of md5-60-bit
    // id:weight hashes, so any engine can re-verify a copy. Composes
    // q71's shuffle-shard assignment; generated oracle recomputes the
    // permutation order, the cumsum, the shard DIV, and the checksum
    "q83_shard_manifest" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      val sharded = graft.operators.CorpusOrder.shuffleShard(
        docs, seed = 42L, idCol = col("doc_id"),
        weightCol = col("n_tokens"), shardBudget = 5000L)
      graft.operators.ShardManifest.manifest(
        sharded, "shard_id", "doc_id", "n_tokens")
    }),

    // KMV distinct-count sketch (TypedImperativeAggregate): per-lang
    // distinct-token estimates with k = 16 minima of the md5-derived
    // 60-bit hash — the shuffle carries <= k longs per (task, lang)
    // instead of one row per distinct value. The ESTIMATOR itself is
    // oracle-checked: DuckDB recomputes the same md5 hashes, takes the
    // k-th smallest, and evaluates the same integer (k-1)*2^60/h_k —
    // both the exact (c < k) and estimating (c >= k) regimes
    "q82_distinct_sketch" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      graft.operators.DistinctSketch.estimateByKey(
        toks, Seq(col("lang")), col("term"), k = 16)
    }),

    // sequence packing — the step after sharding: the corpus token
    // stream (docs concatenated in doc_id order) cut into fixed
    // 512-token training sequences; documents SPLIT across sequence
    // boundaries (the dual of q70's never-split shards), one row per
    // (doc, sequence) overlap. Rides the q56 chunked cumsum — ONE
    // full-data shuffle, the slice explosion is a row-local Generate
    "q84_pack_sequences" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.Packing.packSequences(
        docs, col("doc_id"), col("n_tokens"), seqLen = 512L, chunkSize = 1000L)
    }),

    // corpus snapshot diff — the incremental-curation primitive: old =
    // last crawl (every-89th doc missing, every-13th doc's text at v1),
    // new = today's (every-97th doc dropped); classify every id as
    // added/removed/changed/unchanged by md5 content hash. Both sides
    // project to (id, hash) BEFORE the one full-outer shuffle — the
    // payload never shuffles
    "q85_snapshot_diff" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 89 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0,
            concat(lit("v1 "), coalesce(col("text"), lit(""))))
            .otherwise(col("text")).as("text"))
      val newSnap = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), col("text"))
      graft.operators.SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
    }),

    // domain blocklist gate — the URL-level filter before any content
    // work: hosts matching a blocked domain by the label-aligned
    // suffix rule (exact or ".domain"-suffixed; "nottracker.example"
    // must NOT match "tracker.example"). Uses the SCALE path: suffix
    // chain explode + equi-join against the blocklist table — only
    // (id, suffix) pairs shuffle, AQE broadcasts the hit set
    "q86_blocklist" -> ((s, dir) => {
      import s.implicits._
      val n = (col("doc_id") % 50).cast("string")
      val planted = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(lit("https://ads.tracker.example/p/"), n))
          .when(col("doc_id") % 7 === 1, concat(lit("https://tracker.example/x/"), n))
          .when(col("doc_id") % 7 === 2, concat(lit("https://nottracker.example/x/"), n))
          .when(col("doc_id") % 7 === 3, concat(lit("https://spam.net:8443/y/"), n))
          .when(col("doc_id") % 7 === 4, concat(lit("https://user:pw@sub.spam.net/z/"), n))
          .when(col("doc_id") % 7 === 5, lit("not a url"))
          .otherwise(concat(lit("https://good.example.org/ok/"), n)).as("url"))
      val blocklist = Seq("tracker.example", "spam.net").toDF("domain")
      graft.operators.Blocklist.flagBlocked(
        planted.withColumn("url_host", graft.operators.Blocklist.urlHost(col("url"))),
        "doc_id", col("url_host"), blocklist)
        .select(col("doc_id"), col("url_host"), col("blocked"))
    }),

    // cross-stratum overlap estimation: pairwise per-lang vocabulary
    // Jaccard from KMV sketches — ONE data pass (<= k longs per
    // (task, lang) shuffled), pairwise arithmetic on the #langs-row
    // sketch frame. The KMV union identity (k smallest of A∪B all lie
    // in A's or B's minima) makes the merged sketch EQUAL the union's
    // sketch, so DuckDB recomputes every estimate from raw text
    "q87_corpus_overlap" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      graft.operators.DistinctSketch.overlapByKey(
        toks, col("lang"), col("term"), k = 64)
    }),

    // distributed fixed-point Lloyd refinement — the corpus-scale
    // quantizer path (the driver-sample fit's companion): 2 exact
    // Lloyd iterations over the full embeddings table from a
    // deterministic lowest-8-ids init; coordinates quantize to 2^40
    // fixed-point so the distributed sums are integer-exact and the
    // refined centroids are partitioning-independent. Per iteration:
    // one narrow assign scan + ONE (cell, pos) hash aggregation —
    // k*dim summary rows shuffle, never vectors. Generated oracle: an
    // independent driver scorer (own loops, own BigInt sums) embeds
    // the expected per-vector cells — exact, not approximate, BECAUSE
    // of the fixed-point contract
    "q88_kmeans_refine" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val init = graft.vector.Ivf.initFromIds(emb, "vec_id", "embedding", 8)
      val centers = graft.vector.Ivf.refineCentroids(emb, "embedding", init, iters = 2)
      emb.select(col("vec_id"),
        graft.vector.Ivf.nearest_cells(col("embedding"), centers, 1)
          .getItem(0).as("cell"))
    }),

    // count-min sketch point estimates — Misra-Gries' companion (q80
    // answers WHICH keys are hot; this answers HOW OFTEN for any
    // probed key) in one pass with depth*width fixed memory per task.
    // Buckets are md5-derived ("d:term" % width), so the DuckDB
    // oracle rebuilds the identical sketch from raw counts and takes
    // the same min-over-rows — the estimator itself is hash-checked
    "q89_count_min" -> ((s, dir) => {
      val terms = table(s, dir, "documents").select(col("doc_id"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      val probes = terms.filter(col("doc_id") < 3).select(col("term"))
      graft.operators.CountMin.estimateProbes(
        terms, col("term"), probes, "term", depth = 4, width = 1024)
    }),

    // markup-to-text extraction — the crawl stage ahead of cleaning:
    // script/style BODIES drop (bare tag-stripping would leak code
    // into the text — the fixture's script contains `1 < 2` to prove
    // the order matters), comments drop, tags strip to spaces, common
    // entities decode (&amp; last ≡ a strict single-pass decoder),
    // whitespace collapses. One codegen'd builtin chain, zero
    // shuffles; the DuckDB oracle runs the same RE2-compatible chain
    "q90_strip_markup" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>doc "), col("doc_id").cast("string"),
        lit("</title><style type=\"text/css\">body { color: red; }</style>"),
        lit("<script>var x = 1 < 2 && \"a\";</script></head><body><!-- nav bar -->"),
        lit("<div class=\"main\"><p>"), coalesce(col("text"), lit("")),
        lit("</p><br/>Tom &amp; Jerry &lt;3 &quot;quoted&quot; it&#39;s" +
          " here&nbsp;&gt;end</div></body></html>"))
      table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.stripMarkup(html).as("text_clean"))
        .withColumn("n_chars", length(col("text_clean")).cast("long"))
    }),

    // Bloom membership sketch — the seen-set prefilter: ONE fixed-size
    // aggregation over the corpus vocabulary (m/64 longs per task),
    // probes answered against the broadcast one-row sketch frame by
    // pure Column arithmetic. Probes mix present terms (must all be
    // true — no false negatives) with planted absent keys (false
    // unless a real double-hash collision fills all 5 bits — the
    // oracle recomputes the exact set-bit set, so even a false
    // positive must MATCH)
    "q91_bloom" -> ((s, dir) => {
      val terms = table(s, dir, "documents").select(col("doc_id"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      val present = terms.filter(col("doc_id") < 3).select(col("term"))
      val absent = s.range(0, 8)
        .select(concat(lit("zzz_absent_"), col("id").cast("string")).as("term"))
      graft.operators.Bloom.mightContainProbes(
        terms, col("term"), present.union(absent), "term",
        m = 1 << 17, k = 5)
    }),

    // Unicode NFC canonicalization — the normalize-before-hash step:
    // composed and decomposed spellings of the same text must collide
    // in every dedup family. The corpus is ASCII (the expression's
    // zero-copy fast path), so the planted prefix carries the real
    // cases: combining acute, combining ring, the ANGSTROM/OHM
    // singletons, hangul jamo, an already-composed é, and a
    // reorder-only cluster (dot-above after dot-below). Both engines
    // run the stability-guaranteed UAX #15 algorithm — the comparison
    // is exact, including char counts shrinking by composition
    "q92_nfc" -> ((s, dir) => {
      val raw = concat(
        lit("é Å Å Ω 가 é q̣̇ "),
        coalesce(col("text"), lit("")))
      table(s, dir, "documents")
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          graft.textops.TextAnalysis.nfc_normalize(col("raw")).as("text_nfc"),
          length(col("raw")).cast("long").as("n_chars_raw"),
          length(graft.textops.TextAnalysis.nfc_normalize(col("raw")))
            .cast("long").as("n_chars_nfc"))
    }),

    // deterministic train/val/test split — a row-local salted-md5
    // labeling (zero shuffles): stable across runs, partitionings and
    // corpus versions (adding/removing docs never moves a survivor
    // between splits — the leak random splits create). test/val take
    // the LOW buckets so growing either rate only drains train
    "q93_split" -> ((s, dir) => {
      graft.operators.Sampling.assignSplit(
        table(s, dir, "documents").select(col("doc_id")), col("doc_id"),
        valBuckets = 13, testBuckets = 26)
    }),

    // PageRank over a deterministic doc-id link graph (two modular
    // out-links per doc + a hub link to doc 0 from every 10th doc):
    // 5 exact fixed-point power iterations — the oracle recomputes the
    // SAME integer recurrence through 5 unrolled CTE iterations, so the
    // ranks hash-match exactly (no float tolerance anywhere).
    "q94_pagerank" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id * 7 + 1) % $n").as("dst"))
      val e2 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id * 13 + 2) % $n").as("dst"))
      val e3 = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("src"), lit(0L).as("dst"))
      graft.operators.LinkGraph.pageRank(
          docs, "doc_id", e1.union(e2).union(e3), iters = 5)
        .select(col("doc_id"), col("rank").as("rank_fp"))
    }),

    // weighted sample without replacement (Efraimidis–Spirakis A-ES,
    // md5-derived uniforms): 100 docs weight-proportional by size —
    // the oracle recomputes u, ln(u)/w, and the top-k cut in DuckDB
    "q95_weighted_sample" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), (coalesce(col("n_chars"), lit(0L)) + 1).as("w"))
      graft.operators.Sampling.weightedSample(docs, col("doc_id"), col("w"), k = 100)
    }),

    // positional phrase search: docs containing the exact consecutive
    // token trigram, with occurrence counts; the oracle slides a
    // list_slice window over the same token twin
    "q96_phrase_search" -> ((s, dir) => {
      graft.textops.TextIndex.phraseSearch(
          table(s, dir, "documents"), "doc_id", "text",
          Seq("slow", "hash", "batch"))
        .select(col("id").as("doc_id"), col("n_occ"))
    }),

    // trigram stupid-backoff LM (Brants et al. 2007) — the web-scale
    // companion to q64's interpolated bigram: same clean-slice train /
    // score-all shape, backoff chain trigram -> bigram -> Laplace
    // unigram with the fixed 0.4 multiplier; oracle is an independent
    // driver scorer sharing only the trained count arrays
    "q97_backoff_lm" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val model = graft.textops.NgramLm.trainTrigram(
        docs.filter(col("doc_id") % 10 < 3), "text")
      docs.select(col("doc_id"),
        graft.textops.NgramLm.lm_score3(s, col("text"), model).as("_lm"))
        .select(col("doc_id"), col("_lm.n_tokens").as("n_tokens"),
          round(col("_lm.avg_nll"), 4).as("avg_nll"),
          round(col("_lm.ppl"), 4).as("ppl"))
    }),

    // accent stripping (NFD -> drop Mn -> NFC) over an accents-planted
    // fixture + lowercase fold: the dedup/search normalization key.
    // DuckDB's strip_accents computes the same mark removal on this
    // repertoire (no singleton decompositions planted)
    "q98_strip_accents" -> ((s, dir) => {
      val raw = concat(
        lit("étude Ångström naïve façade " +
          "Ḩusáin q̣̇ "),
        coalesce(col("text"), lit("")))
      table(s, dir, "documents")
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          lower(graft.textops.TextAnalysis.strip_accents(col("raw")))
            .as("text_folded"),
          length(col("raw")).cast("long").as("n_chars_raw"),
          length(graft.textops.TextAnalysis.strip_accents(col("raw")))
            .cast("long").as("n_chars_stripped"))
    }),

    // multi-phrase content filter (the C4-style badwords gate): flag
    // docs containing any listed phrase, with per-doc hit counts — all
    // phrases matched in ONE positional scan; oracle unions a
    // sliding-window check per phrase over the token twin
    "q99_content_filter" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val hits = graft.textops.TextIndex.phraseSetSearch(
          docs, "doc_id", "text",
          Seq(Seq("slow", "hash", "batch"), Seq("order", "fast"), Seq("merge")))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("_np"), sum(col("n_occ")).as("_ns"))
      docs.select(col("doc_id"))
        .join(hits, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("_np"), lit(0L)).as("n_phrases_hit"),
          coalesce(col("_ns"), lit(0L)).as("n_spans"),
          (coalesce(col("_np"), lit(0L)) > 0).as("blocked"))
    }),

    // host-level PageRank joined back per document — the composed
    // pipeline shape: extract hosts from planted doc URLs (the q72/q86
    // URL machinery), build the distinct host link graph (+ a hub),
    // md5-60-bit host ids (the family's engine-agnostic hash; the
    // oracle never needs them — it runs the same recurrence keyed on
    // the host STRINGS), rank with the q94 fixed-point iterations, and
    // broadcast-join host_rank back to every document
    "q100_host_rank" -> ((s, dir) => {
      import graft.operators.{Blocklist, DistinctSketch, LinkGraph}
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(lit("https://h"), (col("doc_id") % 20).cast("string"),
          lit(".example/p/"), col("doc_id").cast("string")).as("url"),
        concat(lit("https://h"), ((col("doc_id") * 3 + 1) % 20).cast("string"),
          lit(".example/x")).as("out_link"))
      val withHosts = planted.select(col("doc_id"),
        Blocklist.urlHost(col("url")).as("host"),
        Blocklist.urlHost(col("out_link")).as("tgt"))
      val nodes = withHosts.select(col("host")).distinct()
        .withColumn("hid", DistinctSketch.hash60(col("host")))
      val edges = withHosts.select(col("host").as("sh"), col("tgt").as("dh"))
        .union(withHosts.select(col("host").as("sh"), lit("h0.example").as("dh")))
        .distinct()
        .select(DistinctSketch.hash60(col("sh")).as("src"),
          DistinctSketch.hash60(col("dh")).as("dst"))
      val ranks = LinkGraph.pageRank(nodes, "hid", edges, iters = 5)
      withHosts.select(col("doc_id"), col("host"))
        .join(broadcast(nodes.join(ranks, "hid")), "host")
        .select(col("doc_id"), col("host"), col("rank").as("host_rank_fp"))
    }),

    // Aho–Corasick dictionary matching: the large-list content-filter
    // scale path (q99's plan-constant phrase list caps out at dozens;
    // the broadcast automaton takes 10^4-10^6 patterns in one linear
    // codegen'd pass). Patterns here are borderless (no proper
    // prefix==suffix), so the automaton's overlapping end-position
    // count equals the replace-count the DuckDB oracle computes
    "q101_dictionary_match" -> ((s, dir) => {
      val patterns = Seq("merge", "slow hash", "spark", "window dup")
      val auto = graft.textops.PhraseAutomaton.build(patterns)
      val packed = graft.textops.PhraseAutomaton.ac_match(
        s, coalesce(col("text"), lit("")), auto)
      table(s, dir, "documents")
        .select(col("doc_id"), packed.as("_m"))
        .select(col("doc_id"),
          graft.textops.PhraseAutomaton.ac_hits(col("_m")).as("n_hits"),
          graft.textops.PhraseAutomaton.ac_distinct(col("_m")).as("n_patterns"),
          (graft.textops.PhraseAutomaton.ac_distinct(col("_m")) > 0).as("flagged"))
    }),

    // corpus report: the per-(source, lang) dashboard rollup a curation
    // run publishes — doc/char/token totals and token-length extremes
    // with ROLLUP subtotals (q49's grouping-set discipline on the
    // documents table; the token twin is q22's)
    "q102_corpus_report" -> ((s, dir) => {
      import graft.textops.TextAnalysis
      val enriched = table(s, dir, "documents").select(
        col("source"), col("lang"),
        coalesce(col("n_chars"), lit(0L)).as("_nc"),
        TextAnalysis.nTokens(col("text")).cast("long").as("_ntok"))
      enriched.rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("_nc")).as("total_chars"),
          sum(col("_ntok")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("_ntok")).as("min_tokens"),
          max(col("_ntok")).as("max_tokens"))
    }),

    // per-stratum weighted sample: 20 docs per language, weight = doc
    // size — q95's A-ES key through the plain-window form that
    // InferWindowGroupLimit prunes map-side (the q76 lesson applied to
    // sampling); oracle recomputes key and per-lang rank in DuckDB
    "q103_weighted_per_lang" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (coalesce(col("n_chars"), lit(0L)) + 1).as("w"))
      graft.operators.Sampling.weightedSamplePerKey(
        docs, col("doc_id"), col("w"), col("lang"), k = 20)
    }),

    // TrustRank: q94's link graph with teleport mass restricted to a
    // trusted seed set (every 25th doc) — rank measures
    // link-distance-discounted reachability from trusted ground; the
    // oracle masks init and base with the same seed CASE
    "q104_trustrank" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id * 7 + 1) % $n").as("dst"))
      val e2 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id * 13 + 2) % $n").as("dst"))
      val e3 = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("src"), lit(0L).as("dst"))
      val seeds = docs.filter(col("doc_id") % 25 === 0)
      graft.operators.LinkGraph.personalizedPageRank(
          docs, "doc_id", e1.union(e2).union(e3), seeds, iters = 5)
        .select(col("doc_id"), col("rank").as("trust_fp"))
    }),

    // per-node triangle counts on an undirected link graph — the local
    // clustering signal (spam farms are triangle-dense). Chain edges
    // (+1, +2 mod n) guarantee a triangle per consecutive triple; the
    // q94 modular edges add irregular noise. Oracle is a brute
    // canonical triple join over the deduped edge set
    "q105_triangles" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id + 1) % $n").as("dst"))
      val e2 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id + 2) % $n").as("dst"))
      val e3 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id * 7 + 1) % $n").as("dst"))
      graft.operators.LinkGraph.triangleCounts(e1.union(e2).union(e3))
        .select(col("id").as("doc_id"), col("n_triangles"))
    }),

    // local clustering coefficient over the q105 graph — integer
    // x10000 emission so no float division crosses engines
    "q106_clustering" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val e1 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id + 1) % $n").as("dst"))
      val e2 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id + 2) % $n").as("dst"))
      val e3 = docs.select(col("doc_id").as("src"),
        expr(s"(doc_id * 7 + 1) % $n").as("dst"))
      graft.operators.LinkGraph.clusteringCoeff(e1.union(e2).union(e3))
        .select(col("id").as("doc_id"), col("degree"),
          col("n_triangles"), col("coeff_x10000"))
    }),

    // sentence segmentation ([[graft.textops.TextAnalysis.sentences]])
    // over a fixture exercising every protection rule — abbreviation
    // (Dr., Inc.), decimal (3.14), ellipsis (Hmm...), e.g. — the
    // corpus text itself is terminator-free word salad forming the
    // final sentence. Engine-identical rule set: no lookaround (RE2
    // has none), shared abbreviation list, placeholder restore
    "q107_sentences" -> ((s, dir) => {
      val raw = concat(lit(sentenceFixturePrefix),
        coalesce(col("text"), lit("")))
      table(s, dir, "documents")
        .select(col("doc_id"),
          graft.textops.TextAnalysis.sentences(raw).as("_s"))
        .select(col("doc_id"), size(col("_s")).cast("long").as("n_sents"),
          posexplode(col("_s")).as(Seq("sent_idx", "sentence")))
        .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
          col("sentence"), col("n_sents"))
    }),

    // sentence-aligned chunking (the RAG-quality default): q107's
    // fixture plus a per-doc-varying run of 4-token filler sentences,
    // binned at 12 tokens — chunks overrun by at most one sentence,
    // and the giant terminator-free corpus tail pins the
    // longer-than-window single-sentence rule
    "q108_sentence_chunks" -> ((s, dir) => {
      val raw = concat(lit(sentenceFixturePrefix),
        expr("repeat('Alpha beta gamma delta. ', CAST(doc_id % 5 + 3 AS INT))"),
        coalesce(col("text"), lit("")))
      val docs = table(s, dir, "documents").select(col("doc_id"), raw.as("text"))
      graft.textops.Chunker.chunkBySentences(
        docs, col("text"), window = 12, keep = Seq(col("doc_id")))
    }),

    // WARC/WET ingestion round-trip with planted corruption: every doc
    // renders as a WET conversion record (Column concat, distributed
    // write), with doc_id%13==5 under-declaring Content-Length (the
    // separator check then lands in payload bytes) and doc_id%13==9
    // dropping the header entirely; the streaming parser must flag
    // BOTH, salvage their header identities, resync to the next
    // record, and hand every clean payload back byte-exact. The
    // oracle recomputes the whole outcome from the documents table —
    // the parser's verdicts are a pure function of the fixture rules
    "q109_warc" -> ((s, dir) => {
      import graft.sources.WarcCorpus
      val fixDir = warcFixtureDir(dir)
      val docs = table(s, dir, "documents").select(col("doc_id"),
        concat(lit("doc "), col("doc_id").cast("string"), lit(" "),
          coalesce(col("text"), lit(""))).as("p"))
      val plen = length(col("p").cast("binary"))
      val declared = when(col("doc_id") % 13 === 5, plen - 4).otherwise(plen)
      val clHeader = when(col("doc_id") % 13 === 9, lit(""))
        .otherwise(concat(lit("Content-Length: "), declared.cast("string"),
          lit("\r\n")))
      val rec = concat(
        lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: " +
          "http://fixture.example/doc/"),
        col("doc_id").cast("string"), lit("\r\n"),
        lit("WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: text/plain\r\n"),
        clHeader, lit("\r\n"), col("p"), lit("\r\n\r\n"))
      WarcCorpus.writeRecords(docs.select(rec.as("rec")), col("rec"), fixDir)
      WarcCorpus.readWarc(s, fixDir)
        .select(
          regexp_extract(col("target_uri"), "doc/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          coalesce(col("reason"), lit("ok")).as("status"),
          col("content_length"),
          decode(col("payload"), "UTF-8").as("text"))
    }),

    // mergeable quantile sketch: per-source token-length p50/p90/p99
    // via the bottom-k value-count sketch (multiset-pure — unlike
    // KLL/GK its output is independent of stream and merge order, so
    // the oracle recomputes it EXACTLY in both regimes: ORDER BY
    // (hash, value) LIMIT k, then a cumulative-sum lower quantile
    // over the retained histogram). k=16 so corpus sources (whose
    // distinct token-length count exceeds it) run the estimator
    // regime, not just the exact one
    "q110_quantile_sketch" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("source"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("ntok"))
      graft.operators.QuantileSketch.quantilesByKey(
        docs, Seq(col("source")), col("ntok"), k = 16)
    }),

    // jusText-style main-content block classification over a planted
    // nav/heading/body/promo/footer page (the q81 fixture discipline:
    // the corpus text is the body block; boilerplate is planted around
    // it). The oracle re-runs block segmentation, per-block link/text
    // stats, and the keep rule from scratch in SQL
    "q111_main_content" -> ((s, dir) => {
      val html = concat(
        lit("<div class=\"nav\"><a href=\"/\">Home</a> " +
          "<a href=\"/about\">About</a> " +
          "<a href=\"/contact\">Contact menu links</a></div>"),
        lit("<h1>Title "), col("doc_id").cast("string"), lit("</h1>"),
        lit("<p>"), coalesce(col("text"), lit("")), lit("</p>"),
        when(col("doc_id") % 3 === 0,
          lit("<div class=\"promo\"><a href=\"/sub\">subscribe to our " +
            "newsletter today</a></div>")).otherwise(lit("")),
        lit("<p>Short note.</p>"),
        lit("<footer><a href=\"/t\">terms</a> <a href=\"/p\">privacy</a> " +
          "<a href=\"/c\">copyright example corp</a></footer>"))
      graft.textops.MainContent.blocks(
        table(s, dir, "documents"), Seq(col("doc_id")), html)
    }),

    // compression-ratio gate over a three-regime fixture: template
    // spam (doc_id%3==0, pathologically compressible), plain corpus
    // text, and base64 soup (doc_id%3==2, nearly incompressible).
    // Oracle: q64's independent-driver-scorer technique — DuckDB has
    // no deflate, so per-doc ratios from a SECOND implementation
    // (stream path vs the engine's manual loop, sharing only the
    // level-6/raw-stream constants) embed as a VALUES CTE and the
    // flags recompute in SQL
    "q112_compression" -> ((s, dir) => {
      val sig = graft.textops.Compression.compressionSignal(col("ftext"))
      compressionFixture(s, dir)
        .select(col("doc_id"), sig.as("_s"))
        .select(col("doc_id"),
          col("_s.raw_bytes").as("raw_bytes"),
          col("_s.deflate_bytes").as("deflate_bytes"),
          col("_s.ratio_x10000").as("ratio_x10000"),
          when(col("_s.ratio_x10000") < 1500, "too_compressible")
            .when(col("_s.ratio_x10000") > 6000, "incompressible")
            .otherwise("ok").as("flag"))
    }),

    // bounded edit-distance similarity self-join over planted titles:
    // every doc gets "report <id> summary"; %4==0 docs add a
    // substitution twin ("repost"), %4==2 docs a distance-2 decoy
    // ("rxpxrt", must never pair at maxD=1); numeric ids supply
    // organic digit-substitution and insertion pairs ("report 12" vs
    // "report 123"). Oracle replays the FastSS deletion-variant
    // candidate join in substr algebra and verifies with DuckDB's
    // native levenshtein
    "q113_edit_join" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"))
      def titles(off: Int, word: String, cond: Column) =
        docs.filter(cond).select((col("doc_id") * 4 + off).as("sid"),
          concat(lit(word + " "), col("doc_id").cast("string"),
            lit(" summary")).as("s"))
      val all = titles(0, "report", lit(true))
        .union(titles(1, "repost", col("doc_id") % 4 === 0))
        .union(titles(2, "rxpxrt", col("doc_id") % 4 === 2))
      graft.textops.EditDistance.editSimilarityJoin(all, col("sid"), col("s"))
    }),

    // interleaved text+media training documents: 16-token tile chunks
    // at even positions, each doc's media segment (q29's kind formula,
    // plan-constant token costs) anchored at odd position
    // (doc_id%4)*2+1 — the assembled sequence is the multimodal
    // training shape. Oracle rebuilds the interleaving from the q74
    // chunker twin + the media formulas and re-ranks it
    "q114_interleave" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val chunks = graft.textops.Chunker.chunkByTokens(
        docs, col("text"), window = 16, stride = 16, keep = Seq(col("doc_id")))
        .select(col("doc_id").as("id"), (col("chunk_idx") * 2).as("pos"),
          col("chunk_text").as("content"),
          col("chunk_tokens").as("seg_tokens"))
      val kind = element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int"))
      val media = docs.select(col("doc_id").as("id"),
        ((col("doc_id") % 4) * 2 + 1).as("pos"),
        col("doc_id").as("media_id"), kind.as("kind"),
        graft.multimodal.Interleave.mediaTokenCost(kind).as("seg_tokens"))
      graft.multimodal.Interleave.interleave(chunks, media, maxSegments = 64)
        .withColumnRenamed("id", "doc_id")
    }),

    // HTML outlink extraction + RFC 3986 resolution over a planted
    // page fixture exercising every href shape (absolute, protocol-
    // relative, rooted, relative, dot-relative, unquoted/single-quoted
    // attributes, javascript:/mailto:/empty/fragment-only refs).
    // Oracle: extraction + quote-strip + dst_host recompute in DuckDB
    // from the same fixture formula; resolution comes from an
    // INDEPENDENT implementation (java.net.URI) embedded as VALUES —
    // the engine's hand-written §5.2 transform must agree with the
    // JDK's on every emitted row (OracleGen.linkOracle)
    "q115_outlinks" -> ((s, dir) => {
      val fx = linkFixture(s, dir)
      graft.textops.LinkExtract
        .outlinks(fx, Seq(col("doc_id")), col("page_url"), col("html"))
        .select("doc_id", "link_idx", "href", "url", "dst_host")
    }),

    // unigram-LM (SentencePiece-style) tokenizer TRAINING: hard-EM
    // over the distributed word-frequency table, then the corpus-exact
    // refine M-step. Output = the final vocabulary with fixed-point
    // log-prob scores. Oracle: a fully INDEPENDENT driver-side trainer
    // (immutable collections, memoized recursion — OracleGen
    // .unigramOracle) replays seed/EM/refine under the shared
    // determinism rules and embeds the expected vocab as VALUES —
    // the q79 bpe-train discipline, one level up
    "q116_unigram_train" -> ((s, dir) => {
      val model = unigramModel(s, dir)
      import s.implicits._
      model.pieces.zip(model.scores).toSeq
        .map { case (p, sc) => (p, Math.floor(sc * 1e6).toLong) }
        .toDF("piece", "score_x1e6")
    }),

    // the APPLY half: Viterbi-segment every document under the q116
    // model (one codegen'd pass over the broadcast vocab); per-doc
    // piece count + an md5 over the piece sequence pin the exact
    // segmentation without exploding rows. Oracle embeds both from the
    // independent trainer's own Viterbi
    "q117_unigram_segment" -> ((s, dir) => {
      val model = unigramModel(s, dir)
      table(s, dir, "documents").select(col("doc_id"),
        graft.textops.Unigram
          .unigram_segment(s, coalesce(col("text"), lit("")), model).as("ps"))
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_pieces"),
          md5(concat_ws("", col("ps"))).as("seg_md5"))
    }),

    // hashing-trick TF-IDF cosine top-k — the embedding-free
    // similarity path (q27's shape with vectors the engine BUILDS
    // instead of reads): md5 bucket hashing, smooth idf, dense
    // array-order arithmetic, stop-bucket-capped candidate join.
    // Static oracle recomputes everything from the tokens up
    "q118_tfidf_topk" -> ((s, dir) =>
      graft.textops.TfIdf.cosineTopK(
        table(s, dir, "documents"), "doc_id", "text",
        probePred = col("doc_id") < 16, k = 5)),

    // robots-style longest-prefix URL gate over a planted per-host
    // rule table: /private disallowed but /private/ok re-allowed
    // (longest wins), /tmp allow+disallow tie on host3 (allow wins),
    // host5 blanket-disallowed, host6 ruleless (opt-out default),
    // %5==4 URLs have an empty path (reads as "/"). Static oracle
    // replays the whole decision in SQL with the rules as VALUES
    "q119_robots_gate" -> ((s, dir) => {
      val id = col("doc_id")
      val url = concat(lit("https://host"), (id % 7).cast("string"),
        lit(".example.com"),
        when(id % 5 === 0, concat(lit("/private/page"), id.cast("string")))
          .when(id % 5 === 1, concat(lit("/private/ok/page"), id.cast("string")))
          .when(id % 5 === 2, concat(lit("/public/page"), id.cast("string")))
          .when(id % 5 === 3, concat(lit("/tmp/x"), id.cast("string")))
          .otherwise(lit("")))
      val urls = table(s, dir, "documents").select(id, url.as("url"))
      import s.implicits._
      val rules = (0 until 6).flatMap { k =>
        val h = s"host$k.example.com"
        Seq((h, false, "/private"), (h, true, "/private/ok")) ++
          (if (k % 2 == 0) Seq((h, false, "/tmp")) else Nil) ++
          (if (k == 3) Seq((h, false, "/tmp"), (h, true, "/tmp")) else Nil) ++
          (if (k == 5) Seq((h, false, "/")) else Nil)
      }.toDF("host", "allow", "prefix")
      graft.operators.RobotsGate.decide(
        urls, Seq(col("doc_id")), col("url"), rules)
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
      val scored = lg.select(col("request_uri")).distinct()
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

    // mojibake repair over a byte-pinned planted repertoire (the q98
    // discipline): %4==0 Latin-1-style mis-decode, %4==1 a CP1252
    // curly-quote mis-decode, %4==2 plain ASCII (fast path), %4==3
    // GENUINE accented text that must survive untouched (0xE9+ASCII
    // is not valid UTF-8). Static oracle: the fixture's four expected
    // outcomes as literals — the repair function itself is pinned by
    // MojibakeSpec's JDK-transcode round-trip properties
    "q121_mojibake" -> ((s, dir) => {
      val v = (col("doc_id") % 4).cast("int")
      val raw = when(v === 0, lit("cafÃ© rÃ©sumÃ©"))
        .when(v === 1, lit("itâ€™s â€˜naÃ¯veâ€™â€¦"))
        .when(v === 2, concat(lit("plain ascii doc "), col("doc_id").cast("string")))
        .otherwise(lit("café already-correct naïve"))
      table(s, dir, "documents").select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"), col("raw"),
          graft.textops.Mojibake.fix_mojibake(col("raw")).as("fixed"))
        .withColumn("changed", col("fixed") =!= col("raw"))
    }),

    // cluster-balanced diversity sampling: 100 rows across 8 k-means
    // cells by Hamilton apportionment, md5-ranked within cell. Oracle
    // = q78's discipline: the (vec_id, cell) assignments are the only
    // engine-supplied keys; allocation, capping, ranking, and the cut
    // all recompute in SQL from them
    "q122_diversity_sample" -> ((s, dir) =>
      graft.vector.DiversitySample.clusterBalanced(
        s, table(s, dir, "embeddings"), "vec_id", "embedding",
        nCells = 8, total = 100, salt = "div9",
        cacheKey = Some(dir + "#embeddings"))
        .withColumnRenamed("id", "vec_id")),

    // the crawl loop CLOSED: q115's extracted+resolved outlinks →
    // distinct (src_host, dst_host) edges (self-links dropped) →
    // q94's integer PageRank over md5-60-bit host ids → per-host
    // fixed-point ranks. Host payloads never enter the iteration
    // (q100's discipline); the oracle replays edges from the embedded
    // independent resolution and the recurrence on host strings
    "q123_outlink_rank" -> ((s, dir) => {
      import graft.operators.{Blocklist, DistinctSketch, LinkGraph}
      val fx = linkFixture(s, dir)
      val links = graft.textops.LinkExtract
        .outlinks(fx, Seq(col("doc_id")), col("page_url"), col("html"))
      val pages = fx.select(col("doc_id"),
        Blocklist.urlHost(col("page_url")).as("src_host"))
      val hostEdges = links.select(col("doc_id"), col("dst_host"))
        .join(pages, "doc_id")
        .filter(col("dst_host").isNotNull &&
          col("dst_host") =!= col("src_host"))
        .select(col("src_host").as("sh"), col("dst_host").as("dh"))
        .distinct()
      val nodes = hostEdges.select(col("sh").as("host"))
        .union(hostEdges.select(col("dh").as("host"))).distinct()
        .withColumn("hid", DistinctSketch.hash60(col("host")))
      val edges = hostEdges.select(
        DistinctSketch.hash60(col("sh")).as("src"),
        DistinctSketch.hash60(col("dh")).as("dst"))
      val ranks = LinkGraph.pageRank(nodes, "hid", edges, iters = 5)
      nodes.join(ranks, "hid")
        .select(col("host"), col("rank").as("host_rank_fp"))
    }),

    // per-cluster keyword extraction — the corpus-exploration op that
    // labels k-means cells with their top cf·idf terms (cf = term
    // occurrences within the cell, idf corpus-wide smooth, stop terms
    // capped by the q118 df rule). embeddings.vec_id IS documents
    // .doc_id in the testdata star schema. Ranking on the ROUNDED
    // score (q77's discipline). Oracle: cells embed (q78), terms/df/
    // cf/score/rank recompute in SQL
    "q124_cluster_keywords" -> ((s, dir) => {
      import graft.vector.Ivf
      val emb = table(s, dir, "embeddings")
      val centroids = Ivf.fitCentroids(emb, "embedding", 8,
        cacheKey = Some(dir + "#embeddings"))
      val cells = emb.select(col("vec_id").as("doc_id"),
        Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      val docs = table(s, dir, "documents")
      val terms = docs.select(col("doc_id"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      val dft = terms.distinct().groupBy("term").agg(count(lit(1)).as("df"))
      val cf = terms.join(cells, "doc_id")
        .groupBy("cell", "term").agg(count(lit(1)).as("cf"))
      val scored = cf.join(dft, "term").crossJoin(broadcast(n))
        .filter(col("df") <=
          greatest(lit(8L), floor(col("n_docs") / 5).cast("long")))
        .withColumn("score", round(col("cf") *
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1.0), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cell"))
        .orderBy(col("score").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("cell", "rank", "term", "score", "cf", "df")
    }),

    // longest internal repeat — the within-doc copy-paste signal:
    // %5==0 docs get a planted duplicated 40-char chunk appended
    // twice; the detector must find it (and whatever natural repeats
    // the corpus text already has). Oracle: the q112 independent-
    // driver-scorer technique — a second implementation (plain
    // substring-set binary search, no rolling hash) computes every
    // doc's answer; the fixture and derived columns recompute in SQL
    "q125_longest_repeat" -> ((s, dir) => {
      val fx = repeatFixture(s, dir)
      fx.select(col("doc_id"),
          length(col("ftext")).cast("long").as("n_chars"),
          graft.textops.Repeats.longest_repeat(col("ftext"))
            .cast("long").as("longest_repeat"))
        .withColumn("rep_x10000",
          expr("longest_repeat * 10000 DIV greatest(n_chars, 1L)"))
        .withColumn("flagged", col("rep_x10000") >= 2000)
    }),

    // mixed-language detection — the FineWeb-style gate: language-ID
    // per 16-token chunk (q74's chunker × q20's stopword classifier),
    // then per-doc consistency stats; %6==0 docs get a planted French
    // tail so the majority fraction genuinely drops. Majority ties
    // break by (count desc, lang asc). Static oracle rebuilds chunks,
    // the per-chunk CASE classifier, and every aggregate in SQL
    "q126_mixed_lang" -> ((s, dir) => {
      val fx = mixedLangFixture(s, dir)
      val chunks = graft.textops.Chunker.chunkByTokens(
        fx, col("ftext"), window = 16, stride = 16, keep = Seq(col("doc_id")))
      val cl = chunks.select(col("doc_id"),
        graft.textops.TextAnalysis.languageId(col("chunk_text")).as("clang"))
      val counts = cl.groupBy("doc_id", "clang").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("n").desc, col("clang").asc)
      val major = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("clang").as("majority_lang"),
          col("n").as("_mn"))
      val tot = counts.groupBy("doc_id").agg(
        sum(col("n")).as("n_chunks"),
        countDistinct(col("clang")).as("n_langs"))
      tot.join(major, "doc_id")
        .withColumn("majority_x10000", expr("_mn * 10000 DIV n_chunks"))
        .withColumn("mixed",
          col("n_langs") > 1 && col("majority_x10000") < 8000)
        .select("doc_id", "n_chunks", "n_langs", "majority_lang",
          "majority_x10000", "mixed")
    }),

    // Flesch-Kincaid readability as ONE exact integer rational —
    // fk_x100 = max(3900·W² + 118000·Y·S − 155900·S·W, 0) DIV
    // (100·S·W) with S/W floored at 1 (the 0.39·W/S + 11.8·Y/W −
    // 15.59 grade formula, syllables = per-word vowel-group count
    // floored at 1, negative grades clamp to 0 so integer division
    // never crosses the trunc-vs-floor divergence). Sentences from
    // q107's machinery over the same fixture prefix; everything
    // replays in SQL
    "q127_readability" -> ((s, dir) => {
      val text = concat(lit(sentenceFixturePrefix), coalesce(col("text"), lit("")))
      val sents = graft.textops.TextAnalysis.sentences(text)
      val toks = graft.textops.TextAnalysis.tokens(text)
      val syl = aggregate(
        transform(toks, t => greatest(lit(1),
          size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0))))
          .cast("long")),
        lit(0L), (a, x) => a + x)
      table(s, dir, "documents").select(col("doc_id"),
          greatest(size(sents), lit(1)).cast("long").as("n_sents"),
          greatest(size(toks), lit(1)).cast("long").as("n_words"),
          syl.as("n_syllables"))
        .withColumn("fk_x100", expr(
          "greatest(3900 * n_words * n_words + 118000 * n_syllables * n_sents" +
            " - 155900 * n_sents * n_words, 0L) DIV (100 * n_sents * n_words)"))
    }),

    // Gopher-style line-shape rules (Rae et al. 2021 repertoire):
    // bullet-line fraction, ellipsis-line fraction, symbol-to-word
    // ratio — the LINE-layout quality gate the token-level verdict
    // (q52) can't see. Planted line fixture: %4==0 docs get three
    // bullet lines, %3==0 an ellipsis line, %7==0 a #-heavy line.
    // Pure array-local Column algebra, zero shuffles; fully static
    // SQL oracle
    "q128_gopher_lines" -> ((s, dir) => {
      val fx = gopherFixture(s, dir)
      val lines = filter(split(col("ftext"), "\n"),
        l => length(trim(l)) > 0)
      val nLines = greatest(size(lines), lit(1)).cast("long")
      val bullets = size(filter(lines, l =>
        trim(l).startsWith("- ") || trim(l).startsWith("•"))).cast("long")
      val ellip = size(filter(lines, l => trim(l).endsWith("..."))).cast("long")
      val words = greatest(
        size(graft.textops.TextAnalysis.tokens(col("ftext"))), lit(1))
        .cast("long")
      val hashes = (length(col("ftext")) -
        length(regexp_replace(col("ftext"), "#", ""))).cast("long")
      fx.select(col("doc_id"), nLines.as("n_lines"), bullets.as("n_bullet"),
          ellip.as("n_ellipsis"), words.as("n_words"), hashes.as("n_hash"))
        .withColumn("bullet_x10000", expr("n_bullet * 10000 DIV n_lines"))
        .withColumn("ellipsis_x10000", expr("n_ellipsis * 10000 DIV n_lines"))
        .withColumn("symbol_x10000", expr("n_hash * 10000 DIV n_words"))
        .withColumn("keep", col("bullet_x10000") <= 9000 &&
          col("ellipsis_x10000") <= 3000 && col("symbol_x10000") <= 1000)
    }),

    // publication-date extraction (trafilatura-style, simplified):
    // FIRST ISO date (pattern-validated month/day) wins; else the
    // first "Month D, YYYY" textual date normalizes through a month
    // CASE + lpad; else null. %5==2 plants an INVALID decoy
    // (2021-13-40 — must not match), %5==3 plants both forms (ISO
    // preference is positional-independent by rule). Every regex
    // construct is Java≡RE2; fully static SQL oracle
    "q129_date_extract" -> ((s, dir) => {
      val fx = dateFixture(s, dir)
      val iso = regexp_extract(col("ftext"), dateIsoPattern, 0)
      val tm = regexp_extract(col("ftext"), dateTextPattern, 1)
      val td = regexp_extract(col("ftext"), dateTextPattern, 2)
      val ty = regexp_extract(col("ftext"), dateTextPattern, 3)
      val monthNum = element_at(
        map(monthNames.zipWithIndex.flatMap { case (m, i) =>
          Seq(lit(m), lit(f"${i + 1}%02d"))
        }: _*), tm)
      val textDate = when(length(ty) > 0,
        concat(ty, lit("-"), monthNum, lit("-"), lpad(td, 2, "0")))
      fx.select(col("doc_id"),
        when(length(iso) > 0, iso).otherwise(textDate).as("pub_date"),
        when(length(iso) > 0, "iso")
          .when(length(ty) > 0, "text").as("date_source"))
        .withColumn("date_found", col("pub_date").isNotNull)
    }),

    // character-unigram Shannon entropy — q112's deflate companion
    // (entropy is the model-free version of the same gibberish axis:
    // template spam sits LOW, base64/hex soup sits HIGH, prose in
    // between). H = log2(N) − Σ n·log2(n) / N, folded in SORTED-char
    // array order so no distributed float summation decides the
    // value (the q27 discipline); rounded to 4 decimals. Same
    // three-regime fixture as q112, so the two signals are directly
    // comparable in the artifact. Docs reduce to their char histogram
    // before the per-doc regroup — nothing bigger than the alphabet
    // shuffles
    "q130_char_entropy" -> ((s, dir) => {
      val fx = compressionFixture(s, dir) // (doc_id, ftext)
      val pairs = fx
        .select(col("doc_id"), explode(split(col("ftext"), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("n"))
      pairs.groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("ch"), col("n")))).as("_a"),
          sum(col("n")).as("n_chars"))
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          round(
            log2(col("n_chars").cast("double")) -
              aggregate(col("_a"), lit(0.0), (acc, x) =>
                acc + x.getField("n").cast("double") *
                  log2(x.getField("n").cast("double"))) /
                col("n_chars").cast("double"),
            4).as("entropy"))
        .withColumn("flag",
          when(col("entropy") < 2.5, "low_entropy")
            .when(col("entropy") > 5.2, "high_entropy")
            .otherwise("ok"))
    })
  )

  /** q130's static oracle: the q112 fixture rebuilt in SQL (repeat /
    * base64(unhex(md5)) / passthrough — all three arms verified
    * byte-identical across engines), the char histogram, and the
    * entropy fold in the same sorted-char order, rounded to 4.
    */
  private val oracleSqlQ130: String = {
    val soup = (0 until 10).map(i =>
      s"base64(unhex(md5('c$i:' || CAST(doc_id AS VARCHAR))))")
      .mkString(" || ")
    s"""WITH fx AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN repeat('spam spam spam spam ', 40) || coalesce(text, '')
       |    WHEN doc_id % 3 = 2 THEN $soup
       |    ELSE coalesce(text, '') END AS ftext
       |  FROM documents),
       |ch AS (
       |  SELECT doc_id, unnest(regexp_extract_all(ftext, '(?s).')) AS c
       |  FROM fx),
       |cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
       |a AS (
       |  SELECT doc_id, list(n ORDER BY c) AS ns,
       |    CAST(sum(n) AS BIGINT) AS n_chars
       |  FROM cnt GROUP BY 1),
       |h AS (
       |  SELECT doc_id, n_chars,
       |    round(log2(CAST(n_chars AS DOUBLE)) -
       |      list_sum(list_transform(ns,
       |        n -> CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE)))) / n_chars,
       |      4) AS entropy
       |  FROM a)
       |SELECT doc_id, n_chars, entropy,
       |  CASE WHEN entropy < 2.5 THEN 'low_entropy'
       |       WHEN entropy > 5.2 THEN 'high_entropy'
       |       ELSE 'ok' END AS flag
       |FROM h""".stripMargin
  }

  private[graft] val monthNames: Seq[String] = Seq(
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December")

  /** ISO date with pattern-level month/day validation (no calendar
    * check — documented); `\b` is the ASCII word boundary in both
    * Java regex and RE2.
    */
  private[graft] val dateIsoPattern: String =
    "\\b(19[0-9][0-9]|20[0-2][0-9])-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])\\b"

  private[graft] val dateTextPattern: String =
    "\\b(" + monthNames.mkString("|") + ") ([1-9][0-9]?), (19[0-9][0-9]|20[0-2][0-9])\\b"

  /** q129's planted fixture: ISO / textual / invalid-decoy / both. */
  private[graft] def dateFixture(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"),
      concat(
        when(col("doc_id") % 5 === 0, lit("Published 2021-07-05 · "))
          .when(col("doc_id") % 5 === 1, lit("Posted on March 9, 2019 · "))
          .when(col("doc_id") % 5 === 2, lit("ref 2021-13-40 build · "))
          .when(col("doc_id") % 5 === 3,
            lit("June 2, 2020 draft, final 2022-01-31 · "))
          .otherwise(lit("")),
        coalesce(col("text"), lit(""))).as("ftext"))

  /** q128's planted line fixture (the q81 discipline — corpus text is
    * one body line; rule-triggering lines plant around it).
    */
  private[graft] def gopherFixture(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"),
      concat(
        when(col("doc_id") % 4 === 0,
          lit("- item one\n- item two\n• item three\n")).otherwise(lit("")),
        coalesce(col("text"), lit("")), lit("\n"),
        when(col("doc_id") % 3 === 0,
          lit("click to read more...\n")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit("### tags # index ## more #\n")).otherwise(lit("")),
        lit("plain closing line")).as("ftext"))

  /** q126's fixture: a planted French tail (20 stopword tokens — at
    * least one full 16-token chunk classifies fr) on %6==0 docs.
    */
  private[graft] val frenchTail: String =
    "le la les et est un une dans que pour " +
      "le la les et est un une dans que pour"

  private[graft] def mixedLangFixture(
      s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 6 === 0,
        concat(coalesce(col("text"), lit("")), lit(" " + frenchTail)))
        .otherwise(coalesce(col("text"), lit(""))).as("ftext"))

  /** q125's fixture (shared construction, q112's discipline): planted
    * duplication for %5==0 docs — the first 40 chars appended twice.
    */
  private[graft] def repeatFixture(s: SparkSession, dir: String): DataFrame = {
    val base = coalesce(col("text"), lit(""))
    table(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(base, lit(" "), substring(base, 1, 40), lit(" "),
          substring(base, 1, 40)))
        .otherwise(base).as("ftext"))
  }

  /** The q116/q117 model: shared constants (vocab 400, pieces ≤ 6
    * code points, 2 hard-EM iterations, corpus-exact refine) — the
    * oracle's independent trainer uses the same four numbers and
    * nothing else.
    */
  private[graft] def unigramModel(
      s: SparkSession, dir: String): graft.textops.Unigram.Model = {
    val docs = table(s, dir, "documents")
    val m0 = graft.textops.Unigram.train(
      docs, "text", vocabSize = 400, maxPieceLen = 6, emIters = 2)
    graft.textops.Unigram.refineCounts(s, docs, "text", m0, vocabSize = 400)
  }

  /** q112's three-regime fixture (shared with [[OracleGen]]'s
    * independent scorer — the scorer is the independent half, the
    * fixture construction is common, q25's key discipline).
    */
  private[graft] def compressionFixture(
      s: SparkSession, dir: String): DataFrame = {
    val b64soup = concat((0 until 10).map(i =>
      base64(unhex(md5(concat(lit(s"c$i:"), col("doc_id").cast("string")))))): _*)
    table(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(expr("repeat('spam spam spam spam ', 40)"),
          coalesce(col("text"), lit(""))))
        .when(col("doc_id") % 3 === 2, b64soup)
        .otherwise(coalesce(col("text"), lit(""))).as("ftext"))
  }

  /** q115's planted page fixture: every doc is a page at a per-doc
    * base URL whose anchors cover the href-shape repertoire (shared
    * construction: the query reads this frame, the oracle rebuilds the
    * same strings in SQL — the q111/q113 fixture discipline).
    */
  private[graft] def linkFixture(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def n(m: Int) = (id % m).cast("string")
    val html = concat(
      lit("<p>intro</p><a href=\"https://ext"), n(5),
      lit(".example.org/x/y?z="), id.cast("string"), lit("\">abs</a>"),
      lit("<A HREF='//cdn"), n(3), lit(".example.net/asset.js'>proto</A>"),
      lit("<a class=\"m\" href=/r/p"), n(11), lit(">rooted</a>"),
      lit("<a href=\"sub/item"), id.cast("string"), lit(".html\">rel</a>"),
      lit("<a href=\"../up/i"), n(4), lit("\">up</a>"),
      when(id % 2 === 0, lit("<a href=\"javascript:void(0)\">js</a>"))
        .otherwise(lit("")),
      when(id % 3 === 0, lit("<a href=\"mailto:x@example.com\">m</a>"))
        .otherwise(lit("")),
      lit("<a href=\"./here.html?q="), n(6), lit("\">dot</a>"),
      when(id % 5 === 0, lit("<a href=\"\">empty</a>")).otherwise(lit("")),
      when(id % 4 === 1, lit("<a href=\"#top\">top</a>")).otherwise(lit("")),
      lit("<img href=\"/not-anchor\"><a name=\"x\">none</a>"))
    table(s, dir, "documents").select(id,
      concat(lit("https://host"), n(7), lit(".example.com/a/b/page"),
        id.cast("string"), lit(".html")).as("page_url"),
      html.as("html"))
  }

  /** q109's fixture directory — deterministic per (sf dir, process):
    * the write is part of the measured query, a real render+ingest
    * round trip, and the PID suffix keeps concurrent sessions on the
    * same sf dir (Verify while Bench runs) from deleting each other's
    * fixture mid-read.
    */
  private def warcFixtureDir(dir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft-warc-fixture-" + dir.replaceAll("[^A-Za-z0-9]", "_") +
        "-p" + ProcessHandle.current().pid())
      .getAbsolutePath

  /** q107/q108 sentence fixture: one prefix exercising every
    * [[graft.textops.TextAnalysis.sentences]] protection rule, shared
    * with the DuckDB oracles (which re-run the same regex pipeline).
    */
  private[graft] val sentenceFixturePrefix: String =
    "Dr. Smith paid 3.14 to Acme Inc. on Jan 5. Hmm... so it goes on! " +
      "Was it e.g. worth it? Yes. "

  /** Multi-line fixture for the line-dedup family (q81): the corpus
    * text has no newlines, so template lines are planted around it —
    * the q72 messy-URL-fixture discipline. Shared by the query and
    * [[OracleGen]]-free static oracle (which rebuilds it in SQL).
    */
  private[graft] def lineFixture(
      s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"),
      concat(
        lit("NAV: home | about | contact\n"),
        when(col("doc_id") % 3 === 0,
          lit("subscribe to our newsletter\n")).otherwise(lit("")),
        coalesce(col("text"), lit("")), lit("\n"),
        lit("permalink doc-"), col("doc_id").cast("string"), lit("\n"),
        lit("copyright example corp all rights reserved")).as("text"))

  /** Fixed corpus bound for the uncapped near-dup recall gates. */
  private val gateDocs = 500

  /** 20-token licence-block boilerplate planted on every 5th document
    * for the substring-dedup gate (q53) — long enough that its interior
    * holds many duplicated 8-token windows whose merged coverage is the
    * whole block.
    */
  private val spanBoiler: String =
    "terms of use this document is provided under the graft sample " +
      "license with no warranty of any kind whatsoever amen"

  /** Two literal eval-benchmark probes (>= 8 lowered tokens each) for
    * the decontamination gate (q61): planted into corpus docs on
    * doc_id%7 in {3,5} and present in the eval corpus, so a correct
    * decontaminator must flag exactly those docs (plus the leaked
    * every-97th eval docs and any natural overlap, which the oracle
    * recomputes identically).
    */
  /** Two spam variants for the quality-classifier fixture (q73):
    * planted over doc_id%4==0 documents, so the labeled slice is
    * linearly separable on hashed token/bigram features. Repeated 6x
    * so spam n-gram mass dominates each bad document.
    */
  private[graft] val spamA: String =
    "buy cheap pills online now best price guaranteed limited offer"
  private[graft] val spamB: String =
    "click here to win free prize money today instant payout"

  /** The q73 labeled corpus: every 4th document's text replaced by
    * repeated spam (label=false), the rest kept raw (label=true).
    */
  private[graft] def qualityLabeledDocs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        when(col("doc_id") % 8 === 0, concat_ws(" ", Seq.fill(6)(lit(spamA)): _*))
          .otherwise(concat_ws(" ", Seq.fill(6)(lit(spamB)): _*)))
        .otherwise(col("text")).as("text"),
      (col("doc_id") % 4 =!= 0).as("label"))

  private[graft] val evalProbe1: String =
    "held out benchmark question what is the capital of freedonia answer unknown"
  private[graft] val evalProbe2: String =
    "count the exact number of tokens in this held out evaluation prompt"

  /** The q61/q65 eval corpus: every 97th document's raw text (the
    * leaked-eval-doc stand-in) plus the two literal probes. ONE
    * definition — the two queries and both oracles' `evals` CTEs must
    * stay in lockstep.
    */
  private def evalCorpus(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .filter(col("doc_id") % 97 === 0).select(col("text"))
      .unionByName(s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(evalProbe1), org.apache.spark.sql.Row(evalProbe2)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "text", org.apache.spark.sql.types.StringType)))))

  /** Exact-copy documents shifted by 100000 — the planted truth set for
    * the near-dup recall gates.
    */
  private def twinDocs(docs: DataFrame): DataFrame =
    docs.select((col("doc_id") + 100000).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))

  /** Embeddings plus an exact twin of every vector (vec_id + 100000) —
    * for each query the true nearest non-self neighbor is its twin at
    * cosine 1.0, which the oracle re-derives by brute force.
    */
  private def twinEmbeddings(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"))
      .unionByName(emb.select(
        (col("vec_id") + 100000).as("vec_id"), col("embedding")))

  /** (family, n_truth, n_found, recall_x10000) for a truth pair set vs a
    * found pair set.
    */
  private def recallOf(family: String, truth: DataFrame, pairs: DataFrame): DataFrame =
    truth
      .join(pairs.select(col("id_a"), col("id_b")).withColumn("_hit", lit(1L)),
        Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(col("_hit")), lit(0L)).as("n_found"))
      .select(lit(family).as("family"), col("n_truth"), col("n_found"),
        floor(lit(10000) * col("n_found") / col("n_truth")).cast("long").as("recall_x10000"))

  /** Twin-recall@1 from an ANN result frame: the rank-1 neighbor of
    * query q must be its planted twin q + 100000.
    */
  private def twinRecallOf(family: String, res: DataFrame): DataFrame =
    res.filter(col("rank") === 1)
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("neighbor_id") === col("query_id") + 100000, 1L).otherwise(0L)).as("n_found"))
      .select(lit(family).as("family"), col("n_truth"), col("n_found"),
        floor(lit(10000) * col("n_found") / col("n_truth")).cast("long").as("recall_x10000"))

  /** Embeddings plus one near-duplicate of each (every element +0.01,
    * double arithmetic — expressible identically in DuckDB's
    * `list_transform`, so the cosine values oracle-match exactly).
    */
  def plantedEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(emb.select(
        (col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x.cast("double") + 0.01).as("embedding")))
  }

  /** Documents plus one near-duplicate of each (one appended token) —
    * deterministic planted ground truth for the near-dup operators.
    */
  def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    docs.unionByName(docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" graftdup")).as("text"),
      col("lang"), col("source"), col("n_chars")))
  }

  /** Bounded twin-planted image corpus for the perceptual-hash family
    * (q62/q63): real structured PNGs for doc ids < [[gateDocs]], plus a
    * byte-distinct brightness-shifted twin of each at id + 100000 —
    * identical dHash (gradient comparisons are shift-invariant),
    * different md5. Shared with [[OracleGen.imageNearDupOracle]] so the
    * engine and oracle hash the same bytes.
    */
  def imageTwinCorpus(s: SparkSession, dir: String): DataFrame = {
    val ids = table(s, dir, "documents")
      .filter(col("doc_id") < gateDocs).select(col("doc_id"))
    graft.multimodal.Multimodal.patternImages(
      ids.unionByName(ids.select((col("doc_id") + 100000).as("doc_id"))),
      "doc_id", twinOffset = 100000L, brightnessStep = 4)
  }

  /** Stages 1–4b of the curation-pipeline flagship (q65): clean →
    * lang-id → quality filter → content gate (blocked-phrase drop) →
    * exact dedup (keep smallest doc_id per identical cleaned text,
    * md5-keyed so the shuffle carries a hash, not the payload). Shared
    * with [[OracleGen.curationOracle]], which embeds the stage-4
    * corpus's minhash keys for the near-dup stage.
    * Returns (doc_id, lang_pred, text).
    */
  def curationStage4(s: SparkSession, dir: String): DataFrame = {
    val cleaned = table(s, dir, "documents").select(col("doc_id"),
      graft.textops.TextAnalysis.cleanText(col("text"), stripTags = true).as("text"))
    val withLang = cleaned.withColumn("lang_pred",
      graft.textops.TextAnalysis.languageId(col("text")))
    val quality = withLang
      .withColumn("_v", graft.textops.TextAnalysis.qualityVerdict(col("text")))
      .filter(col("_v.keep")).drop("_v")
    // content gate (the C4-style badwords filter, q99's machinery, one
    // blocked trigram here): runs BEFORE dedup so blocked documents
    // never cost candidate-generation work downstream. The blocked-id
    // side derives from `cleaned` (stage 1), NOT `quality` — the gate
    // only needs the text column, and an anti-join against the quality
    // frame would re-evaluate the whole lang-id + verdict subtree for
    // the probe side
    val gated = quality.join(
      graft.textops.TextIndex.phraseSearch(cleaned, "doc_id", "text",
          curationBlockedPhrase).select(col("id").as("_blk")),
      col("doc_id") === col("_blk"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    gated.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** The flagship's blocked phrase (shared with
    * [[OracleGen.curationOracle]]'s chit CTE).
    */
  val curationBlockedPhrase: Seq[String] = Seq("slow", "hash", "batch")

  /** Bounded twin-planted AUDIO corpus for the perceptual-hash family
    * (q66/q67): structured PCM WAVs for doc ids < [[gateDocs]] plus a
    * half-gain twin of each at id + 100000 — byte-distinct,
    * audioHash64-identical (energy gradients are gain-invariant).
    * Shared with [[OracleGen.audioNearDupOracle]].
    */
  def audioTwinCorpus(s: SparkSession, dir: String): DataFrame = {
    val ids = table(s, dir, "documents")
      .filter(col("doc_id") < gateDocs).select(col("doc_id"))
    graft.multimodal.Multimodal.patternWavs(
      ids.unionByName(ids.select((col("doc_id") + 100000).as("doc_id"))),
      "doc_id", twinOffset = 100000L)
  }

  /** Bounded twin-planted VIDEO corpus for the perceptual-hash family
    * (q68/q69): structured MJPEG-in-AVI payloads for doc ids <
    * [[gateDocs]] plus a re-edit twin of each at id + 100000 — even
    * (sampled) frames byte-identical, odd frames distinct. Shared with
    * [[OracleGen.videoNearDupOracle]].
    */
  def videoTwinCorpus(s: SparkSession, dir: String): DataFrame = {
    val ids = table(s, dir, "documents")
      .filter(col("doc_id") < gateDocs).select(col("doc_id"))
    graft.multimodal.Multimodal.patternAvis(
      ids.unionByName(ids.select((col("doc_id") + 100000).as("doc_id"))),
      "doc_id", twinOffset = 100000L)
  }

  /** The q68/q69 sampled-frame hash frame over [[videoTwinCorpus]] —
    * one definition for both queries and the generated oracle.
    */
  def videoFrameHashFrame(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.videoFrameHashes(
      videoTwinCorpus(s, dir), stride = 2, maxFrames = 4)
      .select(col("media_id").as("id"), col("fhash").as("fp"))
      .distinct()

  /** Shared oracle for q4/q17 — both sessionizer implementations must
    * hash-match the same SQL. */
  private val oracleSqlQ4: String =
    """WITH logs AS (
        |  SELECT event_id, event_type AS source, CAST(user_id AS VARCHAR) AS ip,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ep
        |  FROM events),
        |lagged AS (
        |  SELECT *, CASE WHEN ep - lag(ep) OVER w >= 300 THEN 1 ELSE 0 END AS new_s
        |  FROM logs WINDOW w AS (PARTITION BY source, ip ORDER BY ep, event_id)),
        |sess AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY source, ip ORDER BY ep, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS local_id
        |  FROM lagged),
        |keys AS (SELECT DISTINCT source, ip, local_id FROM sess),
        |numbered AS (
        |  SELECT source, ip, local_id,
        |         row_number() OVER (ORDER BY source, ip, local_id) - 1 AS cluster
        |  FROM keys)
        |SELECT s.event_id, n.cluster
        |FROM sess s JOIN numbered n USING (source, ip, local_id)""".stripMargin

  /** `events` with `ts` as an epoch-NANOS long whatever the physical
    * parquet shape — q46/q50's as-of machinery (and its hourly
    * chunkSize) works in nanos, matching the oracle's `epoch_ns(ts)`.
    * Micros→nanos multiplication cannot overflow for any timestamp
    * DuckDB itself can represent (|micros| < 2^62/1000).
    */
  private def eventsNanos(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val ev = table(s, dir, "events")
    ev.schema("ts").dataType match {
      case LongType => ev
      case _ => normalizeEventTs(ev)
        .withColumn("ts", expr("unix_micros(ts) * 1000L"))
    }
  }

  /** q46/q50's checkpoint frame, deduped to ONE row per (user_id, ts):
    * DuckDB's ASOF JOIN picks an ARBITRARY row among equal-time
    * checkpoints while asofBackward breaks the tie deterministically by
    * payload order, so duplicate (user_id, ts) checkpoints in a future
    * events table would flake the hash compare. Keeping the max-ckpt_id
    * row (a window both engines state identically) removes the
    * ambiguity on both sides.
    */
  private def q46Checkpoints(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("rts"))
      .orderBy(col("ckpt_id").desc)
    ev.filter(col("event_id") % 10 === 0)
      .select(col("user_id"), col("ts").as("rts"),
        col("event_id").as("ckpt_id"), col("value").as("ckpt_value"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Shared oracle for q46/q50 — both as-of implementations must
    * hash-match the same native DuckDB ASOF LEFT JOIN (over the same
    * tie-deduped checkpoint frame, see [[q46Checkpoints]]). */
  private val oracleSqlQ46: String =
    """WITH l AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS t FROM events),
      |r AS (
      |  SELECT user_id, rt, ckpt_id, ckpt_value FROM (
      |    SELECT user_id, epoch_ns(ts) AS rt, event_id AS ckpt_id,
      |           value AS ckpt_value,
      |           row_number() OVER (PARTITION BY user_id, epoch_ns(ts)
      |                              ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_id % 10 = 0) WHERE rn = 1)
      |SELECT l.event_id, r.ckpt_id, r.ckpt_value
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.rt""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The no-arg form returns the static twins
    * only; Verify calls the explicit overload with its (session, sf
    * dir) so the six candidate-generation queries additionally get
    * GENERATED key-CTE oracles ([[OracleGen]]) computed from the same
    * data the queries read. Without a context those entries are simply
    * absent — the driver then records the weaker rows-only check,
    * exactly the pre-generation behavior.
    */
  def oracleSql: Map[String, String] = oracleSql(None)

  def oracleSql(ctx: Option[(SparkSession, String)]): Map[String, String] =
    staticOracleSql ++ ctx.map { case (s, dir) => OracleGen.all(s, dir) }
      .getOrElse(Map.empty)

  private def staticOracleSql: Map[String, String] = Map(
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

    "q17_sessionize_chunked" -> oracleSqlQ4,

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

    "q20_lang_id" -> {
      val toks = "string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')"
      val scores = graft.textops.TextAnalysis.stopwords.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
        lang -> s"len(list_filter($toks, t -> list_contains($list, t)))"
      }
      val maxS = scores.values.mkString("greatest(", ", ", ")")
      val caseChain = scores.map { case (lang, sc) =>
        s"WHEN $sc = m THEN '$lang'"
      }.mkString(" ")
      s"""SELECT doc_id,
         |  CASE WHEN m <= 0 THEN 'und' $caseChain ELSE 'und' END AS lang_pred
         |FROM (SELECT doc_id, text, $maxS AS m FROM documents)""".stripMargin
    },

    "q35_lang_ngram" -> graft.textops.LangNgram.oracleSql,

    "q21_quality" -> {
      val toks = "string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')"
      val en = graft.textops.TextAnalysis.stopwords("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END AS n_tokens,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS DOUBLE) / length(text)
         |         END AS praw,
         |    CASE WHEN len($toks) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter($toks, t -> list_contains($en, t))) AS DOUBLE)
         |              / len($toks) END AS sraw
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |  round(praw, 4) AS punct_ratio,
         |  round(sraw, 4) AS stop_ratio,
         |  round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + least(sraw * 5.0, 1.0) * 0.3
         |      + (1.0 - least(praw * 10.0, 1.0)) * 0.3, 4) AS quality
         |FROM base""".stripMargin
    },

    "q38_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+') END AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  floor((CASE WHEN len(toks) = 0 THEN 0.0
        |              ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
        |         END) * 10000.0 + 0.5) / 10000.0 AS rep_ratio
        |FROM t""".stripMargin,

    "q22_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')) END AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^ \t\n\x0b\f\r A-Za-z0-9]')) AS lex_tokens
        |FROM documents""".stripMargin,

    "q23_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        |FROM documents""".stripMargin,

    // tokens filter empties rather than trim-then-split: the Spark side's
    // byte scanner (TokenShingles) never yields an empty token for text
    // with leading non-space whitespace, where trim(' only') + split
    // would artifact one — keep the oracle on the scanner's semantics
    "q24_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source, n_chars // 100 AS nb,
        |         list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'), t -> t != '') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, lang, source, nb,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |  FROM t),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
        |          ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |               / len(list_distinct(a.sh || b.sh)) END, 4) AS jaccard
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
        |                   AND a.nb = b.nb AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.05""".stripMargin,

    "q33_embed_pairs" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |planted AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id, list_transform(v, x -> x + 0.01) AS v
        |  FROM base),
        |c AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM planted),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_dot_product(a.v, b.v) / (a.n * b.n), 4) AS cosine
        |  FROM c a JOIN c b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.99""".stripMargin,

    "q27_embed_topk" ->
      """WITH c AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
        |  FROM embeddings),
        |q AS (SELECT * FROM c WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_dot_product(c.v, q.v) / (c.n * q.n) AS cos_raw
        |  FROM c CROSS JOIN q WHERE c.vec_id != q.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine, rank
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "q37_drop_neardups" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM documents a JOIN documents b
        |    ON b.doc_id = a.doc_id + 1 AND a.n_chars // 100 = b.n_chars // 100),
        |sym AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.id_b, reach.r FROM reach JOIN sym s ON s.id_a = reach.id)
        |SELECT id AS doc_id FROM reach GROUP BY id HAVING id = min(r)""".stripMargin,

    "q36_components" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM documents a JOIN documents b
        |    ON b.doc_id = a.doc_id + 1 AND a.n_chars // 100 = b.n_chars // 100),
        |sym AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.id_b, reach.r FROM reach JOIN sym s ON s.id_a = reach.id)
        |SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id""".stripMargin,

    "q29_multimodal_stats" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin,

    // image rows: the ORACLE predicts what the real PNG codec must
    // return, because withSyntheticImagePayloads encodes a
    // (16 + id%32) x (16 + 7id%32) PNG; audio/video rows: the stub
    // formulas over the text payload length.
    // every kind now has a real decode/probe path, so the ORACLE
    // predicts all properties from the synthetic-payload formulas:
    // image = PNG codec dims, audio = WAV container rate/frames,
    // video = MP4 box-tree geometry/samples
    "q30_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS kind
        |  FROM documents)
        |SELECT media_id,
        |  CAST(CASE WHEN kind = 'image' THEN 16 + media_id % 32
        |       WHEN kind = 'audio' THEN 0
        |       ELSE 128 + media_id % 64 END AS INT) AS width,
        |  CAST(CASE WHEN kind = 'image' THEN 16 + (media_id * 7) % 32
        |       WHEN kind = 'audio' THEN 0
        |       ELSE 72 + (media_id * 3) % 64 END AS INT) AS height,
        |  CAST(CASE WHEN kind = 'video' THEN 24 + media_id % 240
        |       WHEN kind = 'audio' THEN 100 + media_id % 900
        |       ELSE 1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN kind = 'audio' THEN 8000 + (media_id % 4) * 4000
        |       ELSE 0 END AS INT) AS sample_rate,
        |  TRUE AS decoded_real
        |FROM m""".stripMargin,

    // ---- recall-gate oracles ----
    // Near-dup families: the oracle derives the TRUTH-SET SIZE from the
    // base table (same eligibility rule as the Spark side) and asserts
    // full recall — which the uncapped exact-twin construction
    // guarantees (identical text => identical bands/chunks/fingerprints,
    // exact verify passes at jaccard 1 / hamming 0 / containment 1).
    // Token-parity with TokenShingles is the q24-proven expression.
    "q39_minhash_recall" ->
      """SELECT 'minhash' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents
        |WHERE doc_id < 500 AND len(list_filter(
        |  string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'), t -> t != '')) >= 3""".stripMargin,

    "q40_simhash_recall" ->
      """SELECT 'simhash' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents WHERE doc_id < 500""".stripMargin,

    "q41_winnow_recall" ->
      """SELECT 'winnow' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents WHERE doc_id < 500 AND length(text) >= 5""".stripMargin,

    // uniform brightness shift leaves every dHash gradient comparison
    // unchanged -> twin hamming 0 -> the uncapped pigeonhole join finds
    // every planted pair (full recall by construction)
    "q63_phash_recall" ->
      """SELECT 'phash' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents WHERE doc_id < 500""".stripMargin,

    // exact half-gain (even samples) leaves every slice-energy gradient
    // comparison unchanged -> twin hamming 0 -> full recall
    "q67_audio_recall" ->
      """SELECT 'audiohash' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents WHERE doc_id < 500""".stripMargin,

    // twins share every sampled (even-index) frame byte-for-byte ->
    // identical frame-hash sets -> containment 1.0 -> full recall
    "q69_video_recall" ->
      """SELECT 'videohash' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents WHERE doc_id < 500""".stripMargin,

    // ANN families: the oracle RECOMPUTES the ground truth by brute
    // force over the twin-planted corpus (top-1 per query by exact
    // cosine, ties by neighbor id — the same ordering the Spark side
    // ranks with) and counts how many top-1s are the planted twin. The
    // ANN result must agree exactly.
    "q42_lsh_twin_recall" -> annTwinOracleSql("ann_lsh"),
    "q43_ivf_twin_recall" -> annTwinOracleSql("ann_ivf"),
    "q44_pq_twin_recall" -> annTwinOracleSql("ann_pq"),

    // Same plant, same pattern strings (Java-regex/RE2 common subset),
    // DuckDB needs the explicit 'g' flag for replace-all.
    // the Luhn checksum is embedded as an arithmetic CASE over the 16
    // stripped digits (odd left positions doubled for even length);
    // the redaction twin applies the card replace per-DOC when that
    // doc has a Luhn-valid candidate — equivalent to the engine's
    // per-MATCH conditional replace whenever no doc mixes valid and
    // invalid candidates (the fixture plants at most one per doc, and
    // the natural corpus has zero card-shaped runs at every sf —
    // verified before wiring)
    "q45_pii" -> {
      val luhnSum = (1 to 16).map { i =>
        val d = s"CAST(substr(regexp_replace(x, '[- ]', '', 'g'), $i, 1) AS INT)"
        if (i % 2 == 1) s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"
        else d
      }.mkString(" + ")
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    text ||
         |    (CASE WHEN doc_id % 4 = 0
         |          THEN ' contact user' || doc_id || '@example.com' ELSE '' END) ||
         |    (CASE WHEN doc_id % 4 = 1
         |          THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ELSE '' END) ||
         |    (CASE WHEN doc_id % 4 = 2
         |          THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END) ||
         |    (CASE WHEN doc_id % 4 = 3 THEN
         |       CASE WHEN doc_id % 8 = 7
         |            THEN ' call +1555123' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |            ELSE ' call (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END
         |     ELSE '' END) ||
         |    (CASE WHEN doc_id % 10 = 0 THEN ' card 4242 4242 4242 4242'
         |          WHEN doc_id % 10 = 6 THEN ' card 4242-4242-4242-4243' ELSE '' END)
         |      AS text
         |  FROM documents),
         |counted AS (
         |  SELECT doc_id, text,
         |    CAST(len(list_filter(regexp_extract_all(text, '${graft.textops.Pii.CardRe}'),
         |      x -> ($luhnSum) % 10 = 0)) AS INT) AS n_cards,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         |      '${graft.textops.Pii.EmailRe}', '<EMAIL>', 'g'),
         |      '${graft.textops.Pii.Ipv4Re}', '<IP>', 'g'),
         |      '${graft.textops.Pii.SsnRe}', '<SSN>', 'g'),
         |      '${graft.textops.Pii.PhoneRe}', '<PHONE>', 'g') AS pre_card
         |  FROM planted)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${graft.textops.Pii.EmailRe}')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${graft.textops.Pii.Ipv4Re}')) AS INT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(text, '${graft.textops.Pii.SsnRe}')) AS INT) AS n_ssn,
         |  CAST(len(regexp_extract_all(text, '${graft.textops.Pii.PhoneRe}')) AS INT) AS n_phones,
         |  CAST(len(regexp_extract_all(text, '${graft.textops.Pii.CardRe}')) AS INT) AS n_card_candidates,
         |  n_cards,
         |  CASE WHEN n_cards > 0
         |       THEN regexp_replace(pre_card, '${graft.textops.Pii.CardRe}', '<CARD>', 'g')
         |       ELSE pre_card END AS redacted
         |FROM counted""".stripMargin
    },

    "q46_asof" -> oracleSqlQ46,
    "q50_asof_chunked" -> oracleSqlQ46,

    "q51_drop_best" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM documents a JOIN documents b
        |    ON b.doc_id = a.doc_id + 1 AND a.n_chars // 100 = b.n_chars // 100),
        |sym AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.id_b, reach.r FROM reach JOIN sym s ON s.id_a = reach.id),
        |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
        |ranked AS (
        |  SELECT d.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY c.component
        |                       ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
        |  FROM documents d JOIN comp c USING (doc_id))
        |SELECT doc_id, n_chars FROM ranked WHERE rk = 1""".stripMargin,

    "q52_quality_filter" -> {
      val en = graft.textops.TextAnalysis.stopwords("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
         |         ELSE string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') END AS toks,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS DOUBLE) / length(text)
         |         END AS praw
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |    floor(praw * 10000.0 + 0.5) / 10000.0 AS pr,
         |    floor((CASE WHEN len(toks) = 0 THEN 0.0
         |           ELSE CAST(len(list_filter(toks, t -> list_contains($en, t))) AS DOUBLE)
         |                / len(toks) END) * 10000.0 + 0.5) / 10000.0 AS sr,
         |    floor((CASE WHEN len(toks) = 0 THEN 0.0
         |           ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         |           END) * 10000.0 + 0.5) / 10000.0 AS rr
         |  FROM base),
         |r AS (
         |  SELECT doc_id, n_tokens,
         |    list_filter([
         |      CASE WHEN n_tokens < 10 THEN 'too_short' END,
         |      CASE WHEN n_tokens > 100000 THEN 'too_long' END,
         |      CASE WHEN pr > 0.3 THEN 'too_much_punct' END,
         |      CASE WHEN sr < 0.02 THEN 'too_few_stopwords' END,
         |      CASE WHEN rr > 0.6 THEN 'too_repetitive' END], x -> x IS NOT NULL) AS fails
         |  FROM sig)
         |SELECT doc_id, n_tokens,
         |  coalesce(array_to_string(fails, ','), '') AS fail_reasons,
         |  len(fails) = 0 AS keep
         |FROM r""".stripMargin
    },

    // hash-free twin of SpanDedup: windows are the literal 8-token
    // STRINGS (tokens contain no whitespace, so ' '-join is injective),
    // keep-first via row_number over (doc_id, pos), coverage = union of
    // [pos, pos+8) per doc, trimmed text = kept tokens string_agg'd in
    // position order — a 64-bit window-hash collision on the Spark side
    // is the only possible divergence
    "q53_dedup_spans" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' $spanBoiler' ELSE text END AS text
         |  FROM documents),
         |t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM docs),
         |wl AS (
         |  SELECT doc_id, toks,
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
         |  FROM t),
         |wins AS (
         |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, unnest(ws) AS w FROM wl),
         |rn AS (
         |  SELECT doc_id, pos,
         |         row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn
         |  FROM wins),
         |dup AS (SELECT doc_id, pos FROM rn WHERE rn > 1),
         |covered AS (
         |  SELECT DISTINCT doc_id, cpos FROM (
         |    SELECT doc_id, unnest(range(pos, pos + 8)) AS cpos FROM dup)),
         |tp AS (
         |  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, unnest(toks) AS tok
         |  FROM t),
         |kept AS (
         |  SELECT tp.doc_id, tp.pos, tp.tok FROM tp
         |  WHERE NOT EXISTS (SELECT 1 FROM covered c
         |                    WHERE c.doc_id = tp.doc_id AND c.cpos = tp.pos)),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |         string_agg(tok, ' ' ORDER BY pos) AS text_dedup
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, len(t.toks) AS n_tokens,
         |  len(t.toks) - coalesce(a.n_kept, 0) AS n_dropped,
         |  coalesce(a.text_dedup, '') AS text_dedup
         |FROM t LEFT JOIN agg a ON a.doc_id = t.doc_id""".stripMargin,

    // the ORACLE predicts frame geometry and sampled indices from the
    // withSyntheticAviVideoPayloads formulas (frames = 3 + m%6 <= 8, so
    // stride 2 yields indices {0,2,4,6} below the frame count and the
    // maxFrames=4 cap never truncates); luma_ok = TRUE asserts the real
    // JPEG round-trip stayed within the +-3 tolerance for every frame
    "q54_video_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, CAST(3 + doc_id % 6 AS INT) AS n_frames
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
        |s AS (SELECT unnest([0, 2, 4, 6]) AS fi)
        |SELECT media_id, CAST(s.fi AS INT) AS frame_idx,
        |  CAST(32 + media_id % 16 AS INT) AS frame_w,
        |  CAST(24 + (media_id * 5) % 16 AS INT) AS frame_h,
        |  TRUE AS luma_ok
        |FROM v JOIN s ON s.fi < v.n_frames""".stripMargin,

    // the oracle's one-window cumsum IS the semantics; the engine's
    // range-partitioned two-phase formulation must reproduce it exactly
    "q56_budget_cut" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 20000""".stripMargin,

    "q57_source_quota" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         row_number() OVER (PARTITION BY lang, source
        |                            ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 20""".stripMargin,

    // same explicit character classes as cleanText — RE2 and Java \s
    // disagree on \x0B, so neither side uses bare \s; DuckDB needs the
    // 'g' flag where Spark's regexp_replace is global by default
    "q58_clean" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN '<p class="x">' || text || '</p> <br>'
        |         WHEN doc_id % 3 = 1 THEN ' ' || text || chr(7) || chr(9) || chr(9) || ' end  '
        |         ELSE text END AS text
        |  FROM documents),
        |cleaned AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(regexp_replace(text,
        |      '<[^>]*>', ' ', 'g'),
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |      '[ \t\n\r]+', ' ', 'g')) AS text_clean
        |  FROM planted)
        |SELECT doc_id, text_clean,
        |  CAST(length(text_clean) AS INT) AS n_chars_clean
        |FROM cleaned""".stripMargin,

    "q59_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || md5(CAST(doc_id AS VARCHAR))[1:2])::INT % 256 <
        |  CASE lang WHEN 'en' THEN 32 WHEN 'de' THEN 128
        |            WHEN 'zh' THEN 256 ELSE 64 END""".stripMargin,

    "q60_budget_per_lang" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 5000""".stripMargin,

    // the one-window cumsum + integer DIV is the shard semantics; the
    // engine's chunked two-phase cumsum + row-local DIV must reproduce
    // it exactly (DuckDB // is floor division — equal to Spark's
    // truncating div for the non-negative greatest(cum-1, 0))
    "q70_token_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
        |  CAST(greatest(cum_tokens - 1, 0) // 5000 AS BIGINT) AS shard_id
        |FROM c""".stripMargin,

    // the DuckDB twin of UrlCanon.canonicalize over the planted
    // fixture: fragment strip, scheme/authority lowering, default-port
    // drop, bounded-regex dot-segment resolution (two passes cover the
    // fixture's single ./ and ../ occurrences; the engine runs the
    // full RFC 3986 stack algorithm — equal on this domain), tracking-
    // param filter via list_filter, then keep-first per canonical key
    "q72_url_dedup" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'https://Example.COM:443/articles/' || (doc_id % 50)::VARCHAR || '?utm_source=feed&utm_campaign=x#frag'
        |      WHEN 1 THEN 'https://example.com/articles/' || (doc_id % 50)::VARCHAR
        |      WHEN 2 THEN 'HTTPS://EXAMPLE.com/news/../articles/' || (doc_id % 50)::VARCHAR || '?ref=tw'
        |      WHEN 3 THEN 'https://example.com/./articles/' || (doc_id % 50)::VARCHAR || '?utm_medium=y&keep=1'
        |      ELSE 'http://example.com:8080/Articles/' || (doc_id % 50)::VARCHAR || '?a=1&gclid=z&b=2'
        |    END AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url, regexp_replace(trim(url), '#.*$', '') AS u
        |  FROM planted),
        |comp AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS auth,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1) AS path,
        |    CASE WHEN strpos(u, '?') > 0 THEN substr(u, strpos(u, '?') + 1) ELSE '' END AS q
        |  FROM parts),
        |norm AS (
        |  SELECT doc_id, url, scheme,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |         ELSE auth END AS auth,
        |    CASE WHEN path = '' THEN '/' ELSE
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(path,
        |        '/\./', '/', 'g'), '/\./', '/', 'g'),
        |        '/[^/]+/\.\./', '/', 'g'), '/[^/]+/\.\./', '/', 'g') END AS path,
        |    coalesce(array_to_string(list_filter(string_split(q, '&'),
        |      x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid|ref)(=|$)')), '&'), '') AS q
        |  FROM comp),
        |canon AS (
        |  SELECT doc_id, url,
        |    scheme || '://' || auth || path ||
        |      CASE WHEN q = '' THEN '' ELSE '?' || q END AS url_canon
        |  FROM norm)
        |SELECT doc_id, url, url_canon FROM (
        |  SELECT doc_id, url, url_canon,
        |    row_number() OVER (PARTITION BY url_canon ORDER BY doc_id) AS rn
        |  FROM canon) WHERE rn = 1""".stripMargin,

    // hash-free twin of decontaminate (q53's technique, asymmetric
    // form): eval windows are literal 8-token STRINGS from the eval
    // corpus (leaked every-97th docs + the two planted probes); a
    // corpus window hits iff its string equals any eval window;
    // coverage/trim identical to the q53 oracle
    "q61_decontaminate" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 3 THEN text || ' $evalProbe1'
         |         WHEN doc_id % 7 = 5 THEN text || ' $evalProbe2'
         |         ELSE text END AS text
         |  FROM documents),
         |evals AS (
         |  SELECT text FROM documents WHERE doc_id % 97 = 0
         |  UNION ALL SELECT '$evalProbe1' UNION ALL SELECT '$evalProbe2'),
         |et AS (
         |  SELECT list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                     x -> x != '') AS toks
         |  FROM evals),
         |ewl AS (
         |  SELECT CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |              ELSE list_transform(range(1, len(toks) - 6),
         |                     i -> array_to_string(toks[i:i+7], ' ')) END AS ws
         |  FROM et),
         |ew AS (SELECT DISTINCT unnest(ws) AS w FROM ewl),
         |t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM docs),
         |wl AS (
         |  SELECT doc_id, toks,
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
         |  FROM t),
         |wins AS (
         |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, unnest(ws) AS w FROM wl),
         |hits AS (
         |  SELECT wins.doc_id, wins.pos FROM wins JOIN ew ON ew.w = wins.w),
         |covered AS (
         |  SELECT DISTINCT doc_id, cpos FROM (
         |    SELECT doc_id, unnest(range(pos, pos + 8)) AS cpos FROM hits)),
         |tp AS (
         |  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, unnest(toks) AS tok
         |  FROM t),
         |kept AS (
         |  SELECT tp.doc_id, tp.pos, tp.tok FROM tp
         |  WHERE NOT EXISTS (SELECT 1 FROM covered c
         |                    WHERE c.doc_id = tp.doc_id AND c.cpos = tp.pos)),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |         string_agg(tok, ' ' ORDER BY pos) AS text_dedup
         |  FROM kept GROUP BY doc_id),
         |novr AS (SELECT doc_id, count(*) AS n_overlap FROM hits GROUP BY doc_id)
         |SELECT t.doc_id, len(t.toks) AS n_tokens,
         |  coalesce(n.n_overlap, 0) AS n_overlap_windows,
         |  coalesce(n.n_overlap, 0) > 0 AS flagged,
         |  len(t.toks) - coalesce(a.n_kept, 0) AS n_dropped,
         |  coalesce(a.text_dedup, '') AS text_clean
         |FROM t
         |LEFT JOIN novr n ON n.doc_id = t.doc_id
         |LEFT JOIN agg a ON a.doc_id = t.doc_id""".stripMargin,

    "q47_quantiles" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin,

    "q48_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || md5(CAST(doc_id AS VARCHAR))[1:2])::INT % 256 < 32""".stripMargin,

    "q49_rollup" ->
      """SELECT event_type, user_id % 10 AS user_band,
        |  count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY ROLLUP(event_type, (user_id % 10))""".stripMargin,

    // q74: the whole chunking recomputed — same token twin as q22/q38,
    // same nChunks formula (ceil((n-W)/S)+1), 1-based inclusive
    // list_slice mirrors Spark's 1-based slice(start, length)
    "q74_chunk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '[ \t\n\x0b\f\r]+') END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    CASE WHEN len(toks) = 0 THEN 0
        |         WHEN len(toks) <= 20 THEN 1
        |         ELSE CAST(floor((len(toks) - 20 + 14) / 15.0) AS INT) + 1 END AS n_chunks
        |  FROM t)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(least(20, n - i * 15) AS BIGINT) AS chunk_tokens,
        |  array_to_string(list_slice(toks, i * 15 + 1, i * 15 + 20), ' ') AS chunk_text
        |FROM c, unnest(range(n_chunks)) AS u(i)""".stripMargin,

    // q80: exact token counts ARE the MG estimates here (capacity >
    // distinct vocabulary, so no decrement ever fires — the regime the
    // scaladoc guarantees); rank ties break on term
    "q80_heavy_hitters" ->
      raw"""WITH toks AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |cnt AS (
        |  SELECT t.term, count(*) AS est
        |  FROM toks, unnest(ts) AS t(term)
        |  GROUP BY t.term),
        |ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY est DESC, term) AS BIGINT) AS rank,
        |         term, CAST(est AS BIGINT) AS est
        |  FROM cnt)
        |SELECT rank, term, est FROM ranked WHERE rank <= 20""".stripMargin,

    // q77: full BM25 recompute — token twin, tf/df/dl/avgdl, the
    // Lucene-variant idf, contribution arithmetic in the SAME
    // association the engine uses, rounded score ranked with the
    // doc_id tiebreak
    "q77_bm25" ->
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
        |stats AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |  FROM dl),
        |posting AS (
        |  SELECT doc_id, t.term, count(*) AS tf
        |  FROM toks, unnest(ts) AS t(term)
        |  WHERE t.term IN ('table', 'window')
        |  GROUP BY doc_id, t.term),
        |dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
        |scored AS (
        |  SELECT p.doc_id,
        |    (ln(1.0 + (CAST(s.n AS DOUBLE) - f.df + 0.5) / (f.df + 0.5))
        |       * (p.tf * (1.2 + 1.0)))
        |      / (p.tf + 1.2 * ((1.0 - 0.75) + (0.75 * d.dl) / s.avgdl)) AS c
        |  FROM posting p, dfreq f, stats s, dl d
        |  WHERE f.term = p.term AND d.doc_id = p.doc_id),
        |agg AS (
        |  SELECT doc_id, round(sum(c), 4) AS score,
        |    count(*) AS n_terms
        |  FROM scored GROUP BY doc_id),
        |ranked AS (
        |  SELECT doc_id, score, n_terms,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM agg)
        |SELECT doc_id, score, n_terms, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    // q76: the naive single-window form IS the semantics; the engine's
    // two-phase salted top-k must reproduce its row set and ranks
    // exactly (order made total by the doc_id tiebreak)
    "q76_quota" ->
      """SELECT doc_id, source, n_chars, rk FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 8""".stripMargin,

    // q81: full recompute — the fixture, the (doc, trimmed-line)
    // distinct DF count, the >= 50 threshold, and the order-preserving
    // list_filter reassembly (blank-trimmed lines immune on both
    // sides). trim() is space-only in BOTH engines by design
    "q81_line_dedup" ->
      """WITH fix AS (
        |  SELECT doc_id,
        |    'NAV: home | about | contact' || chr(10) ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN 'subscribe to our newsletter' || chr(10) ELSE '' END ||
        |    coalesce(text, '') || chr(10) ||
        |    'permalink doc-' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |    'copyright example corp all rights reserved' AS text
        |  FROM documents),
        |l AS (
        |  SELECT DISTINCT doc_id, trim(line) AS t
        |  FROM fix, unnest(string_split(text, chr(10))) AS u(line)
        |  WHERE trim(line) <> ''),
        |d AS (SELECT t FROM l GROUP BY t HAVING count(*) >= 50),
        |b AS (SELECT coalesce(list(t), []::VARCHAR[]) AS bl FROM d),
        |per AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM fix)
        |SELECT p.doc_id,
        |  CAST(len(p.ls) AS BIGINT) AS n_lines,
        |  CAST(len(p.ls) - len(list_filter(p.ls,
        |    x -> trim(x) = '' OR NOT list_contains(b.bl, trim(x)))) AS BIGINT)
        |    AS n_dropped,
        |  array_to_string(list_filter(p.ls,
        |    x -> trim(x) = '' OR NOT list_contains(b.bl, trim(x))), chr(10))
        |    AS text_clean
        |FROM per p CROSS JOIN b""".stripMargin,

    // q82: the ESTIMATOR recomputed from scratch — same md5-60-bit
    // hashes, distinct per (lang, hash), k-th smallest via row_number,
    // and the identical integer (k-1)*2^60 // h_k (HUGEINT: 15*2^60
    // overflows BIGINT); c < k reports c exactly. Tokenizer twin is
    // q80's verbatim
    "q82_distinct_sketch" ->
      raw"""WITH toks AS (
        |  SELECT lang,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT lang, u.term FROM toks, unnest(ts) AS u(term)),
        |h AS (
        |  SELECT DISTINCT lang,
        |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS hv
        |  FROM t),
        |r AS (
        |  SELECT lang, hv,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS c
        |  FROM h),
        |kth AS (SELECT lang, hv AS hk, c FROM r WHERE rn = least(c, 16)),
        |n AS (SELECT lang, count(*) AS n_values FROM t GROUP BY lang)
        |SELECT n.lang, CAST(n.n_values AS BIGINT) AS n_values,
        |  CAST(least(k.c, 16) AS BIGINT) AS n_hashes,
        |  CAST(CASE WHEN k.c < 16 THEN k.c
        |       ELSE (CAST(15 AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT))
        |            // greatest(k.hk, 1) END AS BIGINT) AS est_distinct
        |FROM n JOIN kth k ON n.lang = k.lang""".stripMargin,

    // q84: the packing arithmetic recomputed from the same one-window
    // cumsum as q70 — each doc's global span [gstart, cum) overlaps
    // sequences gstart//512 .. (cum-1)//512 (generate_series), slice
    // offsets are the same greatest/least integer algebra (DuckDB //
    // is floor division — equal to Spark's div on these non-negatives)
    "q84_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t),
        |e AS (
        |  SELECT doc_id, n_tokens, cum_tokens,
        |         cum_tokens - n_tokens AS gstart
        |  FROM c WHERE n_tokens > 0),
        |x AS (
        |  SELECT doc_id, n_tokens, cum_tokens, gstart,
        |    unnest(generate_series(gstart // 512, (cum_tokens - 1) // 512))
        |      AS seq_id
        |  FROM e)
        |SELECT doc_id, n_tokens, cum_tokens,
        |  CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(seq_id * 512 - gstart, 0) AS BIGINT) AS doc_start,
        |  CAST(least(n_tokens, (seq_id + 1) * 512 - gstart)
        |       - greatest(seq_id * 512 - gstart, 0) AS BIGINT) AS doc_len,
        |  CAST(greatest(gstart - seq_id * 512, 0) AS BIGINT) AS seq_start
        |FROM x""".stripMargin,

    // q85: the same two snapshot fixtures rebuilt in SQL, md5 content
    // hashes, and a full-outer-join CASE — DuckDB md5(varchar) equals
    // Spark md5 over the UTF-8 bytes (the Sampling-family discipline)
    "q85_snapshot_diff" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    md5(coalesce(CASE WHEN doc_id % 13 = 0
        |        THEN 'v1 ' || coalesce(text, '') ELSE text END, ''))
        |      AS old_hash
        |  FROM documents WHERE doc_id % 89 <> 0),
        |n AS (
        |  SELECT doc_id, md5(coalesce(text, '')) AS new_hash
        |  FROM documents WHERE doc_id % 97 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  old_hash, new_hash
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    // q86: host extraction (authority sans userinfo/port, lowered,
    // NULL for non-URLs) and the label-aligned suffix rule rebuilt
    // with DuckDB regex/LIKE — the '.'-anchored LIKE is exactly the
    // engine's suffix-chain join semantics
    "q86_blocklist" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE doc_id % 7
        |      WHEN 0 THEN 'https://ads.tracker.example/p/' || (doc_id % 50)::VARCHAR
        |      WHEN 1 THEN 'https://tracker.example/x/' || (doc_id % 50)::VARCHAR
        |      WHEN 2 THEN 'https://nottracker.example/x/' || (doc_id % 50)::VARCHAR
        |      WHEN 3 THEN 'https://spam.net:8443/y/' || (doc_id % 50)::VARCHAR
        |      WHEN 4 THEN 'https://user:pw@sub.spam.net/z/' || (doc_id % 50)::VARCHAR
        |      WHEN 5 THEN 'not a url'
        |      ELSE 'https://good.example.org/ok/' || (doc_id % 50)::VARCHAR
        |    END AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    nullif(lower(regexp_replace(regexp_replace(
        |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |      '^.*@', ''), ':[0-9]*$', '')), '') AS url_host
        |  FROM planted)
        |SELECT doc_id, url_host,
        |  coalesce(
        |    url_host = 'tracker.example' OR url_host LIKE '%.tracker.example'
        |    OR url_host = 'spam.net' OR url_host LIKE '%.spam.net',
        |    FALSE) AS blocked
        |FROM h""".stripMargin,

    // q87: the full estimator pipeline recomputed from raw text — q82's
    // md5-60-bit hashes and per-lang k-th-smallest, PLUS the pairwise
    // union sketch rebuilt as the k smallest distinct hashes over both
    // langs (exactly what merging two KMV sketches yields), then the
    // same inclusion-exclusion and x10000 integral division in HUGEINT
    "q87_corpus_overlap" ->
      raw"""WITH toks AS (
        |  SELECT lang,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT lang, u.term FROM toks, unnest(ts) AS u(term)),
        |h AS (
        |  SELECT DISTINCT lang,
        |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS hv
        |  FROM t),
        |r AS (
        |  SELECT lang, hv,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS c
        |  FROM h),
        |ke AS (
        |  SELECT lang,
        |    CAST(CASE WHEN c < 64 THEN c
        |         ELSE (CAST(63 AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT))
        |              // greatest(hv, 1) END AS BIGINT) AS est
        |  FROM r WHERE rn = least(c, 64)),
        |pairs AS (
        |  SELECT a.lang AS key_a, b.lang AS key_b
        |  FROM (SELECT DISTINCT lang FROM h) a,
        |       (SELECT DISTINCT lang FROM h) b
        |  WHERE a.lang < b.lang),
        |uh AS (
        |  SELECT DISTINCT p.key_a, p.key_b, h.hv
        |  FROM pairs p JOIN h ON h.lang = p.key_a OR h.lang = p.key_b),
        |ur AS (
        |  SELECT key_a, key_b, hv,
        |    row_number() OVER (PARTITION BY key_a, key_b ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY key_a, key_b) AS c
        |  FROM uh),
        |ue AS (
        |  SELECT key_a, key_b,
        |    CAST(CASE WHEN c < 64 THEN c
        |         ELSE (CAST(63 AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT))
        |              // greatest(hv, 1) END AS BIGINT) AS est_union
        |  FROM ur WHERE rn = least(c, 64))
        |SELECT p.key_a, p.key_b, ea.est AS est_a, eb.est AS est_b,
        |  ue.est_union,
        |  CAST(greatest(ea.est + eb.est - ue.est_union, 0) AS BIGINT)
        |    AS est_intersect,
        |  CAST((CAST(greatest(ea.est + eb.est - ue.est_union, 0) AS HUGEINT)
        |        * 10000) // greatest(ue.est_union, 1) AS BIGINT)
        |    AS jaccard_x10000
        |FROM pairs p
        |JOIN ke ea ON ea.lang = p.key_a
        |JOIN ke eb ON eb.lang = p.key_b
        |JOIN ue ON ue.key_a = p.key_a AND ue.key_b = p.key_b""".stripMargin,

    // q89: the sketch rebuilt from exact term counts — depth row d's
    // bucket is hex digits [8d, 8d+8) of ONE md5(term) (unsigned
    // 32-bit slice) % width; bucket totals sum counts over colliding
    // terms, estimates take the same min over rows; the linearity of
    // the counters is what makes the group-by form equal the engine's
    // streaming form
    "q89_count_min" ->
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT doc_id, u.term FROM toks, unnest(ts) AS u(term)),
        |counts AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
        |dd AS (SELECT unnest(generate_series(0, 3)) AS d),
        |g AS (
        |  SELECT dd.d,
        |    CAST(('0x' || substr(md5(c.term), 1 + 8 * dd.d, 8))
        |         AS BIGINT) % 1024 AS b,
        |    sum(c.cnt) AS tot
        |  FROM counts c CROSS JOIN dd GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT term FROM t WHERE doc_id < 3),
        |pe AS (
        |  SELECT p.term, dd.d,
        |    CAST(('0x' || substr(md5(p.term), 1 + 8 * dd.d, 8))
        |         AS BIGINT) % 1024 AS b
        |  FROM probes p CROSS JOIN dd)
        |SELECT pe.term, CAST(min(coalesce(g.tot, 0)) AS BIGINT) AS est
        |FROM pe LEFT JOIN g ON g.d = pe.d AND g.b = pe.b
        |GROUP BY pe.term""".stripMargin,

    // q90: the same fixture and the same ordered chain in RE2 —
    // block bodies, comments, tags (all with the 'g' option; DuckDB
    // replaces first-match by default), literal entity replaces with
    // &amp; last, explicit whitespace class, trim
    "q90_strip_markup" ->
      raw"""WITH planted AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || doc_id::VARCHAR ||
        |    '</title><style type="text/css">body { color: red; }</style>' ||
        |    '<script>var x = 1 < 2 && "a";</script></head><body><!-- nav bar -->' ||
        |    '<div class="main"><p>' || coalesce(text, '') ||
        |    '</p><br/>Tom &amp; Jerry &lt;3 &quot;quoted&quot; it&#39;s here&nbsp;&gt;end</div></body></html>'
        |      AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(replace(
        |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |          '(?s)<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |      '[ \t\n\r\f\x0B]+', ' ', 'g')) AS text_clean
        |  FROM planted)
        |SELECT doc_id, text_clean,
        |  CAST(length(text_clean) AS BIGINT) AS n_chars
        |FROM c""".stripMargin,

    // q91: rebuild the exact SET-BIT SET from raw data under the same
    // md5 double-hash scheme (h1/h2 = unsigned 32-bit md5 slices,
    // stride forced odd with pure arithmetic), then answer every
    // probe: might_contain = ALL k probed bits present. False
    // positives are recomputed too, not tolerated
    "q91_bloom" ->
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT doc_id, u.term FROM toks, unnest(ts) AS u(term)),
        |ii AS (SELECT unnest(generate_series(0, 4)) AS i),
        |hv AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS h1,
        |    CAST(('0x' || substr(md5(term), 9, 8)) AS BIGINT) AS h2
        |  FROM t),
        |bits AS (
        |  SELECT DISTINCT (h1 + i * (h2 - h2 % 2 + 1)) % 131072 AS bit
        |  FROM hv CROSS JOIN ii),
        |probes AS (
        |  SELECT DISTINCT term FROM t WHERE doc_id < 3
        |  UNION
        |  SELECT 'zzz_absent_' || unnest(generate_series(0, 7))::VARCHAR),
        |ph AS (
        |  SELECT term,
        |    CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS h1,
        |    CAST(('0x' || substr(md5(term), 9, 8)) AS BIGINT) AS h2
        |  FROM probes),
        |pb AS (
        |  SELECT term, (h1 + i * (h2 - h2 % 2 + 1)) % 131072 AS bit
        |  FROM ph CROSS JOIN ii)
        |SELECT pb.term, bool_and(b.bit IS NOT NULL) AS might_contain
        |FROM pb LEFT JOIN bits b ON b.bit = pb.bit
        |GROUP BY pb.term""".stripMargin,

    // q92: the identical planted codepoint sequence built with chr()
    // (769=U+0301 acute, 778=U+030A ring, 8491=ANGSTROM, 8486=OHM,
    // 4352/4449=hangul jamo, 233=composed é, 775/803=dot-above/below
    // in the WRONG canonical order), normalized by DuckDB's
    // utf8proc-backed nfc_normalize — same UAX #15 algorithm
    "q92_nfc" ->
      raw"""WITH planted AS (
        |  SELECT doc_id,
        |    'e' || chr(769) || ' A' || chr(778) || ' ' || chr(8491) ||
        |    ' ' || chr(8486) || ' ' || chr(4352) || chr(4449) || ' ' ||
        |    chr(233) || ' q' || chr(775) || chr(803) || ' ' ||
        |    coalesce(text, '') AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS text_nfc,
        |  CAST(length(raw) AS BIGINT) AS n_chars_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_chars_nfc
        |FROM planted""".stripMargin,

    // q93: recompute the salted first-md5-byte bucket and the CASE
    "q93_split" ->
      raw"""WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 2))
        |         AS BIGINT) AS bkt
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN bkt < 26 THEN 'test'
        |       WHEN bkt < 39 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM b""".stripMargin,

    "q94_pagerank" -> oracleSqlQ94,

    "q95_weighted_sample" ->
      raw"""WITH s AS (
        |  SELECT doc_id, COALESCE(n_chars, 0) + 1 AS w,
        |    (CAST(('0x' || substr(md5('wsamp:' || doc_id::VARCHAR), 1, 15))
        |          AS BIGINT) + 1) / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT doc_id, w FROM s
        |ORDER BY ln(u) / w DESC, doc_id LIMIT 100""".stripMargin,

    "q96_phrase_search" ->
      raw"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents)
        |SELECT doc_id, count(*) AS n_occ
        |FROM t, unnest(range(len(ts) - 2)) AS u(i)
        |WHERE list_slice(ts, i + 1, i + 3) = ['slow', 'hash', 'batch']
        |GROUP BY doc_id""".stripMargin,

    "q98_strip_accents" ->
      raw"""WITH planted AS (
        |  SELECT doc_id,
        |    chr(233) || 'tude ' || chr(197) || 'ngstr' || chr(246) ||
        |    'm na' || chr(239) || 've fa' || chr(231) || 'ade ' ||
        |    chr(7720) || 'us' || chr(225) || 'in q' || chr(775) ||
        |    chr(803) || ' ' || coalesce(text, '') AS raw
        |  FROM documents)
        |SELECT doc_id, lower(strip_accents(raw)) AS text_folded,
        |  CAST(length(raw) AS BIGINT) AS n_chars_raw,
        |  CAST(length(strip_accents(raw)) AS BIGINT) AS n_chars_stripped
        |FROM planted""".stripMargin,

    "q99_content_filter" ->
      raw"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, 0 AS p, count(*) AS n_occ
        |  FROM t, unnest(range(len(ts) - 2)) AS u(i)
        |  WHERE list_slice(ts, i + 1, i + 3) = ['slow', 'hash', 'batch']
        |  GROUP BY doc_id
        |  UNION ALL
        |  SELECT doc_id, 1, count(*)
        |  FROM t, unnest(range(len(ts) - 1)) AS u(i)
        |  WHERE list_slice(ts, i + 1, i + 2) = ['order', 'fast']
        |  GROUP BY doc_id
        |  UNION ALL
        |  SELECT doc_id, 2, count(*)
        |  FROM t, unnest(range(len(ts))) AS u(i)
        |  WHERE ts[i + 1] = 'merge'
        |  GROUP BY doc_id),
        |agg AS (
        |  SELECT doc_id, count(*) AS np, sum(n_occ) AS ns
        |  FROM occ GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a.np, 0) AS BIGINT) AS n_phrases_hit,
        |  CAST(COALESCE(a.ns, 0) AS BIGINT) AS n_spans,
        |  COALESCE(a.np, 0) > 0 AS blocked
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin,

    "q100_host_rank" -> oracleSqlQ100,

    // replace-count per pattern is exact because every pattern is
    // borderless — occurrences cannot overlap, so the automaton's
    // end-position count equals the non-overlapping count
    "q101_dictionary_match" ->
      raw"""WITH t AS (
        |  SELECT doc_id, lower(coalesce(text, '')) AS s FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    (length(s) - length(replace(s, 'merge', ''))) // 5 AS c0,
        |    (length(s) - length(replace(s, 'slow hash', ''))) // 9 AS c1,
        |    (length(s) - length(replace(s, 'spark', ''))) // 5 AS c2,
        |    (length(s) - length(replace(s, 'window dup', ''))) // 10 AS c3
        |  FROM t)
        |SELECT doc_id,
        |  CAST(c0 + c1 + c2 + c3 AS BIGINT) AS n_hits,
        |  CAST((c0 > 0)::INT + (c1 > 0)::INT + (c2 > 0)::INT
        |       + (c3 > 0)::INT AS BIGINT) AS n_patterns,
        |  (c0 + c1 + c2 + c3) > 0 AS flagged
        |FROM c""".stripMargin,

    "q102_corpus_report" ->
      raw"""WITH t AS (
        |  SELECT source, lang, COALESCE(n_chars, 0) AS nc,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS ntok
        |  FROM documents)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(nc) AS BIGINT) AS total_chars,
        |  CAST(sum(ntok) AS BIGINT) AS total_tokens,
        |  count(DISTINCT lang) AS n_langs,
        |  min(ntok) AS min_tokens, max(ntok) AS max_tokens
        |FROM t GROUP BY ROLLUP(source, lang)""".stripMargin,

    "q103_weighted_per_lang" ->
      raw"""WITH s AS (
        |  SELECT doc_id, lang, COALESCE(n_chars, 0) + 1 AS w,
        |    (CAST(('0x' || substr(md5('wsamp:' || doc_id::VARCHAR), 1, 15))
        |          AS BIGINT) + 1) / 1152921504606846976.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, w,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY ln(u) / w DESC, doc_id) AS rk
        |  FROM s)
        |SELECT doc_id, lang, w FROM r WHERE rk <= 20""".stripMargin,

    "q104_trustrank" -> oracleSqlQ104,

    // brute canonical triple join (a < b < c over the undirected
    // deduped simple edge set), each triangle credited to its three
    // corners via unnest
    "q105_triangles" ->
      raw"""WITH raw(src, dst) AS (
        |  SELECT doc_id, (doc_id + 1) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id + 2) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 7 + 1) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE src != dst),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1
        |  JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (
        |  SELECT t.id FROM tri, unnest([x, y, z]) AS t(id))
        |SELECT id AS doc_id, count(*) AS n_triangles
        |FROM corners GROUP BY id""".stripMargin,

    "q106_clustering" ->
      raw"""WITH raw(src, dst) AS (
        |  SELECT doc_id, (doc_id + 1) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id + 2) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 7 + 1) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE src != dst),
        |deg AS (
        |  SELECT id, count(*) AS degree FROM (
        |    SELECT a AS id FROM und UNION ALL SELECT b FROM und)
        |  GROUP BY id),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1
        |  JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tc AS (
        |  SELECT t.id, count(*) AS n_triangles
        |  FROM tri, unnest([x, y, z]) AS t(id) GROUP BY t.id)
        |SELECT d.id AS doc_id, d.degree,
        |  COALESCE(tc.n_triangles, 0) AS n_triangles,
        |  CASE WHEN d.degree >= 2
        |       THEN (COALESCE(tc.n_triangles, 0) * 20000) // (d.degree * (d.degree - 1))
        |       ELSE 0 END AS coeff_x10000
        |FROM deg d LEFT JOIN tc ON tc.id = d.id""".stripMargin,

    "q107_sentences" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    ${sentencesSql(s"'$sentenceFixturePrefix' || coalesce(text, '')")} AS sents
        |  FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS sent_idx,
        |  sents[i + 1] AS sentence,
        |  CAST(len(sents) AS BIGINT) AS n_sents
        |FROM t, unnest(range(len(sents))) AS u(i)""".stripMargin,

    // replays the sentence pipeline, then the prefix-sum binning and
    // the ordered per-(doc, bin) regroup relationally — string_agg
    // ORDER BY is the oracle's pin of the engine's
    // array_sort(collect_list(struct)) regroup
    "q108_sentence_chunks" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    ${sentencesSql(
             s"'$sentenceFixturePrefix' || " +
               "repeat('Alpha beta gamma delta. ', CAST(doc_id % 5 + 3 AS INT))" +
               " || coalesce(text, '')")} AS sents
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS si, sents[i + 1] AS sent
        |  FROM t, unnest(range(len(sents))) AS u(i)),
        |tok AS (
        |  SELECT doc_id, si, sent,
        |    CAST(CASE WHEN length(trim(sent)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(sent), '[ \\t\\n\\x0b\\f\\r]+'))
        |         END AS BIGINT) AS ntok
        |  FROM s),
        |b AS (
        |  SELECT doc_id, si, sent, ntok,
        |    (sum(ntok) OVER (PARTITION BY doc_id ORDER BY si) - ntok) // 12 AS bin
        |  FROM tok),
        |g AS (
        |  SELECT doc_id, bin, count(*) AS chunk_sents,
        |    CAST(sum(ntok) AS BIGINT) AS chunk_tokens,
        |    string_agg(sent, ' ' ORDER BY si) AS chunk_text
        |  FROM b GROUP BY doc_id, bin)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bin) - 1
        |       AS BIGINT) AS chunk_idx,
        |  chunk_sents, chunk_tokens, chunk_text
        |FROM g""".stripMargin,

    // the parser's verdict per record is a pure function of the
    // fixture's corruption rules, so the oracle needs no file at all:
    // ok records hand back the payload byte-exact with its octet
    // length; under-declared records salvage the declared length and
    // no payload; header-less records salvage neither
    "q109_warc" ->
      raw"""WITH p AS (
        |  SELECT doc_id, CAST(doc_id % 13 AS INT) AS m,
        |    'doc ' || CAST(doc_id AS VARCHAR) || ' ' || coalesce(text, '') AS pay
        |  FROM documents)
        |SELECT doc_id,
        |  CASE m WHEN 5 THEN 'bad separator'
        |         WHEN 9 THEN 'missing content-length'
        |         ELSE 'ok' END AS status,
        |  CASE m WHEN 9 THEN NULL
        |         WHEN 5 THEN CAST(octet_length(encode(pay)) - 4 AS BIGINT)
        |         ELSE CAST(octet_length(encode(pay)) AS BIGINT) END AS content_length,
        |  CASE WHEN m IN (5, 9) THEN NULL ELSE pay END AS text
        |FROM p""".stripMargin,

    // full sketch replay: bottom-16 (md5 hash, value) pairs of the
    // distinct token-count histogram per source, exact counts, lower
    // quantile by cumulative sum — both regimes recomputed, not just
    // the exact one
    "q110_quantile_sketch" ->
      raw"""WITH t AS (
        |  SELECT source,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS ntok
        |  FROM documents),
        |h AS (
        |  SELECT source, ntok AS v, count(*) AS c FROM t
        |  WHERE ntok IS NOT NULL GROUP BY source, ntok),
        |hh AS (
        |  SELECT source, v, c,
        |    CAST(('0x' || substr(md5('qsk:' || CAST(v AS VARCHAR)), 1, 15))
        |         AS BIGINT) AS hv
        |  FROM h),
        |top AS (
        |  SELECT source, v, c FROM (
        |    SELECT source, v, c,
        |      row_number() OVER (PARTITION BY source ORDER BY hv, v) AS rn
        |    FROM hh) WHERE rn <= 16),
        |w AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS wt,
        |    CAST(count(*) AS BIGINT) AS np
        |  FROM top GROUP BY source),
        |cum AS (
        |  SELECT tp.source, tp.v,
        |    sum(tp.c) OVER (PARTITION BY tp.source ORDER BY tp.v) AS cm,
        |    w.wt
        |  FROM top tp JOIN w ON w.source = tp.source),
        |qs AS (
        |  SELECT source,
        |    min(v) FILTER (WHERE cm * 10000 >= 5000 * wt) AS p50,
        |    min(v) FILTER (WHERE cm * 10000 >= 9000 * wt) AS p90,
        |    min(v) FILTER (WHERE cm * 10000 >= 9900 * wt) AS p99
        |  FROM cum GROUP BY source),
        |nn AS (SELECT source, count(ntok) AS n FROM t GROUP BY source)
        |SELECT nn.source, CAST(nn.n AS BIGINT) AS n,
        |  CAST(COALESCE(w.np, 0) AS BIGINT) AS n_pairs,
        |  qs.p50, qs.p90, qs.p99
        |FROM nn
        |LEFT JOIN w ON w.source = nn.source
        |LEFT JOIN qs ON qs.source = nn.source""".stripMargin,

    "q111_main_content" ->
      raw"""WITH f AS (
        |  SELECT doc_id,
        |    '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact menu links</a></div>'
        |    || '<h1>Title ' || CAST(doc_id AS VARCHAR) || '</h1>'
        |    || '<p>' || coalesce(text, '') || '</p>'
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN '<div class="promo"><a href="/sub">subscribe to our newsletter today</a></div>'
        |         ELSE '' END
        |    || '<p>Short note.</p>'
        |    || '<footer><a href="/t">terms</a> <a href="/p">privacy</a> <a href="/c">copyright example corp</a></footer>'
        |    AS html
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g'),
        |    '(?i)</?(blockquote|thead|tbody|table|section|article|footer|header|aside|main|nav|pre|ul|ol|li|tr|td|th|div|h[1-6]|hr|br|p)([ \t\n\r\f][^>]*)?/?>',
        |    chr(1), 'g') AS marked
        |  FROM f),
        |raws AS (
        |  SELECT doc_id, i AS ri, blocks[i + 1] AS raw
        |  FROM (SELECT doc_id, string_split(marked, chr(1)) AS blocks FROM m),
        |       unnest(range(len(blocks))) AS u(i)),
        |calc AS (
        |  SELECT doc_id, ri,
        |    trim(regexp_replace(regexp_replace(raw,
        |      '(?s)<[^>]*>', ' ', 'g'), '[ \t\n\r]+', ' ', 'g')) AS text,
        |    CAST(COALESCE(list_aggregate(list_transform(
        |      regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1),
        |      y -> length(trim(regexp_replace(regexp_replace(y,
        |        '(?s)<[^>]*>', ' ', 'g'), '[ \t\n\r]+', ' ', 'g')))),
        |      'sum'), 0) AS BIGINT) AS n_link_chars
        |  FROM raws),
        |blk AS (
        |  SELECT doc_id, ri, text,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(CASE WHEN length(text) = 0 THEN 0
        |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_words,
        |    n_link_chars
        |  FROM calc WHERE length(text) > 0)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ri) - 1
        |       AS BIGINT) AS block_idx,
        |  text, n_chars, n_words, n_link_chars,
        |  (n_link_chars * 10000) // greatest(n_chars, 1) AS link_density_x10000,
        |  (n_words >= 6 AND
        |   n_link_chars * 10000 <= 3300 * greatest(n_chars, 1)) AS keep
        |FROM blk""".stripMargin,

    // the FastSS candidate stage replayed in substr algebra, verified
    // with DuckDB's native levenshtein — both pipeline stages
    // independently recomputed (engine bucket cap of 512 is inert
    // here: the widest organic bucket is the ~25-member digit class)
    "q113_edit_join" ->
      raw"""WITH base AS (
        |  SELECT doc_id * 4 AS sid,
        |    'report ' || CAST(doc_id AS VARCHAR) || ' summary' AS s
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id * 4 + 1,
        |    'repost ' || CAST(doc_id AS VARCHAR) || ' summary'
        |  FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id * 4 + 2,
        |    'rxpxrt ' || CAST(doc_id AS VARCHAR) || ' summary'
        |  FROM documents WHERE doc_id % 4 = 2),
        |sigs AS (
        |  SELECT DISTINCT sid, s, sig
        |  FROM base, unnest([s] || list_transform(range(length(s)),
        |    i -> substr(s, 1, i) || substr(s, i + 2, length(s)))) AS u(sig)),
        |cand AS (
        |  SELECT DISTINCT a.sid AS id_a, b.sid AS id_b, a.s AS sa, b.s AS sb
        |  FROM sigs a JOIN sigs b ON b.sig = a.sig AND a.sid < b.sid)
        |SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(sa, sb) <= 1""".stripMargin,

    "q114_interleave" ->
      raw"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')
        |         END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    CASE WHEN len(toks) = 0 THEN 0
        |         WHEN len(toks) <= 16 THEN 1
        |         ELSE CAST(floor((len(toks) - 16 + 15) / 16.0) AS INT) + 1
        |         END AS n_chunks
        |  FROM t),
        |txt AS (
        |  SELECT doc_id, CAST(i * 2 AS BIGINT) AS pos, 'text' AS seg_type,
        |    CAST(NULL AS BIGINT) AS media_id,
        |    array_to_string(list_slice(toks, i * 16 + 1, i * 16 + 16), ' ')
        |      AS content,
        |    CAST(least(16, n - i * 16) AS BIGINT) AS seg_tokens
        |  FROM c, unnest(range(n_chunks)) AS u(i)),
        |med AS (
        |  SELECT doc_id, CAST((doc_id % 4) * 2 + 1 AS BIGINT) AS pos,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS seg_type,
        |    doc_id AS media_id, CAST(NULL AS VARCHAR) AS content,
        |    CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 64
        |         WHEN 1 THEN 128 ELSE 256 END AS BIGINT) AS seg_tokens
        |  FROM documents),
        |u AS (SELECT * FROM txt UNION ALL SELECT * FROM med),
        |g AS (
        |  SELECT doc_id, count(*) AS n_segments,
        |    CAST(sum(seg_tokens) AS BIGINT) AS doc_tokens
        |  FROM u GROUP BY doc_id)
        |SELECT u.doc_id,
        |  CAST(row_number() OVER (PARTITION BY u.doc_id
        |       ORDER BY pos, seg_type, media_id) - 1 AS BIGINT) AS seq_idx,
        |  seg_type, media_id, content, seg_tokens,
        |  CAST(g.n_segments AS BIGINT) AS n_segments, g.doc_tokens
        |FROM u JOIN g ON g.doc_id = u.doc_id
        |WHERE g.n_segments <= 64""".stripMargin,

    // q118: full ground-up recompute — q89's token+md5-bucket SQL,
    // sklearn smooth idf (DuckDB `/` on integers is float division,
    // matching the engine's cast-then-divide), dense vectors via a
    // bucket grid with list(... ORDER BY), list_dot_product for norms
    // and dots (index-ordered, q27's pairing with the engine's
    // DotProductExpr), the stop-bucket cap, and the same ranking
    "q118_tfidf_topk" ->
      raw"""WITH toks AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT id, u.term FROM toks, unnest(ts) AS u(term)),
        |tf AS (
        |  SELECT id,
        |    CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 1024 AS bucket,
        |    count(*) AS tf
        |  FROM t GROUP BY 1, 2),
        |dfb AS (SELECT bucket, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |w AS (
        |  SELECT tf.id, tf.bucket, dfb.df, nd.n_docs,
        |    tf.tf * (ln((nd.n_docs + 1) / (dfb.df + 1)) + 1.0) AS w
        |  FROM tf JOIN dfb USING (bucket) CROSS JOIN nd),
        |ids AS (SELECT DISTINCT id FROM tf),
        |grid AS (
        |  SELECT ids.id, gs.b
        |  FROM ids CROSS JOIN (SELECT unnest(range(1024)) AS b) gs),
        |dense AS (
        |  SELECT g.id, list(coalesce(w.w, 0.0) ORDER BY g.b) AS vec
        |  FROM grid g LEFT JOIN w ON w.id = g.id AND w.bucket = g.b
        |  GROUP BY g.id),
        |vn AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS n FROM dense),
        |idx AS (SELECT id, bucket FROM w WHERE df <= greatest(8, n_docs // 5)),
        |cand AS (
        |  SELECT DISTINCT p.id AS query_id, c.id AS neighbor_id
        |  FROM idx p JOIN idx c ON c.bucket = p.bucket AND c.id != p.id
        |  WHERE p.id < 16),
        |scored AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    list_dot_product(q.vec, c.vec) / (q.n * c.n) AS cos_raw
        |  FROM cand JOIN vn q ON q.id = cand.query_id
        |            JOIN vn c ON c.id = cand.neighbor_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine, rank
        |FROM ranked WHERE rank <= 5""".stripMargin,

    // q119: the same fixture formula, the rule table as VALUES, and
    // the decision replayed via a ranked window: longest prefix, then
    // allow over disallow, then prefix text (the engine's struct-max
    // ordering); unmatched rows sort last via the match flag
    "q119_robots_gate" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    'https://host' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ||
        |    CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN '/private/page' || CAST(doc_id AS VARCHAR)
        |      WHEN 1 THEN '/private/ok/page' || CAST(doc_id AS VARCHAR)
        |      WHEN 2 THEN '/public/page' || CAST(doc_id AS VARCHAR)
        |      WHEN 3 THEN '/tmp/x' || CAST(doc_id AS VARCHAR)
        |      ELSE '' END AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, url,
        |    CASE WHEN length(h2) > 0 THEN lower(h2) END AS host,
        |    CASE WHEN length(pth) = 0 THEN '/' ELSE pth END AS path
        |  FROM (
        |    SELECT doc_id, url,
        |      regexp_replace(regexp_replace(regexp_extract(url,
        |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^.*@', ''),
        |        ':[0-9]*$', '') AS h2,
        |      regexp_replace(url,
        |        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS pth
        |    FROM urls)),
        |rules(host, allow, prefix) AS (VALUES
        |  ('host0.example.com', false, '/private'),
        |  ('host0.example.com', true, '/private/ok'),
        |  ('host0.example.com', false, '/tmp'),
        |  ('host1.example.com', false, '/private'),
        |  ('host1.example.com', true, '/private/ok'),
        |  ('host2.example.com', false, '/private'),
        |  ('host2.example.com', true, '/private/ok'),
        |  ('host2.example.com', false, '/tmp'),
        |  ('host3.example.com', false, '/private'),
        |  ('host3.example.com', true, '/private/ok'),
        |  ('host3.example.com', false, '/tmp'),
        |  ('host3.example.com', true, '/tmp'),
        |  ('host4.example.com', false, '/private'),
        |  ('host4.example.com', true, '/private/ok'),
        |  ('host4.example.com', false, '/tmp'),
        |  ('host5.example.com', false, '/private'),
        |  ('host5.example.com', true, '/private/ok'),
        |  ('host5.example.com', false, '/')),
        |j AS (
        |  SELECT p.doc_id, p.url, p.host, r.allow, r.prefix
        |  FROM p LEFT JOIN rules r
        |    ON r.host = p.host AND starts_with(p.path, r.prefix)),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY (prefix IS NOT NULL) DESC, length(prefix) DESC,
        |             allow DESC, prefix DESC) AS rn
        |  FROM j)
        |SELECT doc_id, url, host,
        |  coalesce(allow, true) AS allowed, prefix AS matched_prefix
        |FROM rk WHERE rn = 1""".stripMargin,

    // q121: the fixture's four outcomes as literals (raw rebuilt from
    // the same CASE; fixed = the hand-verified repairs; changed =
    // which variants repair). The repair FUNCTION is spec-pinned
    // (MojibakeSpec JDK round-trip properties); this oracle pins the
    // engine's wiring and the pass-through guarantees
    "q121_mojibake" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'cafÃ© rÃ©sumÃ©'
        |    WHEN 1 THEN 'itâ€™s â€˜naÃ¯veâ€™â€¦'
        |    WHEN 2 THEN 'plain ascii doc ' || CAST(doc_id AS VARCHAR)
        |    ELSE 'café already-correct naïve' END AS raw,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'café résumé'
        |    WHEN 1 THEN 'it’s ‘naïve’…'
        |    WHEN 2 THEN 'plain ascii doc ' || CAST(doc_id AS VARCHAR)
        |    ELSE 'café already-correct naïve' END AS fixed,
        |  CAST(doc_id % 4 AS INT) IN (0, 1) AS changed
        |FROM documents""".stripMargin,

    // q126: chunks from the q74 twin (window=stride=16), the q20
    // per-chunk stopword CASE classifier, and every aggregate replayed
    "q126_mixed_lang" -> {
      val toks =
        "string_split_regex(trim(lower(chunk_text)), '[ \\t\\n\\x0b\\f\\r]+')"
      val scores = graft.textops.TextAnalysis.stopwords.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
        lang -> s"len(list_filter($toks, t -> list_contains($list, t)))"
      }
      val maxS = scores.values.mkString("greatest(", ", ", ")")
      val caseChain = scores.map { case (lang, sc) =>
        s"WHEN $sc = m THEN '$lang'"
      }.mkString(" ")
      s"""WITH fx AS (
         |  SELECT doc_id, CASE WHEN doc_id % 6 = 0
         |    THEN coalesce(text, '') || ' $frenchTail'
         |    ELSE coalesce(text, '') END AS ftext
         |  FROM documents),
         |t AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(ftext)) = 0 THEN []::VARCHAR[]
         |         ELSE string_split_regex(trim(ftext), '[ \\t\\n\\x0b\\f\\r]+')
         |         END AS toks
         |  FROM fx),
         |c AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    CASE WHEN len(toks) = 0 THEN 0
         |         WHEN len(toks) <= 16 THEN 1
         |         ELSE CAST(floor((len(toks) - 16 + 15) / 16.0) AS INT) + 1
         |         END AS n_chunks
         |  FROM t),
         |ch AS (
         |  SELECT doc_id,
         |    array_to_string(list_slice(toks, i * 16 + 1, i * 16 + 16), ' ')
         |      AS chunk_text
         |  FROM c, unnest(range(n_chunks)) AS u(i)),
         |lang AS (
         |  SELECT doc_id,
         |    CASE WHEN m <= 0 THEN 'und' $caseChain ELSE 'und' END AS clang
         |  FROM (SELECT doc_id, chunk_text, $maxS AS m FROM ch)),
         |counts AS (SELECT doc_id, clang, count(*) AS n FROM lang GROUP BY 1, 2),
         |major AS (
         |  SELECT doc_id, clang AS majority_lang, n AS mn FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY n DESC, clang ASC) AS rn FROM counts) WHERE rn = 1),
         |tot AS (
         |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chunks,
         |    CAST(count(DISTINCT clang) AS BIGINT) AS n_langs
         |  FROM counts GROUP BY 1)
         |SELECT t.doc_id, t.n_chunks, t.n_langs, m.majority_lang,
         |  (m.mn * 10000) // t.n_chunks AS majority_x10000,
         |  t.n_langs > 1 AND (m.mn * 10000) // t.n_chunks < 8000 AS mixed
         |FROM tot t JOIN major m USING (doc_id)""".stripMargin
    },

    // q127: q107's sentence pipeline + the token twin + the per-word
    // vowel-group syllable count, folded into the same exact integer
    // rational (all clamps replayed; // on non-negatives == DIV)
    "q127_readability" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    '$sentenceFixturePrefix' || coalesce(text, '') AS ftext
         |  FROM documents),
         |t AS (
         |  SELECT doc_id,
         |    ${sentencesSql("ftext")} AS sents,
         |    CASE WHEN length(trim(ftext)) = 0 THEN []::VARCHAR[]
         |         ELSE string_split_regex(trim(ftext), '[ \\t\\n\\x0b\\f\\r]+')
         |         END AS toks
         |  FROM f),
         |m AS (
         |  SELECT doc_id,
         |    CAST(greatest(len(sents), 1) AS BIGINT) AS n_sents,
         |    CAST(greatest(len(toks), 1) AS BIGINT) AS n_words,
         |    CAST(coalesce(list_sum(list_transform(toks,
         |      w -> greatest(1, len(regexp_extract_all(lower(w), '[aeiouy]+'))))),
         |      0) AS BIGINT) AS n_syllables
         |  FROM t)
         |SELECT doc_id, n_sents, n_words, n_syllables,
         |  greatest(3900 * n_words * n_words + 118000 * n_syllables * n_sents
         |    - 155900 * n_sents * n_words, 0) // (100 * n_sents * n_words)
         |    AS fk_x100
         |FROM m""".stripMargin,

    // q128: the same fixture and every line stat replayed with DuckDB
    // list functions; trim on both engines strips spaces only
    "q128_gopher_lines" ->
      raw"""WITH fx AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 4 = 0
        |      THEN '- item one' || chr(10) || '- item two' || chr(10) ||
        |           '• item three' || chr(10) ELSE '' END) ||
        |    coalesce(text, '') || chr(10) ||
        |    (CASE WHEN doc_id % 3 = 0
        |      THEN 'click to read more...' || chr(10) ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0
        |      THEN '### tags # index ## more #' || chr(10) ELSE '' END) ||
        |    'plain closing line' AS ftext
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, ftext,
        |    list_filter(string_split(ftext, chr(10)),
        |                l -> length(trim(l)) > 0) AS lines,
        |    CASE WHEN length(trim(ftext)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(ftext), '[ \t\n\x0b\f\r]+')
        |         END AS toks
        |  FROM fx),
        |c AS (
        |  SELECT doc_id,
        |    CAST(greatest(len(lines), 1) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l ->
        |      starts_with(trim(l), '- ') OR starts_with(trim(l), '•')))
        |      AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(lines, l -> ends_with(trim(l), '...')))
        |      AS BIGINT) AS n_ellipsis,
        |    CAST(greatest(len(toks), 1) AS BIGINT) AS n_words,
        |    CAST(length(ftext) - length(replace(ftext, '#', ''))
        |      AS BIGINT) AS n_hash
        |  FROM m)
        |SELECT doc_id, n_lines, n_bullet, n_ellipsis, n_words, n_hash,
        |  (n_bullet * 10000) // n_lines AS bullet_x10000,
        |  (n_ellipsis * 10000) // n_lines AS ellipsis_x10000,
        |  (n_hash * 10000) // n_words AS symbol_x10000,
        |  (n_bullet * 10000) // n_lines <= 9000
        |    AND (n_ellipsis * 10000) // n_lines <= 3000
        |    AND (n_hash * 10000) // n_words <= 1000 AS keep
        |FROM c""".stripMargin,

    // q129: both regex patterns are shared constants; the month CASE
    // and lpad normalization replay in SQL
    "q129_date_extract" -> {
      val monthCase = monthNames.zipWithIndex
        .map { case (m, i) => s"WHEN '$m' THEN '${f"${i + 1}%02d"}'" }
        .mkString("CASE tm ", " ", " END")
      s"""WITH fx AS (
         |  SELECT doc_id,
         |    (CASE CAST(doc_id % 5 AS INT)
         |      WHEN 0 THEN 'Published 2021-07-05 · '
         |      WHEN 1 THEN 'Posted on March 9, 2019 · '
         |      WHEN 2 THEN 'ref 2021-13-40 build · '
         |      WHEN 3 THEN 'June 2, 2020 draft, final 2022-01-31 · '
         |      ELSE '' END) || coalesce(text, '') AS ftext
         |  FROM documents),
         |e AS (
         |  SELECT doc_id,
         |    regexp_extract(ftext, '$dateIsoPattern', 0) AS iso,
         |    regexp_extract(ftext, '$dateTextPattern', 1) AS tm,
         |    regexp_extract(ftext, '$dateTextPattern', 2) AS td,
         |    regexp_extract(ftext, '$dateTextPattern', 3) AS ty
         |  FROM fx)
         |SELECT doc_id,
         |  CASE WHEN length(iso) > 0 THEN iso
         |       WHEN length(ty) > 0 THEN ty || '-' || ($monthCase) || '-' ||
         |         lpad(td, 2, '0')
         |  END AS pub_date,
         |  CASE WHEN length(iso) > 0 THEN 'iso'
         |       WHEN length(ty) > 0 THEN 'text' END AS date_source,
         |  (length(iso) > 0 OR length(ty) > 0) AS date_found
         |FROM e""".stripMargin
    },

    "q130_char_entropy" -> oracleSqlQ130
  )

  /** DuckDB twin of [[graft.textops.TextAnalysis.sentences]] applied
    * to the SQL string expression `input`: the SAME regex pipeline —
    * placeholder strip, ellipsis/decimal/abbreviation protection
    * (shared [[graft.textops.TextAnalysis.sentenceAbbrevs]] list),
    * terminator-run split, trim+restore, empty drop. RE2 (DuckDB) and
    * Java regex (Spark) agree on every construct used (no lookaround,
    * ASCII `\\b`, explicit classes).
    */
  private def sentencesSql(input: String): String = {
    val abbrevs = graft.textops.TextAnalysis.sentenceAbbrevs.mkString("|")
    s"""list_filter(
       |      list_transform(
       |        string_split_regex(
       |          regexp_replace(
       |            regexp_replace(
       |              regexp_replace(
       |                regexp_replace(
       |                  regexp_replace(
       |                    regexp_replace($input, '[\\x01\\x02]', '', 'g'),
       |                    '\\.\\.\\.', chr(2), 'g'),
       |                  '([0-9])\\.([0-9])', '\\1' || chr(1) || '\\2', 'g'),
       |                '([0-9])\\.([0-9])', '\\1' || chr(1) || '\\2', 'g'),
       |              '\\b($abbrevs)\\.', '\\1' || chr(1), 'g'),
       |            '\\b([ei])\\.([ge])\\.',
       |            '\\1' || chr(1) || '\\2' || chr(1), 'g'),
       |          '[.!?]+'),
       |        x -> trim(replace(replace(x, chr(2), '...'), chr(1), '.'))),
       |      x -> length(x) > 0)""".stripMargin
  }

  /** q104's oracle: [[oracleSqlQ94]]'s recurrence with init and base
    * masked to the seed set.
    */
  private val oracleSqlQ104: String = {
    val base = graft.operators.LinkGraph.Scale * 15 / 100
    val iters = (1 to 5).map { k =>
      s"""p$k AS (
         |  SELECT d0.doc_id AS id,
         |    (CASE WHEN d0.doc_id % 25 = 0 THEN $base ELSE 0 END)
         |      + COALESCE(s.c, 0) AS r
         |  FROM documents d0 LEFT JOIN (
         |    SELECT e.dst AS id,
         |           CAST(SUM((p.r * 85) // (100 * g.d)) AS BIGINT) AS c
         |    FROM p${k - 1} p JOIN e ON e.src = p.id JOIN g ON g.src = e.src
         |    GROUP BY e.dst) s ON s.id = d0.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT doc_id AS src,
       |         (doc_id * 7 + 1) % (SELECT count(*) FROM documents) AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 13 + 2) % (SELECT count(*) FROM documents)
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, 0 FROM documents WHERE doc_id % 10 = 0),
       |g AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |p0 AS (SELECT doc_id AS id,
       |         CASE WHEN doc_id % 25 = 0
       |              THEN ${graft.operators.LinkGraph.Scale} ELSE 0 END AS r
       |       FROM documents),
       |""".stripMargin + iters + """
       |SELECT id AS doc_id, r AS trust_fp FROM p5""".stripMargin
  }

  /** q100's oracle: the q94 unrolled fixed-point recurrence keyed on
    * host STRINGS (the engine's md5 ids are an internal detail — graph
    * isomorphism means the ranks agree as long as the edge sets do).
    */
  private val oracleSqlQ100: String = {
    val base = graft.operators.LinkGraph.Scale * 15 / 100
    val iters = (1 to 5).map { k =>
      s"""p$k AS (
         |  SELECT n.host AS id, $base + COALESCE(s.c, 0) AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id,
         |           CAST(SUM((p.r * 85) // (100 * g.deg)) AS BIGINT) AS c
         |    FROM p${k - 1} p JOIN e ON e.src = p.id JOIN g ON g.src = e.src
         |    GROUP BY e.dst) s ON s.id = n.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    'h' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host,
       |    'h' || CAST((doc_id * 3 + 1) % 20 AS VARCHAR) || '.example' AS tgt
       |  FROM documents),
       |n AS (SELECT DISTINCT host FROM d),
       |e AS (SELECT DISTINCT host AS src, tgt AS dst FROM d
       |      UNION SELECT DISTINCT host, 'h0.example' FROM d),
       |g AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |p0 AS (SELECT host AS id, ${graft.operators.LinkGraph.Scale} AS r FROM n),
       |""".stripMargin + iters + """
       |SELECT d.doc_id, d.host, p.r AS host_rank_fp
       |FROM d JOIN p5 p ON p.id = d.host""".stripMargin
  }

  /** q94's oracle: the SAME integer PageRank recurrence as
    * [[graft.operators.LinkGraph.pageRank]], 5 iterations unrolled as
    * chained CTEs (DuckDB 1.0 recursive CTEs cannot aggregate over the
    * recursive table). DuckDB's 128-bit intermediates make the plain
    * `(r*85)//(100*d)` equal the engine's overflow-safe split form.
    */
  private val oracleSqlQ94: String = {
    val base = graft.operators.LinkGraph.Scale * 15 / 100
    val iters = (1 to 5).map { k =>
      s"""p$k AS (
         |  SELECT d0.doc_id AS id, $base + COALESCE(s.c, 0) AS r
         |  FROM documents d0 LEFT JOIN (
         |    SELECT e.dst AS id,
         |           CAST(SUM((p.r * 85) // (100 * g.d)) AS BIGINT) AS c
         |    FROM p${k - 1} p JOIN e ON e.src = p.id JOIN g ON g.src = e.src
         |    GROUP BY e.dst) s ON s.id = d0.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT doc_id AS src,
       |         (doc_id * 7 + 1) % (SELECT count(*) FROM documents) AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 13 + 2) % (SELECT count(*) FROM documents)
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, 0 FROM documents WHERE doc_id % 10 = 0),
       |g AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |p0 AS (SELECT doc_id AS id, ${graft.operators.LinkGraph.Scale} AS r
       |       FROM documents),
       |""".stripMargin + iters + """
       |SELECT id AS doc_id, r AS rank_fp FROM p5""".stripMargin
  }

  private def annTwinOracleSql(family: String): String =
    s"""WITH base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings),
       |c AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM base),
       |q AS (SELECT vec_id AS qid, v AS qv, n AS qn FROM c WHERE vec_id < 20),
       |scored AS (
       |  SELECT qid, c.vec_id AS nid,
       |         list_dot_product(c.v, qv) / (c.n * qn) AS cos
       |  FROM c CROSS JOIN q WHERE c.vec_id != qid),
       |top1 AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r
       |    FROM scored) WHERE r = 1)
       |SELECT '$family' AS family,
       |  count(*) AS n_truth,
       |  count(*) FILTER (WHERE nid = qid + 100000) AS n_found,
       |  CAST(floor(10000.0 * (count(*) FILTER (WHERE nid = qid + 100000)) / count(*))
       |       AS BIGINT) AS recall_x10000
       |FROM top1""".stripMargin
}
