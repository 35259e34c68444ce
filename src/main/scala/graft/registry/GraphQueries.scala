package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Graph query registry — link-graph ops (PageRank family, triangles, robots/blocklist gates, snapshot diff).
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object GraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // incremental PageRank (round-10 verdict item 8): rank the OLD
    // snapshot in full, then apply the NEW snapshot via
    // pageRankDelta — multi-source closure from the edge-delta
    // endpoints, rank iterations on the touched components ONLY,
    // every other rank carried forward. The fixture's groups-of-4
    // components change in exactly two id classes; the static oracle
    // recomputes FULL PageRank on the new graph (the equality
    // contract) plus the touched-rule flag (the laziness contract)
    "q137_incremental_pagerank" -> ((s, dir) => {
      import graft.operators.LinkGraph
      val nodes = table(s, dir, "documents").select(col("doc_id").as("id"))
      val oldE = deltaGraphEdges(s, dir, isNew = false)
      val newE = deltaGraphEdges(s, dir, isNew = true)
      val prev = LinkGraph.pageRank(nodes, "id", oldE, iters = 5)
      LinkGraph.pageRankDelta(nodes, "id", newE, nodes, oldE, prev, iters = 5)
        .select(col("id").as("doc_id"), col("rank"), col("recomputed"))
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


    // crawl politeness scheduling — the frontier→fetcher step after
    // the robots/blocklist gates: per-host 0-based fetch slots in
    // md5-fair order, fetch_time = slot · crawl_delay(host). The slot
    // is computed TWO-PHASE over md5-prefix buckets (the q17 chunked
    // discipline: a 10^8-URL host must not serialize into one
    // window task); the oracle computes the same slots with the naive
    // per-host window — the two formulations are oracle-equal by
    // construction, which is exactly the claim
    "q147_crawl_schedule" -> ((s, dir) => {
      import s.implicits._
      val id = col("doc_id")
      val urls = table(s, dir, "documents").select(id,
        concat(lit("h"), (id % 5).cast("string"), lit(".example")).as("host"),
        concat(lit("https://h"), (id % 5).cast("string"),
          lit(".example/p/"), id.cast("string")).as("url"))
      val delays = (0 until 4)
        .map(h => (s"h$h.example", (h + 1) * 100L)).toDF("host", "delay_ms")
      graft.operators.CrawlScheduler.schedule(
        urls, "host", "url", delays, defaultDelayMs = 1000L)
        .select("doc_id", "host", "url", "fetch_slot", "fetch_time_ms")
    }),


    // registrable-domain rollup (eTLD+1 heuristic) — the quota/report
    // granularity crawl pipelines actually use (host-level quotas
    // over-split www./blog./cdn. mirrors of one site): planted hosts
    // exercise the 2-letter-ccTLD + public-second-level rule
    // (alpha.co.uk keeps 3 labels), deep subdomains, and bare
    // 2-label hosts; per-domain docs, distinct hosts, token mass,
    // and integral mean. Fully static oracle
    "q144_domain_report" -> ((s, dir) => {
      val id = col("doc_id")
      val host = when(id % 8 === 0, lit("www.alpha.co.uk"))
        .when(id % 8 === 1, lit("blog.alpha.co.uk"))
        .when(id % 8 === 2, lit("alpha.co.uk"))
        .when(id % 8 === 3, lit("beta.com"))
        .when(id % 8 === 4, lit("news.beta.com"))
        .when(id % 8 === 5, lit("cdn.gamma.org"))
        .when(id % 8 === 6, lit("deep.sub.gamma.org"))
        .otherwise(lit("delta.io"))
      table(s, dir, "documents")
        .select(id, host.as("host"),
          graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("_nt"))
        .withColumn("domain",
          graft.operators.Blocklist.registrableDomain(col("host")))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"),
          sum(col("_nt")).as("n_tokens"))
        .withColumn("mean_tokens_x100",
          expr("CAST(n_tokens * 100 DIV n_docs AS BIGINT)"))
    }),


    // per-target-host anchor-text aggregation — the link-graph TEXT
    // signal (anchor-text corpora; the feature TrustRank-era search
    // used for target-page description): q115's extraction machinery
    // extended through the closing tag, inner text normalized (nested
    // tags stripped, whitespace collapsed), aggregated per dst_host
    // with the modal anchor decided by (count desc, text asc) on the
    // already-reduced (host, anchor, count) frame. Fixture hrefs are
    // absolute lowercase-scheme http(s), so the static oracle replays
    // extraction + normalization + aggregation entirely in SQL
    "q140_anchor_text" -> ((s, dir) => {
      val links = graft.textops.LinkExtract.anchorTexts(
        anchorFixture(s, dir), Seq(col("doc_id")), col("page_url"), col("html"))
      graft.textops.LinkExtract.aggregateAnchors(links, "doc_id")
    }),


    // per-key distribution drift between snapshots (round-11; the PSI
    // mix check beside q85's content diff): prev keys follow
    // doc_id % 5, cur keys doc_id % 6 — k5 is born, every share
    // shifts. Integral shares; the one float column is the per-key
    // PSI term from already-integral inputs, 4-decimal rounded (the
    // q145 ln convention); absent keys clip to the 1/10000 floor
    "q165_share_drift" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val prev = d.filter(col("doc_id") % 89 =!= 0)
        .select(concat(lit("k"), (col("doc_id") % 5).cast("string")).as("key"))
      val cur = d.filter(col("doc_id") % 97 =!= 0)
        .select(concat(lit("k"), (col("doc_id") % 6).cast("string")).as("key"))
      graft.operators.DriftReport.shareDrift(prev, cur, "key")
    }),


    // robots.txt PARSER (round-11): raw per-host robots text ->
    // the (host, allow, prefix) rule table q119's gate and the
    // crawl-delay table q147's scheduler consume. Fixture covers the
    // documented RFC 9309 subset branch by branch: exact-agent groups
    // beating *, consecutive UA lines sharing a group, multiple
    // matching groups combining, comments, empty Disallow (allow-all
    // no-op), orphan rules before any UA line, invalid Crawl-delay
    // values, empty files, and hosts with no matching group. Static
    // oracle replays line split, directive regexes, the lag/cumsum
    // group numbering, selection, and aggregation
    "q163_robots_parse" -> ((s, dir) => {
      val i = col("id")
      val txt = when(i === 0, lit(
          "User-agent: *\nDisallow: /private\nAllow: /private/ok\nCrawl-delay: 2"))
        .when(i === 1, lit(
          "User-agent: graftbot\nDisallow: /bot\nUser-agent: *\nDisallow: /all"))
        .when(i === 2, lit(
          "# top comment\nUser-agent: *\nDisallow:\nAllow: /a  # inline\nCrawl-delay: abc"))
        .when(i === 3, lit(
          "User-agent: GraftBot\nUser-agent: otherbot\nDisallow: /shared\n" +
            "Crawl-delay: 1\nUser-agent: graftbot\nDisallow: /extra\nCrawl-delay: 3"))
        .when(i === 4, lit("Disallow: /orphan\nUser-agent: *\nAllow: /"))
        .when(i === 5, lit(""))
        .otherwise(lit("User-agent: otherbot\nDisallow: /x"))
      graft.operators.RobotsGate.parseRobots(
        s.range(7).select(
          concat(lit("host"), i.cast("string"), lit(".example.com")).as("host"),
          txt.as("robots")),
        "host", "robots", "graftbot")
    }),


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
    })
  )

  val oracleSql: Map[String, String] = Map(

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


    "q94_pagerank" -> oracleSqlQ94,

    "q137_incremental_pagerank" -> oracleSqlQ137,


    "q100_host_rank" -> oracleSqlQ100,


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


    // q147: the same fixture, the delay table as VALUES, and the slot
    // computed with the NAIVE per-host window the engine deliberately
    // avoids — two-phase == window equality is the checked claim
    "q147_crawl_schedule" ->
      """WITH fix AS (
        |  SELECT doc_id,
        |    'h' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
        |    'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example/p/' ||
        |      CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |delays(host, delay_ms) AS (VALUES
        |  ('h0.example', 100), ('h1.example', 200),
        |  ('h2.example', 300), ('h3.example', 400)),
        |slotted AS (
        |  SELECT doc_id, host, url,
        |    row_number() OVER (PARTITION BY host
        |      ORDER BY md5(url) ASC, url ASC) - 1 AS fetch_slot
        |  FROM fix)
        |SELECT s.doc_id, s.host, s.url,
        |  CAST(s.fetch_slot AS BIGINT) AS fetch_slot,
        |  CAST(s.fetch_slot * coalesce(d.delay_ms, 1000) AS BIGINT)
        |    AS fetch_time_ms
        |FROM slotted s LEFT JOIN delays d ON d.host = s.host""".stripMargin,


    // q144: fixture, label algebra (string_split + inclusive list
    // slicing), the 2-letter-TLD + public-second-level CASE, the q56
    // token count, and the x100 integral mean
    "q144_domain_report" ->
      raw"""WITH fix AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 8 AS INT)
        |      WHEN 0 THEN 'www.alpha.co.uk'
        |      WHEN 1 THEN 'blog.alpha.co.uk'
        |      WHEN 2 THEN 'alpha.co.uk'
        |      WHEN 3 THEN 'beta.com'
        |      WHEN 4 THEN 'news.beta.com'
        |      WHEN 5 THEN 'cdn.gamma.org'
        |      WHEN 6 THEN 'deep.sub.gamma.org'
        |      ELSE 'delta.io' END AS host,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS nt
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, host, nt,
        |    CASE WHEN len(ls) <= 2 THEN host
        |         WHEN length(ls[len(ls)]) = 2 AND list_contains(
        |             ['co','com','org','net','gov','ac','edu'], ls[len(ls)-1])
        |           THEN array_to_string(ls[len(ls)-2:len(ls)], '.')
        |         ELSE array_to_string(ls[len(ls)-1:len(ls)], '.') END AS domain
        |  FROM (SELECT *, string_split(host, '.') AS ls FROM fix))
        |SELECT domain, count(*) AS n_docs,
        |  count(DISTINCT host) AS n_hosts,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  CAST((sum(nt) * 100) // count(*) AS BIGINT) AS mean_tokens_x100
        |FROM d GROUP BY domain""".stripMargin,


    // q165: both snapshots' counts, x10000 integral shares, and the
    // same clipped PSI-term formula with DuckDB's ln
    "q165_share_drift" ->
      """WITH prev AS (
        |  SELECT 'k' || CAST(doc_id % 5 AS VARCHAR) AS key FROM documents
        |  WHERE doc_id % 89 != 0),
        |cur AS (
        |  SELECT 'k' || CAST(doc_id % 6 AS VARCHAR) AS key FROM documents
        |  WHERE doc_id % 97 != 0),
        |pc AS (SELECT key, count(*) AS n_prev FROM prev GROUP BY key),
        |cc AS (SELECT key, count(*) AS n_cur FROM cur GROUP BY key),
        |pt AS (SELECT sum(n_prev) AS t FROM pc),
        |ct AS (SELECT sum(n_cur) AS t FROM cc),
        |ps AS (
        |  SELECT key, n_prev,
        |    CAST(n_prev * 10000 // pt.t AS BIGINT) AS share_prev_x10000
        |  FROM pc, pt),
        |cs AS (
        |  SELECT key, n_cur,
        |    CAST(n_cur * 10000 // ct.t AS BIGINT) AS share_cur_x10000
        |  FROM cc, ct),
        |j AS (
        |  SELECT coalesce(ps.key, cs.key) AS key,
        |    coalesce(n_prev, 0) AS n_prev, coalesce(n_cur, 0) AS n_cur,
        |    coalesce(share_prev_x10000, 0) AS share_prev_x10000,
        |    coalesce(share_cur_x10000, 0) AS share_cur_x10000
        |  FROM ps FULL OUTER JOIN cs ON ps.key = cs.key)
        |SELECT key, CAST(n_prev AS BIGINT) AS n_prev,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  share_prev_x10000, share_cur_x10000,
        |  share_cur_x10000 - share_prev_x10000 AS delta_x10000,
        |  round(
        |    (greatest(share_cur_x10000, 1) / 10000.0 -
        |     greatest(share_prev_x10000, 1) / 10000.0) *
        |    ln(greatest(share_cur_x10000, 1) * 1.0 /
        |       greatest(share_prev_x10000, 1)), 4) AS psi_term
        |FROM j""".stripMargin,


    // q163: the parse replayed line by line — the same comment-strip /
    // directive / value regexes, lag-based group numbering, the
    // exact-beats-star selection, empty-Disallow and invalid-delay
    // drops, and the distinct/max aggregations
    "q163_robots_parse" ->
      raw"""WITH hosts AS (
        |  SELECT 'host' || CAST(i AS VARCHAR) || '.example.com' AS host,
        |    CASE i
        |      WHEN 0 THEN 'User-agent: *' || chr(10) || 'Disallow: /private' ||
        |        chr(10) || 'Allow: /private/ok' || chr(10) || 'Crawl-delay: 2'
        |      WHEN 1 THEN 'User-agent: graftbot' || chr(10) || 'Disallow: /bot' ||
        |        chr(10) || 'User-agent: *' || chr(10) || 'Disallow: /all'
        |      WHEN 2 THEN '# top comment' || chr(10) || 'User-agent: *' ||
        |        chr(10) || 'Disallow:' || chr(10) || 'Allow: /a  # inline' ||
        |        chr(10) || 'Crawl-delay: abc'
        |      WHEN 3 THEN 'User-agent: GraftBot' || chr(10) ||
        |        'User-agent: otherbot' || chr(10) || 'Disallow: /shared' ||
        |        chr(10) || 'Crawl-delay: 1' || chr(10) || 'User-agent: graftbot' ||
        |        chr(10) || 'Disallow: /extra' || chr(10) || 'Crawl-delay: 3'
        |      WHEN 4 THEN 'Disallow: /orphan' || chr(10) || 'User-agent: *' ||
        |        chr(10) || 'Allow: /'
        |      WHEN 5 THEN ''
        |      ELSE 'User-agent: otherbot' || chr(10) || 'Disallow: /x'
        |    END AS robots
        |  FROM range(7) t(i)),
        |ls AS (SELECT host, string_split(robots, chr(10)) AS a FROM hosts),
        |ln AS (
        |  SELECT host, g.i AS ln,
        |    trim(regexp_replace(a[g.i], '#.*$$', '')) AS clean
        |  FROM ls, unnest(generate_series(1, len(a))) AS g(i)),
        |p AS (
        |  SELECT host, ln,
        |    lower(regexp_extract(clean, '^([A-Za-z-]+)[ '||chr(9)||']*:', 1)) AS dir,
        |    trim(regexp_extract(clean,
        |      '^[A-Za-z-]+[ '||chr(9)||']*:[ '||chr(9)||']*(.*)$$', 1)) AS val
        |  FROM ln
        |  WHERE regexp_extract(clean, '^([A-Za-z-]+)[ '||chr(9)||']*:', 1) != ''),
        |g AS (
        |  SELECT host, ln, dir, val,
        |    dir = 'user-agent' AS ua,
        |    coalesce(lag(dir = 'user-agent') OVER
        |      (PARTITION BY host ORDER BY ln), false) AS prev_ua
        |  FROM p),
        |gg AS (
        |  SELECT host, ln, dir, val, ua,
        |    sum(CASE WHEN ua AND NOT prev_ua THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY host ORDER BY ln
        |       ROWS UNBOUNDED PRECEDING) AS gid
        |  FROM g),
        |gv AS (SELECT * FROM gg WHERE gid > 0),
        |ga AS (
        |  SELECT host, gid,
        |    max(lower(val) = 'graftbot') AS is_exact,
        |    max(val = '*') AS is_star
        |  FROM gv WHERE ua GROUP BY host, gid),
        |he AS (SELECT host, max(is_exact) AS any_exact FROM ga GROUP BY host),
        |sel AS (
        |  SELECT ga.host, ga.gid FROM ga JOIN he USING (host)
        |  WHERE CASE WHEN he.any_exact THEN ga.is_exact ELSE ga.is_star END),
        |body AS (
        |  SELECT gv.* FROM gv JOIN sel
        |    ON sel.host = gv.host AND sel.gid = gv.gid
        |  WHERE NOT gv.ua),
        |rules AS (
        |  SELECT DISTINCT host, 'rule' AS kind, dir = 'allow' AS allow,
        |    val AS prefix, CAST(NULL AS BIGINT) AS delay_ms
        |  FROM body
        |  WHERE dir IN ('allow', 'disallow') AND val != ''),
        |delays AS (
        |  SELECT host, 'delay' AS kind, CAST(NULL AS BOOLEAN) AS allow,
        |    CAST(NULL AS VARCHAR) AS prefix,
        |    max(CAST(val AS BIGINT) * 1000) AS delay_ms
        |  FROM body
        |  WHERE dir = 'crawl-delay' AND regexp_matches(val, '^[0-9]+$$')
        |  GROUP BY host)
        |SELECT * FROM rules UNION ALL SELECT * FROM delays""".stripMargin,


    // q140: the fixture formula, the engine's anchor regexes QUOTED
    // VERBATIM from LinkExtract (every construct Java/RE2 common
    // ground), identity resolution for absolute http(s) hrefs, the
    // q86 host regex, and the same two aggregations + modal window
    "q140_anchor_text" -> {
      def rq(p: String): String = "'" + p.replace("'", "''") + "'"
      val ap = rq(graft.textops.LinkExtract.anchorPattern)
      val hp = rq(graft.textops.LinkExtract.hrefPattern)
      raw"""WITH fix AS (
        |  SELECT doc_id,
        |    '<p>intro ' || CAST(doc_id AS VARCHAR) || '</p>' ||
        |    '<a href="https://h' || CAST(doc_id % 10 AS VARCHAR) ||
        |      '.example/p/' || CAST(doc_id % 25 AS VARCHAR) ||
        |      '">Read <b>more</b> now</a>' ||
        |    '<a href=''https://h' || CAST((doc_id * 3 + 1) % 10 AS VARCHAR) ||
        |      '.example/next''>  Next' || chr(10) || ' page  </a>' ||
        |    CASE WHEN doc_id % 4 = 0 THEN
        |      '<a href=https://h' || CAST(doc_id % 10 AS VARCHAR) ||
        |      '.example/img><img src="i.png"/></a>' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      '<a href="javascript:void(0)">Click</a>' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      '<A HREF="https://h3.example/up">CAPS  anchor</A>' ELSE '' END
        |      AS html
        |  FROM documents),
        |m AS (
        |  SELECT f.doc_id, u.elem
        |  FROM (SELECT doc_id, regexp_extract_all(html, $ap, 0) AS es
        |        FROM fix) f,
        |       unnest(f.es) AS u(elem)),
        |x AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_extract(elem, $hp, 1),
        |      '^["'']|["'']$$', '', 'g') AS href,
        |    trim(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(elem, '(?is)^<a[^>]*>', ''),
        |      '(?is)</a>$$', ''), '<[^>]*>', ' ', 'g'),
        |      '[ \t\n\r\f]+', ' ', 'g')) AS anchor
        |  FROM m),
        |hh AS (
        |  SELECT doc_id, anchor,
        |    nullif(lower(regexp_replace(regexp_replace(
        |      regexp_extract(href, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |      '^.*@', ''), ':[0-9]*$$', '')), '') AS dst_host
        |  FROM x
        |  WHERE regexp_matches(href, '^https?://')),
        |ph AS (
        |  SELECT dst_host, count(*) AS n_links,
        |    count(DISTINCT doc_id) AS n_docs,
        |    count(DISTINCT anchor) FILTER (WHERE anchor <> '') AS n_anchors
        |  FROM hh GROUP BY dst_host),
        |pa AS (
        |  SELECT dst_host, anchor, count(*) AS c
        |  FROM hh WHERE anchor <> '' GROUP BY dst_host, anchor),
        |tp AS (
        |  SELECT dst_host, anchor AS top_anchor, c AS top_anchor_n,
        |    row_number() OVER (PARTITION BY dst_host
        |      ORDER BY c DESC, anchor ASC) AS rn
        |  FROM pa)
        |SELECT ph.dst_host, CAST(ph.n_links AS BIGINT) AS n_links,
        |  CAST(ph.n_docs AS BIGINT) AS n_docs,
        |  CAST(ph.n_anchors AS BIGINT) AS n_anchors,
        |  tp.top_anchor, CAST(tp.top_anchor_n AS BIGINT) AS top_anchor_n
        |FROM ph LEFT JOIN tp ON tp.dst_host = ph.dst_host AND tp.rn = 1""".stripMargin
    },


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
        |FROM rk WHERE rn = 1""".stripMargin
  )
}
