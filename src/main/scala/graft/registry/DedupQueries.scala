package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Dedup query registry — document dedup families (n-gram/minhash/simhash/winnowing, spans, lines, decontamination, URL, edit-distance).
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // winnowing rolling-hash fingerprint overlap (rows-only; passage-
    // copy detection guarantee pinned in WinnowingSpec)
    "q31_winnow_pairs" -> ((s, dir) => {
      graft.textops.NearDup.winnowPairs(
        plantedDocs(s, dir), "doc_id", "text", minSharedRatio = 0.5)
    }),


    // entity resolution / record linkage (round-11): blocking on the
    // record's numeric token, integral Fellegi–Sunter-ish scoring
    // (name-token Jaccard scaled to 600 + 250 nation + 150 segment,
    // threshold 700), transitive clustering via the CC operator —
    // over the erFixture's clean/twin/decoy customer records. The
    // decoy shares its base's BLOCK but scores 450 (Jaccard 1/2,
    // no nation bonus): blocking recall and scoring precision are
    // both live in the oracle check
    "q171_entity_resolution" -> ((s, dir) => {
      val recs = erFixture(s, dir)
        .withColumn("blk", regexp_extract(col("name"), "[0-9]+", 0))
        .withColumn("toks", array_distinct(split(col("name"), " ")))
      graft.operators.EntityResolution.resolve(
        recs, "rec_id", "blk", "toks",
        nameWeight = 600, exactBonus = Seq("nation" -> 250, "segment" -> 150),
        threshold = 700L)
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


    // EXACT all-duplicated-substring discovery (ExactSubstr, Lee et
    // al. 2022, re-expressed): one row per MAXIMAL duplicated token
    // span with boundary-precise 0-based offsets — stride-1 windows
    // make the covered-position union exact, and results are decided
    // by LITERAL window text (hashes only gate which windows carry
    // text payload). Fixture plants k-misaligned verbatim 23-token
    // cross-doc copies behind a one-token filler; the fully static
    // oracle recomputes windows, first-occurrence, the gaps-and-
    // islands merge, and the span md5 from raw token strings — no
    // hash appears on either side of the compare
    "q132_exact_spans" -> ((s, dir) => {
      graft.textops.SpanDedup.exactSpans(
        exactSpanFixture(s, dir), "doc_id", "ftext", k = 8)
        .select(col("doc_id"), col("span_start"), col("span_len"),
          md5(col("span_text")).as("span_md5"))
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


    // per-eval-doc contamination report — q61's REVERSE view (the
    // GPT-3 appendix-C / PaLM §C.2 table): for each benchmark doc,
    // the distinct-window leak fraction into the training corpus and
    // the distinct corpus docs touching it. Same planted fixture as
    // q61 with the eval side carrying ids; eval windows broadcast,
    // one corpus scan, matched-pair-bounded aggregation. Oracle
    // matches literal token windows (the q53/q61 hash-free technique)
    "q151_contamination_report" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" " + evalProbe1)))
          .when(col("doc_id") % 7 === 5, concat(col("text"), lit(" " + evalProbe2)))
          .otherwise(col("text")).as("text"))
      val evals = table(s, dir, "documents")
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("eval_id"), col("text"))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(900001L, evalProbe1),
            org.apache.spark.sql.Row(900002L, evalProbe2)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("eval_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))))
      graft.textops.SpanDedup.contaminationReport(
        docs, "doc_id", "text", evals, "eval_id", "text", k = 8)
    }),


    // multi-benchmark contamination dashboard + trend (round-11; the
    // per-release table a curation team tracks, q151 x q85): three
    // benchmarks — A (97th docs + probe1), B (89th docs + probe2),
    // C (a clean synthetic probe that appears nowhere) — scanned
    // against TWO corpus snapshots in one query: prev = raw
    // documents, cur = the q151-planted release. Per benchmark:
    // window-level leak fraction, docs touched, eval docs
    // contaminated, and the signed delta vs the previous snapshot.
    // One corpus scan per snapshot, all benchmarks' windows broadcast
    // together; oracle replays both scans hash-free
    "q160_contamination_dashboard" -> ((s, dir) => {
      val docsPrev = table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      graft.textops.SpanDedup.contaminationTrend(
        docsPrev, plantedContaminationDocs(s, dir), "doc_id", "text",
        benchEvals(s, dir), "benchmark", "eval_id", "text", k = 8)
    }),


    // the q160 dashboard against a PERSISTED span index (round-11):
    // the corpus's window index exists anyway (substring dedup builds
    // it), so the per-release dashboard probes it with ONLY the eval
    // windows in hand — zero corpus bytes scanned. Window-grain index
    // = no n_docs_hit column; everything else must equal the scanning
    // dashboard (spec-pinned), and the oracle is the q160 cur-side
    // replay minus that column. The index builds once per process in
    // a tmp fixture dir (the q131 WARC fixture discipline)
    "q166_contamination_indexed" -> ((s, dir) => {
      val docsCur = plantedContaminationDocs(s, dir)
      val idxDir = crawlFixtureDir(dir, "span-idx-contam")
      val winPath = new org.apache.hadoop.fs.Path(s"$idxDir/windows.parquet")
      if (!winPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .exists(winPath))
        graft.textops.SpanDedup.buildSpanIndex(
          docsCur, "doc_id", "text", idxDir, k = 8)
      graft.textops.SpanDedup.contaminationDashboardIndexed(
        s, idxDir, benchEvals(s, dir), "benchmark", "eval_id", "text", k = 8)
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


    // keep-first cross-doc paragraph dedup (Lee et al. 2022 /
    // RefinedWeb §3.3) — verbatim repeated paragraphs survive exactly
    // once, at their smallest (doc_id, idx); LineDedup's complement
    // (template text vanishes everywhere, duplicated CONTENT keeps one
    // canonical copy). First-occurrence is an AGGREGATE
    // (min(struct(id, idx)) with map-side combine), never a window —
    // a nav bar in 10^8 docs reduces per-task instead of one-tasking.
    // Oracle recomputes the fixture, the trimmed-match rule, the
    // (id, idx) keep-first window, and the ordered reassembly
    "q138_paragraph_dedup" -> ((s, dir) => {
      graft.textops.ParagraphDedup.dedupParagraphs(
        paragraphFixture(s, dir), "doc_id", "text")
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
    })
  )

  val oracleSql: Map[String, String] = Map(

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


    // q171: fixture replayed via UNION ALL, the same integral score
    // algebra (list_intersect / list_distinct-concat lengths, `//`),
    // and the q36-proven recursive min-label reach for clustering
    "q171_entity_resolution" ->
      """WITH RECURSIVE
        |recs AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS rec_id,
        |    'customer ' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS name,
        |    CAST(c_nationkey AS BIGINT) AS nation,
        |    lower(c_mktsegment) AS segment
        |  FROM customer
        |  UNION ALL
        |  SELECT CAST(c_custkey + 100000 AS BIGINT),
        |    'customer ' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') || ' inc',
        |    CAST(c_nationkey AS BIGINT), lower(c_mktsegment)
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT CAST(c_custkey + 200000 AS BIGINT),
        |    'customer ' || lpad(CAST(c_custkey AS VARCHAR), 9, '0')
        |      || ' llc corp',
        |    CAST((c_nationkey + 1) % 25 AS BIGINT), lower(c_mktsegment)
        |  FROM customer WHERE c_custkey % 5 = 0),
        |t AS (
        |  SELECT rec_id, regexp_extract(name, '[0-9]+') AS blk,
        |    list_distinct(string_split(name, ' ')) AS toks, nation, segment
        |  FROM recs),
        |bc AS (SELECT blk, count(*) AS bn FROM t GROUP BY blk),
        |tb AS (SELECT t.* FROM t JOIN bc ON bc.blk = t.blk
        |       WHERE bc.bn <= 64),
        |p AS (
        |  SELECT a.rec_id AS id_a, b.rec_id AS id_b,
        |    600 * len(list_intersect(a.toks, b.toks))
        |      // greatest(len(list_distinct(a.toks || b.toks)), 1)
        |    + CASE WHEN a.nation = b.nation THEN 250 ELSE 0 END
        |    + CASE WHEN a.segment = b.segment THEN 150 ELSE 0 END AS score
        |  FROM tb a JOIN tb b ON a.blk = b.blk AND a.rec_id < b.rec_id),
        |e AS (SELECT id_a, id_b FROM p WHERE score >= 700),
        |sym AS (SELECT id_a, id_b FROM e UNION SELECT id_b, id_a FROM e),
        |reach(id, r) AS (
        |  SELECT rec_id, rec_id FROM recs
        |  UNION
        |  SELECT s.id_b, reach.r FROM reach JOIN sym s ON s.id_a = reach.id),
        |comp AS (SELECT id AS rec_id, min(r) AS entity_id
        |         FROM reach GROUP BY id),
        |sz AS (SELECT entity_id, count(*) AS n_records
        |       FROM comp GROUP BY entity_id)
        |SELECT comp.rec_id, comp.entity_id, sz.n_records
        |FROM comp JOIN sz ON sz.entity_id = comp.entity_id""".stripMargin,


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


    // hash-free twin of SpanDedup: windows are the literal 8-token
    // STRINGS (tokens contain no whitespace, so ' '-join is injective),
    // keep-first via row_number over (doc_id, pos), coverage = union of
    // [pos, pos+8) per doc, trimmed text = kept tokens string_agg'd in
    // position order — a 64-bit window-hash collision on the Spark side
    // is the only possible divergence
    // q132: full hash-free recompute — fixture self-join plant,
    // stride-1 literal 8-token windows, first occurrence by
    // (doc_id, pos), gaps-and-islands merge (break when the sorted
    // position step exceeds k), exact span slice + md5
    "q132_exact_spans" ->
      raw"""WITH src AS (
        |  SELECT doc_id AS sid, coalesce(text, '') AS stext FROM documents),
        |fx AS (
        |  SELECT d.doc_id,
        |    CASE WHEN d.doc_id % 5 = 2 AND d.doc_id >= 200
        |      THEN coalesce(d.text, '') || ' filler' || CAST(d.doc_id % 7 AS VARCHAR) || ' ' ||
        |        array_to_string(
        |          (list_filter(string_split_regex(s.stext, '[ \t\n\x0b\f\r]+'),
        |                       x -> x != ''))[(d.doc_id % 11 + 1):(d.doc_id % 11 + 23)], ' ')
        |      ELSE coalesce(d.text, '') END AS ftext
        |  FROM documents d JOIN src s ON s.sid = (d.doc_id * 31 + 7) % 200),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(ftext), '[ \t\n\x0b\f\r]+'),
        |                x -> x != '') AS toks
        |  FROM fx),
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
        |isl AS (
        |  SELECT doc_id, pos - 1 AS p,
        |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |           OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
        |         THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |grp AS (
        |  SELECT doc_id, p,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS UNBOUNDED PRECEDING) AS g
        |  FROM isl),
        |spans AS (
        |  SELECT doc_id, min(p) AS span_start, max(p) + 8 AS span_end
        |  FROM grp GROUP BY doc_id, g)
        |SELECT s.doc_id,
        |  CAST(s.span_start AS BIGINT) AS span_start,
        |  CAST(s.span_end - s.span_start AS BIGINT) AS span_len,
        |  md5(array_to_string(t.toks[s.span_start + 1:s.span_end], ' ')) AS span_md5
        |FROM spans s JOIN t ON t.doc_id = s.doc_id""".stripMargin,


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


    // hash-free twin of decontaminate (q53's technique, asymmetric
    // form): eval windows are literal 8-token STRINGS from the eval
    // corpus (leaked every-97th docs + the two planted probes); a
    // corpus window hits iff its string equals any eval window;
    // coverage/trim identical to the q53 oracle
    // q160: the q151 hash-free window replay per benchmark, run
    // against BOTH snapshots (prev = raw documents, cur = planted),
    // with per-benchmark distinct-triple aggregations and the trend
    // delta — matched-window counts derive from DISTINCT
    // (bench, eval_id, w) sub-selects, doc counts from DISTINCT ids
    "q160_contamination_dashboard" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |cur AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 3 THEN text || ' $evalProbe1'
         |         WHEN doc_id % 7 = 5 THEN text || ' $evalProbe2'
         |         ELSE text END AS text
         |  FROM documents),
         |evals(bench, eval_id, text) AS (
         |  SELECT 'benchA', doc_id, text FROM documents WHERE doc_id % 97 = 0
         |  UNION ALL
         |  SELECT 'benchB', doc_id, text FROM documents WHERE doc_id % 89 = 0
         |  UNION ALL SELECT 'benchA', 900001, '$evalProbe1'
         |  UNION ALL SELECT 'benchB', 900002, '$evalProbe2'
         |  UNION ALL SELECT 'benchC', 900003, '$cleanProbe'),
         |et AS (
         |  SELECT bench, eval_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM evals),
         |ewl AS (
         |  SELECT bench, eval_id,
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
         |  FROM et),
         |ew AS (SELECT DISTINCT bench, eval_id, unnest(ws) AS w FROM ewl),
         |tot AS (SELECT bench, count(*) AS n_windows FROM ew GROUP BY bench),
         |ed AS (
         |  SELECT bench, count(DISTINCT eval_id) AS n_eval_docs
         |  FROM evals GROUP BY bench),
         |cct AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM cur),
         |ccw AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END) AS w
         |  FROM cct),
         |pct AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM base),
         |pcw AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END) AS w
         |  FROM pct),
         |mc AS (
         |  SELECT DISTINCT ew.bench, ew.eval_id, c.doc_id, ew.w
         |  FROM ew JOIN ccw c ON c.w = ew.w),
         |mp AS (
         |  SELECT DISTINCT ew.bench, ew.eval_id, p.doc_id, ew.w
         |  FROM ew JOIN pcw p ON p.w = ew.w),
         |mwc AS (
         |  SELECT bench, count(*) AS n_matched FROM (
         |    SELECT DISTINCT bench, eval_id, w FROM mc) GROUP BY bench),
         |dhc AS (
         |  SELECT bench, count(DISTINCT doc_id) AS n_docs_hit,
         |         count(DISTINCT eval_id) AS n_cont
         |  FROM mc GROUP BY bench),
         |mwp AS (
         |  SELECT bench, count(*) AS n_matched FROM (
         |    SELECT DISTINCT bench, eval_id, w FROM mp) GROUP BY bench),
         |dhp AS (
         |  SELECT bench, count(DISTINCT doc_id) AS n_docs_hit
         |  FROM mp GROUP BY bench)
         |SELECT ed.bench AS benchmark,
         |  CAST(ed.n_eval_docs AS BIGINT) AS n_eval_docs,
         |  CAST(coalesce(tot.n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(mwc.n_matched, 0) AS BIGINT) AS n_matched_windows,
         |  CAST(coalesce(dhc.n_docs_hit, 0) AS BIGINT) AS n_docs_hit,
         |  CAST(coalesce(dhc.n_cont, 0) AS BIGINT) AS n_contaminated_docs,
         |  CAST(CASE WHEN coalesce(tot.n_windows, 0) = 0 THEN 0
         |       ELSE coalesce(mwc.n_matched, 0) * 10000 // tot.n_windows
         |       END AS BIGINT) AS contamination_x10000,
         |  CAST(CASE WHEN ed.n_eval_docs = 0 THEN 0
         |       ELSE coalesce(dhc.n_cont, 0) * 10000 // ed.n_eval_docs
         |       END AS BIGINT) AS docs_x10000,
         |  CAST(CASE WHEN coalesce(tot.n_windows, 0) = 0 THEN 0
         |       ELSE coalesce(mwp.n_matched, 0) * 10000 // tot.n_windows
         |       END AS BIGINT) AS prev_x10000,
         |  CAST(coalesce(dhp.n_docs_hit, 0) AS BIGINT) AS prev_docs_hit,
         |  CAST((CASE WHEN coalesce(tot.n_windows, 0) = 0 THEN 0
         |        ELSE coalesce(mwc.n_matched, 0) * 10000 // tot.n_windows END) -
         |       (CASE WHEN coalesce(tot.n_windows, 0) = 0 THEN 0
         |        ELSE coalesce(mwp.n_matched, 0) * 10000 // tot.n_windows END)
         |       AS BIGINT) AS delta_x10000
         |FROM ed
         |LEFT JOIN tot ON tot.bench = ed.bench
         |LEFT JOIN mwc ON mwc.bench = ed.bench
         |LEFT JOIN dhc ON dhc.bench = ed.bench
         |LEFT JOIN mwp ON mwp.bench = ed.bench
         |LEFT JOIN dhp ON dhp.bench = ed.bench""".stripMargin,


    // q166: q160's cur-side replay without the doc-grain column (the
    // index stores windows, not doc ids) — an INDEXED probe must
    // produce exactly what a full scan of the same corpus would
    "q166_contamination_indexed" ->
      s"""WITH cur AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 3 THEN text || ' $evalProbe1'
         |         WHEN doc_id % 7 = 5 THEN text || ' $evalProbe2'
         |         ELSE text END AS text
         |  FROM documents),
         |evals(bench, eval_id, text) AS (
         |  SELECT 'benchA', doc_id, text FROM documents WHERE doc_id % 97 = 0
         |  UNION ALL
         |  SELECT 'benchB', doc_id, text FROM documents WHERE doc_id % 89 = 0
         |  UNION ALL SELECT 'benchA', 900001, '$evalProbe1'
         |  UNION ALL SELECT 'benchB', 900002, '$evalProbe2'
         |  UNION ALL SELECT 'benchC', 900003, '$cleanProbe'),
         |et AS (
         |  SELECT bench, eval_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM evals),
         |ewl AS (
         |  SELECT bench, eval_id,
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
         |  FROM et),
         |ew AS (SELECT DISTINCT bench, eval_id, unnest(ws) AS w FROM ewl),
         |tot AS (SELECT bench, count(*) AS n_windows FROM ew GROUP BY bench),
         |ed AS (
         |  SELECT bench, count(DISTINCT eval_id) AS n_eval_docs
         |  FROM evals GROUP BY bench),
         |cct AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM cur),
         |ccw AS (
         |  SELECT DISTINCT unnest(
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END) AS w
         |  FROM cct),
         |mc AS (
         |  SELECT DISTINCT ew.bench, ew.eval_id, ew.w
         |  FROM ew JOIN ccw c ON c.w = ew.w),
         |mwc AS (
         |  SELECT bench, count(*) AS n_matched FROM mc GROUP BY bench),
         |dhc AS (
         |  SELECT bench, count(DISTINCT eval_id) AS n_cont
         |  FROM mc GROUP BY bench)
         |SELECT ed.bench AS benchmark,
         |  CAST(ed.n_eval_docs AS BIGINT) AS n_eval_docs,
         |  CAST(coalesce(tot.n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(mwc.n_matched, 0) AS BIGINT) AS n_matched_windows,
         |  CAST(coalesce(dhc.n_cont, 0) AS BIGINT) AS n_contaminated_docs,
         |  CAST(CASE WHEN coalesce(tot.n_windows, 0) = 0 THEN 0
         |       ELSE coalesce(mwc.n_matched, 0) * 10000 // tot.n_windows
         |       END AS BIGINT) AS contamination_x10000,
         |  CAST(CASE WHEN ed.n_eval_docs = 0 THEN 0
         |       ELSE coalesce(dhc.n_cont, 0) * 10000 // ed.n_eval_docs
         |       END AS BIGINT) AS docs_x10000
         |FROM ed
         |LEFT JOIN tot ON tot.bench = ed.bench
         |LEFT JOIN mwc ON mwc.bench = ed.bench
         |LEFT JOIN dhc ON dhc.bench = ed.bench""".stripMargin,


    // q151: q61's literal-window CTEs with eval ids carried through —
    // distinct eval windows, corpus windows, the matched triple set,
    // per-eval distinct counts, and the x10000 integral fraction
    "q151_contamination_report" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 3 THEN text || ' $evalProbe1'
         |         WHEN doc_id % 7 = 5 THEN text || ' $evalProbe2'
         |         ELSE text END AS text
         |  FROM documents),
         |evals(eval_id, text) AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
         |  UNION ALL SELECT 900001, '$evalProbe1'
         |  UNION ALL SELECT 900002, '$evalProbe2'),
         |et AS (
         |  SELECT eval_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM evals),
         |ewl AS (
         |  SELECT eval_id,
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
         |  FROM et),
         |ew AS (SELECT DISTINCT eval_id, unnest(ws) AS w FROM ewl),
         |tot AS (SELECT eval_id, count(*) AS n_windows FROM ew GROUP BY eval_id),
         |ct AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |                x -> x != '') AS toks
         |  FROM docs),
         |cwl AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks) - 6),
         |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
         |  FROM ct),
         |cwin AS (SELECT doc_id, unnest(ws) AS w FROM cwl),
         |m AS (
         |  SELECT DISTINCT ew.eval_id, cwin.doc_id, ew.w
         |  FROM ew JOIN cwin ON cwin.w = ew.w),
         |agg AS (
         |  SELECT eval_id, count(DISTINCT w) AS n_matched_windows,
         |         count(DISTINCT doc_id) AS n_docs_hit
         |  FROM m GROUP BY eval_id)
         |SELECT e.eval_id,
         |  CAST(coalesce(t.n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(a.n_matched_windows, 0) AS BIGINT) AS n_matched_windows,
         |  CAST(coalesce(a.n_docs_hit, 0) AS BIGINT) AS n_docs_hit,
         |  CAST(CASE WHEN coalesce(t.n_windows, 0) = 0 THEN 0
         |       ELSE (coalesce(a.n_matched_windows, 0) * 10000)
         |            // t.n_windows END AS BIGINT) AS contamination_x10000
         |FROM (SELECT DISTINCT eval_id FROM evals) e
         |LEFT JOIN tot t ON t.eval_id = e.eval_id
         |LEFT JOIN agg a ON a.eval_id = e.eval_id""".stripMargin,


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


    // q138: full recompute — the paragraph fixture, position-indexed
    // split segments, keep-first via min(doc_id*1e6+i) per trimmed
    // paragraph (the engine's min(struct) aggregate is the
    // hot-key-safe twin), and q81's list_sort/list_filter/
    // list_transform reassembly over the original split array.
    // Deliberately NO `string_agg(... ORDER BY ...) FILTER (...)`:
    // that construct hash-mismatched in the round-10 driver gate
    // (ordered-aggregate + FILTER is cross-version fragile in DuckDB)
    // while this shape is the q81-proven one.
    "q138_paragraph_dedup" ->
      """WITH fix AS (
        |  SELECT doc_id,
        |    'welcome to the graft sample corpus' ||
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      CASE WHEN doc_id % 7 = 0
        |           THEN chr(10)||chr(10)||'  subscribe to our newsletter today'
        |           ELSE chr(10)||chr(10)||'subscribe to our newsletter today' END
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10)||chr(10)||'  ' ELSE '' END ||
        |    chr(10)||chr(10) || coalesce(text, '') ||
        |    chr(10)||chr(10) || 'permalink doc-' || CAST(doc_id AS VARCHAR) ||
        |    chr(10)||chr(10) || 'shared footer all rights reserved' AS text
        |  FROM documents),
        |p AS (
        |  SELECT f.doc_id, g.i AS i, f.ps[g.i] AS para, trim(f.ps[g.i]) AS t
        |  FROM (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps
        |        FROM fix) f,
        |       unnest(generate_series(1, len(f.ps))) AS g(i)),
        |w AS (
        |  SELECT t, min(doc_id * 1000000 + i) AS fk
        |  FROM p WHERE t <> '' GROUP BY t),
        |k AS (
        |  SELECT p.doc_id, p.i,
        |    (p.t = '' OR p.doc_id * 1000000 + p.i = w.fk) AS keep
        |  FROM p LEFT JOIN w ON p.t = w.t),
        |ki AS (
        |  SELECT doc_id,
        |    count(*) AS n_paras,
        |    sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_dropped,
        |    list_sort(list(CASE WHEN keep THEN i END)) AS kis
        |  FROM k GROUP BY doc_id),
        |per AS (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps
        |        FROM fix)
        |SELECT per.doc_id, ki.n_paras, CAST(ki.n_dropped AS BIGINT) AS n_dropped,
        |  coalesce(array_to_string(
        |    list_transform(
        |      list_filter(ki.kis, x -> x IS NOT NULL),
        |      x -> per.ps[x]),
        |    chr(10)||chr(10)), '') AS text_dedup
        |FROM per JOIN ki USING (doc_id)""".stripMargin,


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
        |FROM cand WHERE levenshtein(sa, sb) <= 1""".stripMargin
  )

  /** q160/q166 shared "current release" corpus — the q151 plant. */
  private def plantedContaminationDocs(
      s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 7 === 3, concat(col("text"), lit(" " + evalProbe1)))
        .when(col("doc_id") % 7 === 5, concat(col("text"), lit(" " + evalProbe2)))
        .otherwise(col("text")).as("text"))

  /** q160/q166 shared 3-benchmark eval fixture (A: 97th docs +
    * probe1; B: 89th docs + probe2; C: the clean negative control).
    */
  private def benchEvals(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    d.filter(col("doc_id") % 97 === 0)
      .select(lit("benchA").as("benchmark"),
        col("doc_id").as("eval_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 89 === 0)
        .select(lit("benchB").as("benchmark"),
          col("doc_id").as("eval_id"), col("text")))
      .unionByName(s.range(1).select(lit("benchA").as("benchmark"),
        lit(900001L).as("eval_id"), lit(evalProbe1).as("text")))
      .unionByName(s.range(1).select(lit("benchB").as("benchmark"),
        lit(900002L).as("eval_id"), lit(evalProbe2).as("text")))
      .unionByName(s.range(1).select(lit("benchC").as("benchmark"),
        lit(900003L).as("eval_id"), lit(cleanProbe).as("text")))
  }
}
