package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Text query registry — text analysis and normalization (lang-id, quality, tokens, tokenizers, LM signals, sentences, readability, dates).
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- beyond-reference: text analysis over documents --------------

    // adjacent-pair PMI collocations (Church & Hanks 1990; word2vec's
    // phrase pass) — bigrams from a zip-shift of each doc's own token
    // array (no self-join, no per-doc window), counts reduced with
    // map-side combine, the ln chain in ONE shared association, top-50
    // on the rounded value. Oracle recomputes counts and the identical
    // ln chain from raw text
    "q145_collocations" -> ((s, dir) =>
      graft.textops.Collocations.pmiTopK(
        table(s, dir, "documents"), "text", minCount = 5, k = 50)),


    // content-defined chunking (Rabin-style CDC, the LBFS/rsync
    // storage-dedup primitive): chunk boundaries where the 8-point
    // rolling polynomial hash mod 64 == 5, so boundaries follow
    // CONTENT — an early edit leaves later chunks and their hashes
    // identical (the spec pins shift-resilience). One codegen'd O(n)
    // pass; oracle replays every window hash from unicode(substr)
    // with embedded B-power constants, the cut set, and chunk md5s
    "q153_cdc_chunks" -> ((s, dir) =>
      graft.textops.CdcChunker.chunks(
        table(s, dir, "documents"), "doc_id", "text")),


    // per-source dataset "nutrition card" (round-11; the
    // datasheets-for-datasets release summary) — volume, q52 quality
    // pass rate, q45 PII incidence (regex families only), corpus-wide
    // exact-dup mass attributed per source WITHOUT a raw-doc
    // join-back (two reduced frames — the hot-key lesson), modal
    // language + share. One narrow scan, everything else reduced
    "q167_dataset_card" -> ((s, dir) =>
      graft.operators.DatasetCard.perSource(
        table(s, dir, "documents"), "source", "doc_id", "text", "lang")),


    // min/max-bounded CDC chunking (round-11; the restic/borg size
    // stabilization): q153's stateless cut set post-processed by the
    // sequential skip-then-cut rule — smallest content cut with
    // len in [16, 128] from the previous cut, else a forced cut at
    // prev+128 (or doc end) — so pathological byte patterns cannot
    // emit degenerate chunks. The oracle replays the walk with a
    // WITH RECURSIVE next-cut lookup over the same window hashes;
    // CdcChunkerSpec pins bounds + shift re-synchronization
    "q159_cdc_bounded" -> ((s, dir) =>
      graft.textops.CdcChunker.chunksBounded(
        table(s, dir, "documents"), "doc_id", "text")),


    // per-source chunk-level dedup ratio — the CDC family's
    // analytical report (what fraction of each source's bytes are
    // corpus-wide duplicate chunks — the restic "total dedup" number,
    // and the crawl-ops signal for mirror-heavy sources): q153's
    // chunks, corpus-wide occurrence counts per chunk_md5, duplicate
    // mass = code points in chunks whose hash occurs > once. One
    // chunking pass + two map-side-combined aggregations
    "q157_dedup_ratio" -> ((s, dir) => {
      val ch = graft.textops.CdcChunker.chunks(
        table(s, dir, "documents").select(col("doc_id"), col("text"),
          col("source")),
        "doc_id", "text")
        .join(table(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id")
      val occ = ch.groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("_dr_occ"))
      ch.join(occ, "chunk_md5")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("len")).as("n_cps"),
          sum(when(col("_dr_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
          sum(when(col("_dr_occ") > 1, col("len")).otherwise(0L)).as("dup_cps"))
        .withColumn("dup_x10000",
          expr("CAST(CASE WHEN n_cps = 0 THEN 0 " +
            "ELSE dup_cps * 10000 DIV n_cps END AS BIGINT)"))
    }),


    // TextRank keyword extraction (Mihalcea & Tarau 2004): the word
    // co-occurrence graph (adjacent-pair edges, symmetrized,
    // self-loops dropped) ranked by q94's integer fixed-point
    // PageRank — the q123 composition discipline on WORDS: md5-60-bit
    // ids drive the iteration, the oracle replays the recurrence on
    // the term STRINGS through 5 unrolled CTEs, fully static. Top-20
    // by (rank desc, term) over the #distinct-terms reduced frame
    "q148_textrank" -> ((s, dir) => {
      import graft.operators.{DistinctSketch, LinkGraph}
      // widen: tokenize + adjacent-pair explode is the narrow CPU mass
      // feeding the edge distinct (byte-guarded; see Widen)
      val toks = graft.operators.Widen.widen(table(s, dir, "documents"))
        .select(graft.textops.TextIndex.terms(col("text")).as("_ts"))
      val pairs = toks.select(explode(zip_with(
          col("_ts"),
          slice(col("_ts"), lit(2), greatest(size(col("_ts")) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("_p"))
        .filter(col("_p.b").isNotNull && col("_p.a") =!= col("_p.b"))
        .select(col("_p.a").as("wa"), col("_p.b").as("wb"))
      val und = pairs
        .union(pairs.select(col("wb").as("wa"), col("wa").as("wb")))
        .distinct()
      val nodes = und.select(col("wa").as("term")).distinct()
        .withColumn("tid", DistinctSketch.hash60(col("term")))
      val edges = und.select(
        DistinctSketch.hash60(col("wa")).as("src"),
        DistinctSketch.hash60(col("wb")).as("dst"))
      val ranks = LinkGraph.pageRank(nodes, "tid", edges, iters = 5)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("rank_fp").desc, col("term").asc)
      nodes.join(ranks, "tid")
        .select(col("term"), col("rank").as("rank_fp"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .filter(col("pos") <= 20)
    }),


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


    // composite C4/Gopher-style quality filter: keep verdict + ordered
    // fail reasons from the oracled round4 signals
    "q52_quality_filter" -> ((s, dir) => {
      val v = graft.textops.TextAnalysis.qualityVerdict(col("text"))
      // widen: the verdict is ~1 s of serialized CPU on the scan's
      // single partition at bench scale (byte-guarded; see Widen)
      graft.operators.Widen.widen(table(s, dir, "documents"))
        .select(col("doc_id"), v.as("_v"))
        .select(col("doc_id"), col("_v.n_tokens").as("n_tokens"),
          col("_v.fail_reasons").as("fail_reasons"), col("_v.keep").as("keep"))
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


    // tokenizer fertility per language (round-11; the tokenizer-eval
    // number: BPE tokens per whitespace word, x10000) — the q55 apply
    // path aggregated per lang against the q56 whitespace-token twin.
    // The oracle embeds per-doc counts from OracleGen's INDEPENDENT
    // reference BPE scorer (the q55/q64 discipline) and recomputes
    // the whitespace side + aggregation itself
    "q168_tokenizer_fertility" -> ((s, dir) => {
      val t = coalesce(col("text"), lit(""))
      table(s, dir, "documents").select(col("lang"),
        graft.textops.Bpe.bpe_token_count(s, t,
          graft.textops.Bpe.defaultMerges).cast("long").as("_bpe"),
        graft.textops.TextAnalysis.nTokens(t).cast("long").as("_ws"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("_bpe")).as("n_bpe_tokens"),
          sum(col("_ws")).as("n_ws_tokens"))
        .withColumn("fertility_x10000", expr(
          "CAST(n_bpe_tokens * 10000 DIV greatest(n_ws_tokens, 1) AS BIGINT)"))
    }),


    // code-document detection + The Stack/StarCoder file filters
    // (round-11): per-doc line stats (avg/max line length, alnum
    // fraction, indent/punct-terminated line fractions, keyword
    // lexicon hits, auto-generated header) and two verdicts — a
    // structural is_code heuristic and the published stack_pass file
    // rules (avg ≤ 100, max ≤ 1000, alnum ≥ 0.25, not generated).
    // Planted fixture: %6==0 an auto-generated C doc, %6==3 a clean
    // indented Python doc, %6==5 prose plus a 1200-char line. One
    // codegen'd narrow pass; all ratios integral
    "q169_code_filter" -> ((s, dir) =>
      graft.textops.CodeFilter.lineStats(
        codeFixture(s, dir), "doc_id", "ftext")),


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


    // hashed-feature linear quality classifier (fastText-style): train
    // deterministic logistic regression driver-side on the labeled
    // slice (doc_id%10<3), broadcast the weight table, score the whole
    // corpus in one codegen'd pass. Oracle: an independent scorer
    // (own FNV/tokenizer/arithmetic) sharing only the weight vector
    // embeds expected per-doc scores
    "q73_quality_classifier" -> ((s, dir) => {
      val planted = qualityLabeledDocs(s, dir)
      val wts = qualityModelFor(s, dir)
      planted.select(col("doc_id"), col("label"),
        graft.textops.QualityClassifier.quality_score(s, col("text"), wts).as("_qs"))
        .select(col("doc_id"), col("label"),
          round(col("_qs.score"), 4).as("score"), col("_qs.pred").as("pred"))
    }),


    // HTML structure extraction (round-10 verdict item 7): tables /
    // code blocks / lists as typed markdown rows beside q111's text
    // blocks — header-separator rule, whitespace-preserving code
    // fences, numbered/bulleted items, comment-decoy immunity. Fully
    // static oracle: the fixture and every extraction/serialization
    // rule recompute with DuckDB regex/list/string functions
    "q136_html_structure" -> ((s, dir) => {
      graft.textops.HtmlStructure.structures(
        htmlStructFixture(s, dir), Seq(col("doc_id")), col("html"))
    }),


    // trained multi-class language ID (round-10 verdict item 4):
    // QualityClassifier's hashed-feature trainer generalized to
    // softmax over 5 classes, char-2/3-gram features, trained on the
    // %7<5 slice of a deterministic five-language labeled fixture and
    // scored over ALL of it in one codegen'd broadcast pass (held-out
    // accuracy pinned in LangClassifierSpec's confusion matrix).
    // Oracle: q73's discipline — an independent scorer (own FNV, own
    // normalization, own softmax order) sharing only the trained
    // weight table embeds every expected (pred, score) row
    "q135_lang_classifier" -> ((s, dir) => {
      val planted = langLabeledDocs(s, dir)
      val model = langModelFor(s, dir)
      planted.select(col("doc_id"), col("label"),
        graft.textops.LangClassifier.lang_score(s, col("text"), model).as("_ls"))
        .select(col("doc_id"), col("label"),
          col("_ls.pred").as("pred"), round(col("_ls.score"), 4).as("score"))
        .withColumn("correct", col("pred") === col("label"))
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
      // widen: sentence split + chunk assembly is narrow CPU over the
      // 1-partition scan (see operators.Widen)
      val docs = graft.operators.Widen.widen(
        table(s, dir, "documents").select(col("doc_id"), raw.as("text")))
      graft.textops.Chunker.chunkBySentences(
        docs, col("text"), window = 12, keep = Seq(col("doc_id")))
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
      // widen: block segmentation + per-block stats over the rendered
      // page is ~1.4 s of serialized CPU on the 1-partition bench scan
      graft.textops.MainContent.blocks(
        graft.operators.Widen.widen(table(s, dir, "documents")),
        Seq(col("doc_id")), html)
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
      // widen: Viterbi segmentation is the heaviest per-row text
      // expression in the suite and runs on the scan's one partition
      // at bench scale (byte-guarded; see Widen)
      graft.operators.Widen.widen(table(s, dir, "documents"))
        .select(col("doc_id"),
        graft.textops.Unigram
          .unigram_segment(s, coalesce(col("text"), lit("")), model).as("ps"))
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_pieces"),
          md5(concat_ws("", col("ps"))).as("seg_md5"))
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

  val oracleSql: Map[String, String] = Map(

    // q153: every window hash re-evaluated as the explicit polynomial
    // (unicode code points × embedded B-power constants, mod 2^30 —
    // the engine's Horner form reduces to the same residue), the cut
    // rule, the per-doc final cut, and chunk md5s over substr spans
    "q153_cdc_chunks" -> {
      val pw = graft.textops.CdcChunker.powerConstants(8)
      val terms = (0 until 8)
        .map(j =>
          s"CAST(unicode(substr(s, i + ${j + 1}, 1)) AS BIGINT) * ${pw(j)}")
        .mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, coalesce(text, '') AS s,
         |    length(coalesce(text, '')) AS n
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, s, n, u.i
         |  FROM t, unnest(range(0, greatest(n - 7, 0))) AS u(i)),
         |h AS (
         |  SELECT doc_id, i + 8 AS cutp,
         |    ($terms) % ${graft.textops.CdcChunker.M} AS hv
         |  FROM p),
         |cuts AS (SELECT doc_id, cutp FROM h WHERE hv % 64 = 5),
         |ends AS (
         |  SELECT DISTINCT doc_id, cutp FROM (
         |    SELECT doc_id, cutp FROM cuts
         |    UNION ALL SELECT doc_id, n FROM t WHERE n > 0)),
         |ce AS (
         |  SELECT doc_id, cutp,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY cutp) - 1
         |      AS chunk_idx,
         |    lag(cutp, 1, 0) OVER (PARTITION BY doc_id ORDER BY cutp)
         |      AS startp
         |  FROM ends)
         |SELECT ce.doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(startp AS BIGINT) AS start,
         |  CAST(cutp - startp AS BIGINT) AS len,
         |  md5(substr(t.s, startp + 1, cutp - startp)) AS chunk_md5
         |FROM ce JOIN t ON t.doc_id = ce.doc_id""".stripMargin
    },


    // q167: every card column replayed — q56's token count, q52's
    // quality signals verbatim, q45's PII regex families, md5 dup
    // attribution, and the modal-lang window
    "q167_dataset_card" -> {
      val en = graft.textops.TextAnalysis.stopwords("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH sig AS (
         |  SELECT source, doc_id, lang, text,
         |    md5(coalesce(text, '')) AS h,
         |    CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(coalesce(text, '')),
         |                '[ \\t\\n\\x0b\\f\\r]+')) END AS n_tok,
         |    (len(regexp_extract_all(text, '${graft.textops.Pii.EmailRe}')) +
         |     len(regexp_extract_all(text, '${graft.textops.Pii.Ipv4Re}')) +
         |     len(regexp_extract_all(text, '${graft.textops.Pii.SsnRe}')) +
         |     len(regexp_extract_all(text, '${graft.textops.Pii.PhoneRe}'))) > 0
         |      AS pii
         |  FROM documents),
         |q AS (
         |  SELECT source, doc_id,
         |    CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
         |         ELSE string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') END AS toks,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS DOUBLE) / length(text)
         |         END AS praw
         |  FROM documents),
         |qs AS (
         |  SELECT source, doc_id, len(toks) AS n_tokens,
         |    floor(praw * 10000.0 + 0.5) / 10000.0 AS pr,
         |    floor((CASE WHEN len(toks) = 0 THEN 0.0
         |           ELSE CAST(len(list_filter(toks, t -> list_contains($en, t))) AS DOUBLE)
         |                / len(toks) END) * 10000.0 + 0.5) / 10000.0 AS sr,
         |    floor((CASE WHEN len(toks) = 0 THEN 0.0
         |           ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         |           END) * 10000.0 + 0.5) / 10000.0 AS rr
         |  FROM q),
         |keepf AS (
         |  SELECT source, doc_id,
         |    (n_tokens >= 10 AND n_tokens <= 100000 AND pr <= 0.3 AND
         |     sr >= 0.02 AND rr <= 0.6) AS keep
         |  FROM qs),
         |main AS (
         |  SELECT s.source, count(*) AS n_docs,
         |    sum(s.n_tok) AS n_tokens,
         |    sum(CASE WHEN k.keep THEN 1 ELSE 0 END) AS n_quality_keep,
         |    sum(CASE WHEN s.pii THEN 1 ELSE 0 END) AS n_pii_docs
         |  FROM sig s JOIN keepf k ON k.doc_id = s.doc_id
         |  GROUP BY s.source),
         |psm AS (SELECT source, h, count(*) AS n FROM sig GROUP BY source, h),
         |mt AS (SELECT h, sum(n) AS tot FROM psm GROUP BY h),
         |dups AS (
         |  SELECT p.source, sum(p.n) AS n_dup_docs
         |  FROM psm p JOIN mt ON mt.h = p.h WHERE mt.tot > 1
         |  GROUP BY p.source),
         |lc AS (SELECT source, lang, count(*) AS c FROM sig GROUP BY source, lang),
         |tl AS (
         |  SELECT source, lang AS top_lang, c AS top_n FROM (
         |    SELECT source, lang, c, row_number() OVER (PARTITION BY source
         |      ORDER BY c DESC, lang ASC) AS rn FROM lc) WHERE rn = 1)
         |SELECT m.source,
         |  CAST(m.n_docs AS BIGINT) AS n_docs,
         |  CAST(m.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(m.n_quality_keep AS BIGINT) AS n_quality_keep,
         |  CAST(m.n_quality_keep * 10000 // m.n_docs AS BIGINT) AS quality_x10000,
         |  CAST(m.n_pii_docs AS BIGINT) AS n_pii_docs,
         |  CAST(m.n_pii_docs * 10000 // m.n_docs AS BIGINT) AS pii_x10000,
         |  CAST(coalesce(d.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
         |  CAST(coalesce(d.n_dup_docs, 0) * 10000 // m.n_docs AS BIGINT) AS dup_x10000,
         |  tl.top_lang,
         |  CAST(tl.top_n * 10000 // m.n_docs AS BIGINT) AS top_lang_x10000
         |FROM main m
         |LEFT JOIN dups d ON d.source = m.source
         |LEFT JOIN tl ON tl.source = m.source""".stripMargin
    },


    // q159: q153's window-hash cuts + a per-position next-in-bounds
    // cut lookup (nx) + the sequential walk replayed as a recursive
    // CTE — the skip-then-cut rule's SQL twin. The ONLY recursion
    // state is (prev cut); everything else is the q153 replay
    "q159_cdc_bounded" -> {
      val pw = graft.textops.CdcChunker.powerConstants(8)
      val terms = (0 until 8)
        .map(j =>
          s"CAST(unicode(substr(s, i + ${j + 1}, 1)) AS BIGINT) * ${pw(j)}")
        .mkString(" + ")
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, coalesce(text, '') AS s,
         |    length(coalesce(text, '')) AS n
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, s, n, u.i
         |  FROM t, unnest(range(0, greatest(n - 7, 0))) AS u(i)),
         |h AS (
         |  SELECT doc_id, i + 8 AS cutp,
         |    ($terms) % ${graft.textops.CdcChunker.M} AS hv
         |  FROM p),
         |cuts AS (SELECT doc_id, cutp FROM h WHERE hv % 64 = 5),
         |pos AS (
         |  SELECT doc_id, u.p FROM t, unnest(range(0, n)) AS u(p)),
         |nx AS (
         |  SELECT pos.doc_id, pos.p, min(c.cutp) AS cnext
         |  FROM pos LEFT JOIN cuts c
         |    ON c.doc_id = pos.doc_id AND c.cutp - pos.p BETWEEN 16 AND 128
         |  GROUP BY pos.doc_id, pos.p),
         |walk(doc_id, idx, startp, cutp) AS (
         |  SELECT t.doc_id, 0, 0, coalesce(nx.cnext, least(128, t.n))
         |  FROM t JOIN nx ON nx.doc_id = t.doc_id AND nx.p = 0
         |  WHERE t.n > 0
         |  UNION ALL
         |  SELECT w.doc_id, w.idx + 1, w.cutp,
         |    coalesce(nx.cnext, least(w.cutp + 128, t.n))
         |  FROM walk w
         |  JOIN t ON t.doc_id = w.doc_id
         |  JOIN nx ON nx.doc_id = w.doc_id AND nx.p = w.cutp
         |  WHERE w.cutp < t.n)
         |SELECT w.doc_id, CAST(w.idx AS BIGINT) AS chunk_idx,
         |  CAST(w.startp AS BIGINT) AS start,
         |  CAST(w.cutp - w.startp AS BIGINT) AS len,
         |  md5(substr(t.s, w.startp + 1, w.cutp - w.startp)) AS chunk_md5
         |FROM walk w JOIN t USING (doc_id)""".stripMargin
    },


    // q157: q153's chunk CTEs + per-chunk corpus occurrence counts +
    // the per-source duplicate-mass aggregation and x10000 ratio
    "q157_dedup_ratio" -> {
      val pw = graft.textops.CdcChunker.powerConstants(8)
      val terms = (0 until 8)
        .map(j =>
          s"CAST(unicode(substr(s, i + ${j + 1}, 1)) AS BIGINT) * ${pw(j)}")
        .mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, source, coalesce(text, '') AS s,
         |    length(coalesce(text, '')) AS n
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, s, n, u.i
         |  FROM t, unnest(range(0, greatest(n - 7, 0))) AS u(i)),
         |h AS (
         |  SELECT doc_id, i + 8 AS cutp,
         |    ($terms) % ${graft.textops.CdcChunker.M} AS hv
         |  FROM p),
         |cuts AS (SELECT doc_id, cutp FROM h WHERE hv % 64 = 5),
         |ends AS (
         |  SELECT DISTINCT doc_id, cutp FROM (
         |    SELECT doc_id, cutp FROM cuts
         |    UNION ALL SELECT doc_id, n FROM t WHERE n > 0)),
         |ce AS (
         |  SELECT doc_id, cutp,
         |    lag(cutp, 1, 0) OVER (PARTITION BY doc_id ORDER BY cutp)
         |      AS startp
         |  FROM ends),
         |chunks AS (
         |  SELECT t.source, ce.cutp - ce.startp AS len,
         |    md5(substr(t.s, ce.startp + 1, ce.cutp - ce.startp)) AS cm
         |  FROM ce JOIN t USING (doc_id)),
         |occ AS (SELECT cm, count(*) AS o FROM chunks GROUP BY cm)
         |SELECT c.source, count(*) AS n_chunks,
         |  CAST(sum(c.len) AS BIGINT) AS n_cps,
         |  count(*) FILTER (WHERE o.o > 1) AS n_dup_chunks,
         |  CAST(coalesce(sum(c.len) FILTER (WHERE o.o > 1), 0) AS BIGINT)
         |    AS dup_cps,
         |  CAST(CASE WHEN sum(c.len) = 0 THEN 0
         |       ELSE coalesce(sum(c.len) FILTER (WHERE o.o > 1), 0) * 10000
         |            // sum(c.len) END AS BIGINT) AS dup_x10000
         |FROM chunks c JOIN occ o ON o.cm = c.cm
         |GROUP BY c.source""".stripMargin
    },


    // q148: the word graph derived in SQL from the same token twin,
    // q123's recurrence shape on term strings, 5 unrolled iterations,
    // and the (rank desc, term) top-20 window
    "q148_textrank" -> {
      val scale = graft.operators.LinkGraph.Scale
      val base = scale * 15 / 100
      val iters = (1 to 5).map { k =>
        s"""p$k AS (
           |  SELECT n.term AS id, $base + COALESCE(s.c, 0) AS r
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS id,
           |           CAST(SUM((p.r * 85) // (100 * g.deg)) AS BIGINT) AS c
           |    FROM p${k - 1} p JOIN e ON e.src = p.id JOIN g ON g.src = e.src
           |    GROUP BY e.dst) s ON s.id = n.term)""".stripMargin
      }.mkString(",\n")
      raw"""WITH toks AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |pr AS (
        |  SELECT ts[g.i] AS a, ts[g.i + 1] AS b
        |  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
        |  WHERE ts[g.i] != ts[g.i + 1]),
        |e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT a AS src, b AS dst FROM pr
        |    UNION ALL SELECT b, a FROM pr)),
        |n AS (SELECT DISTINCT src AS term FROM e),
        |g AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |p0 AS (SELECT term AS id, $scale AS r FROM n),
        |""".stripMargin + iters + """
        |, ranked AS (
        |  SELECT n.term, p.r AS rank_fp,
        |    row_number() OVER (ORDER BY p.r DESC, n.term ASC) AS pos
        |  FROM n JOIN p5 p ON p.id = n.term)
        |SELECT term, rank_fp, CAST(pos AS BIGINT) AS pos
        |FROM ranked WHERE pos <= 20""".stripMargin
    },


    // q145: token/bigram counts from the q77 token twin, the pmi ln
    // chain in the engine's exact left-to-right association, round 4,
    // and the same (pmi desc, a, b) top-50 window
    "q145_collocations" ->
      raw"""WITH toks AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |u AS (
        |  SELECT t.term, count(*) AS c
        |  FROM toks, unnest(ts) AS t(term) GROUP BY t.term),
        |nt AS (SELECT sum(c) AS n_tok FROM u),
        |bg AS (
        |  SELECT ts[g.i] AS term_a, ts[g.i + 1] AS term_b, count(*) AS c_ab
        |  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
        |  GROUP BY ts[g.i], ts[g.i + 1]),
        |nb AS (SELECT sum(c_ab) AS n_big FROM bg),
        |scored AS (
        |  SELECT b.term_a, b.term_b, b.c_ab, ua.c AS c_a, ub.c AS c_b,
        |    round(ln(CAST(b.c_ab AS DOUBLE)) - ln(CAST(nb.n_big AS DOUBLE)) -
        |          ln(CAST(ua.c AS DOUBLE)) - ln(CAST(ub.c AS DOUBLE)) +
        |          ln(CAST(nt.n_tok AS DOUBLE)) + ln(CAST(nt.n_tok AS DOUBLE)),
        |      4) AS pmi
        |  FROM bg b
        |  JOIN u ua ON ua.term = b.term_a
        |  JOIN u ub ON ub.term = b.term_b
        |  CROSS JOIN nt CROSS JOIN nb
        |  WHERE b.c_ab >= 5),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY pmi DESC, term_a ASC, term_b ASC) AS rank
        |  FROM scored)
        |SELECT term_a, term_b, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
        |  pmi, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 50""".stripMargin,

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


    // q136: full static recompute — the fixture, the script/style/
    // comment pre-clean, per-kind regex extraction, and every
    // markdown serialization rule (header separator, whitespace-
    // preserving fences, numbering) in DuckDB regex/list functions
    "q136_html_structure" -> {
      val collapse = (c: String) =>
        s"trim(regexp_replace(regexp_replace($c, '(?s)<[^>]*>', ' ', 'g'), " +
          s"'[ \\t\\n\\r]+', ' ', 'g'))"
      raw"""WITH fx AS (
        |  SELECT doc_id,
        |    '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
        |    || '<!-- <table><tr><td>decoy</td></tr></table> -->'
        |    || CASE WHEN doc_id % 2 = 0 THEN
        |         '<table><tr><th>name</th><th>count <b>total</b></th></tr><tr><td>alpha '
        |         || CAST(doc_id AS VARCHAR) || '</td><td>' || CAST(doc_id % 7 AS VARCHAR)
        |         || '</td></tr><tr><td>beta</td><td>' || CAST(doc_id % 3 AS VARCHAR)
        |         || '</td></tr></table>'
        |       ELSE '' END
        |    || '<p>' || coalesce(text, '') || '</p>'
        |    || CASE WHEN doc_id % 3 = 0 THEN
        |         '<pre><code>def f(x):' || chr(10) || '    return x + '
        |         || CAST(doc_id % 9 AS VARCHAR) || chr(10) || '</code></pre>'
        |       ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN
        |         '<ul><li>item one of ' || CAST(doc_id AS VARCHAR)
        |         || '</li><li>second <i>item</i></li><li>third</li></ul>'
        |       ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN
        |         '<ol><li>first step</li><li>step ' || CAST(doc_id % 5 AS VARCHAR)
        |         || '</li></ol>'
        |       ELSE '' END AS html
        |  FROM documents),
        |cl AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g') AS html
        |  FROM fx),
        |tbx AS (
        |  SELECT doc_id, i AS struct_idx, ts[i + 1] AS t
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(html, '(?is)<table[^>]*>(.*?)</table>', 1) AS ts
        |        FROM cl),
        |       unnest(range(len(ts))) AS u(i)),
        |tbm AS (
        |  SELECT doc_id, struct_idx,
        |    regexp_extract_all(t, '(?is)<tr[^>]*>(.*?)</tr>', 1) AS rows_
        |  FROM tbx),
        |tbr AS (
        |  SELECT doc_id, struct_idx, rows_,
        |    list_transform(rows_, r -> '| ' || array_to_string(
        |      list_transform(regexp_extract_all(r, '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1),
        |        c -> ${collapse("c")}), ' | ') || ' |') AS mdrows,
        |    '|' || array_to_string(list_transform(
        |      regexp_extract_all(rows_[1], '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1),
        |      c -> '---'), '|') || '|' AS sep,
        |    regexp_matches(rows_[1], '(?is)<th') AS has_header
        |  FROM tbm),
        |tb AS (
        |  SELECT doc_id, 'table' AS kind, struct_idx,
        |    CASE WHEN len(rows_) = 0 THEN ''
        |         WHEN has_header THEN mdrows[1] || chr(10) || sep ||
        |           CASE WHEN len(mdrows) > 1
        |             THEN chr(10) || array_to_string(mdrows[2:len(mdrows)], chr(10))
        |             ELSE '' END
        |         ELSE array_to_string(mdrows, chr(10)) END AS markdown
        |  FROM tbr),
        |cdx AS (
        |  SELECT doc_id, i AS struct_idx, cs[i + 1] AS c
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(html, '(?is)<pre[^>]*>(.*?)</pre>', 1) AS cs
        |        FROM cl),
        |       unnest(range(len(cs))) AS u(i)),
        |cd AS (
        |  SELECT doc_id, 'code' AS kind, struct_idx,
        |    chr(96) || chr(96) || chr(96) || chr(10) ||
        |    regexp_replace(regexp_replace(
        |      regexp_replace(c, '(?s)<[^>]*>', '', 'g'),
        |      '^[ \t\n\r]+', ''), '[ \t\n\r]+$$', '')
        |    || chr(10) || chr(96) || chr(96) || chr(96) AS markdown
        |  FROM cdx),
        |ulx AS (
        |  SELECT doc_id, i AS struct_idx, ls[i + 1] AS l
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(html, '(?is)<ul[^>]*>(.*?)</ul>', 1) AS ls
        |        FROM cl),
        |       unnest(range(len(ls))) AS u(i)),
        |ul AS (
        |  SELECT doc_id, 'ul' AS kind, struct_idx,
        |    array_to_string(list_transform(
        |      regexp_extract_all(l, '(?is)<li[^>]*>(.*?)</li>', 1),
        |      it -> '- ' || ${collapse("it")}), chr(10)) AS markdown
        |  FROM ulx),
        |olx AS (
        |  SELECT doc_id, i AS struct_idx, ls[i + 1] AS l
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(html, '(?is)<ol[^>]*>(.*?)</ol>', 1) AS ls
        |        FROM cl),
        |       unnest(range(len(ls))) AS u(i)),
        |ol AS (
        |  SELECT doc_id, 'ol' AS kind, struct_idx,
        |    array_to_string(list_transform(
        |      list_zip(regexp_extract_all(l, '(?is)<li[^>]*>(.*?)</li>', 1),
        |               range(1, len(regexp_extract_all(l, '(?is)<li[^>]*>(.*?)</li>', 1)) + 1)),
        |      p -> CAST(p[2] AS VARCHAR) || '. ' || ${collapse("p[1]")}), chr(10)) AS markdown
        |  FROM olx)
        |SELECT doc_id, kind, CAST(struct_idx AS BIGINT) AS struct_idx, markdown FROM tb
        |UNION ALL SELECT doc_id, kind, CAST(struct_idx AS BIGINT), markdown FROM cd
        |UNION ALL SELECT doc_id, kind, CAST(struct_idx AS BIGINT), markdown FROM ul
        |UNION ALL SELECT doc_id, kind, CAST(struct_idx AS BIGINT), markdown FROM ol""".stripMargin
    },


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
    // q169: the two code docs are the SHARED constants (newlines as a
    // <NL> placeholder resolved via replace(..., chr(10))); lexicon
    // and autogen markers embed from CodeFilter's own lists; every
    // ratio is integral `//` on the same counts
    "q169_code_filter" -> {
      val cNl = graft.SparkEntry.cCodeDoc.replace("\n", "<NL>")
      val pyNl = graft.SparkEntry.pyCodeDoc.replace("\n", "<NL>")
      val kwSum = graft.textops.CodeFilter.kwLexicon
        .map(k => s"(CASE WHEN contains(t, '$k') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val agOr = graft.textops.CodeFilter.autogenMarkers
        .map(m => s"contains(lower(substr(t, 1, 200)), '$m')")
        .mkString(" OR ")
      s"""WITH fx AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 6 = 0 THEN replace('$cNl', '<NL>', chr(10))
         |         WHEN doc_id % 6 = 3 THEN replace('$pyNl', '<NL>', chr(10))
         |         WHEN doc_id % 6 = 5 THEN coalesce(text, '') || chr(10) ||
         |              repeat('z', 1200)
         |         ELSE coalesce(text, '') END AS t
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM fx),
         |c AS (
         |  SELECT doc_id, t,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    CAST(list_max(list_transform(lines, x -> length(x)))
         |      AS BIGINT) AS max_line_len,
         |    CAST(length(t) - (len(lines) - 1) AS BIGINT) AS body_chars,
         |    CAST(length(t) AS BIGINT) AS n_chars,
         |    CAST(length(regexp_replace(t, '[^A-Za-z0-9]', '', 'g'))
         |      AS BIGINT) AS alnum_chars,
         |    CAST(len(list_filter(lines,
         |      x -> substr(x, 1, 1) IN (' ', chr(9)))) AS BIGINT) AS n_indent,
         |    CAST(len(list_filter(lines, x ->
         |      ends_with(rtrim(x), ';') OR ends_with(rtrim(x), '{') OR
         |      ends_with(rtrim(x), '}'))) AS BIGINT) AS n_punct,
         |    CAST($kwSum AS BIGINT) AS kw_hits,
         |    ($agOr) AS autogen
         |  FROM m),
         |r AS (
         |  SELECT doc_id, n_lines, max_line_len,
         |    100 * body_chars // n_lines AS avg_len_x100,
         |    CASE WHEN n_chars = 0 THEN 0
         |         ELSE 10000 * alnum_chars // n_chars END AS alnum_x10000,
         |    10000 * n_indent // n_lines AS indent_x10000,
         |    10000 * n_punct // n_lines AS punctl_x10000,
         |    kw_hits, autogen
         |  FROM c)
         |SELECT doc_id, n_lines, max_line_len, avg_len_x100, alnum_x10000,
         |  indent_x10000, punctl_x10000, kw_hits, autogen,
         |  ((punctl_x10000 >= 2500 OR indent_x10000 >= 4000)
         |    AND kw_hits >= 2) AS is_code,
         |  (avg_len_x100 <= 10000 AND max_line_len <= 1000
         |    AND alnum_x10000 >= 2500 AND NOT autogen) AS stack_pass
         |FROM r""".stripMargin
    },


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
}
