package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Search query registry — retrieval ops (BM25, phrase/dictionary automata, TF-IDF top-k, content filter).
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object SearchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // positional phrase search: docs containing the exact consecutive
    // token trigram, with occurrence counts; the oracle slides a
    // list_slice window over the same token twin
    "q96_phrase_search" -> ((s, dir) => {
      graft.textops.TextIndex.phraseSearch(
          table(s, dir, "documents"), "doc_id", "text",
          Seq("slow", "hash", "batch"))
        .select(col("id").as("doc_id"), col("n_occ"))
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


    // reciprocal-rank fusion — the BM25+vector hybrid-retrieval
    // combiner (Cormack et al. 2009; the Elasticsearch/OpenSearch
    // default, k=60): lexical top-20 for a 2-term query fused with
    // the dense top-20 around query vector 0 (vec_id IS doc_id in the
    // testdata star schema) by integer 1000000 DIV (60+rank) — only
    // RANKS cross the retriever boundary, no score calibration. The
    // oracle recomputes both rankings (q77's BM25 arithmetic, q27's
    // cosine) and the same integral fusion
    "q141_rrf_fusion" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val lex = graft.textops.TextIndex.bm25TopK(docs, "doc_id", "text",
        query = Seq("table", "window"), k = 20)
        .select(col("id"), col("rank").cast("long").as("rank"))
      val emb = table(s, dir, "embeddings")
      val dense = graft.vector.Ann.cosineTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("id"), col("rank").cast("long").as("rank"))
      graft.textops.HybridSearch
        .rrfFuse(Seq("bm25" -> lex, "cosine" -> dense), k = 10)
        .select(col("id").as("doc_id"), col("n_lists"),
          col("rrf_x1m"), col("rank"))
    }),


    // hashing-trick TF-IDF cosine top-k — the embedding-free
    // similarity path (q27's shape with vectors the engine BUILDS
    // instead of reads): md5 bucket hashing, smooth idf, dense
    // array-order arithmetic, stop-bucket-capped candidate join.
    // Static oracle recomputes everything from the tokens up
    "q118_tfidf_topk" -> ((s, dir) =>
      graft.textops.TfIdf.cosineTopK(
        table(s, dir, "documents"), "doc_id", "text",
        probePred = col("doc_id") < 16, k = 5))
  )

  val oracleSql: Map[String, String] = Map(

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


    // q141: both rankings recomputed from scratch — q77's BM25 CTEs
    // (rank on the ROUNDED score, doc_id tiebreak) at k=20, q27's raw
    // cosine ranking around vec 0 at k=20, then the same integer
    // fusion and final (rrf desc, id) window
    "q141_rrf_fusion" ->
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
        |  SELECT doc_id, round(sum(c), 4) AS score FROM scored GROUP BY doc_id),
        |lex AS (
        |  SELECT doc_id AS id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM agg),
        |cv AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn
        |  FROM embeddings),
        |qv AS (SELECT * FROM cv WHERE vec_id = 0),
        |dsc AS (
        |  SELECT cv.vec_id AS id,
        |    list_dot_product(cv.v, qv.v) / (cv.nn * qv.nn) AS cos_raw
        |  FROM cv CROSS JOIN qv WHERE cv.vec_id != qv.vec_id),
        |dense AS (
        |  SELECT id, row_number() OVER (ORDER BY cos_raw DESC, id ASC) AS rank
        |  FROM dsc),
        |u AS (
        |  SELECT id, 1000000 // (60 + rank) AS s FROM lex WHERE rank <= 20
        |  UNION ALL
        |  SELECT id, 1000000 // (60 + rank) AS s FROM dense WHERE rank <= 20),
        |f AS (
        |  SELECT id, count(*) AS n_lists, sum(s) AS rrf_x1m
        |  FROM u GROUP BY id),
        |r AS (
        |  SELECT id, n_lists, rrf_x1m,
        |    row_number() OVER (ORDER BY rrf_x1m DESC, id ASC) AS rank
        |  FROM f)
        |SELECT id AS doc_id, CAST(n_lists AS BIGINT) AS n_lists,
        |  CAST(rrf_x1m AS BIGINT) AS rrf_x1m, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin,


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
        |FROM ranked WHERE rank <= 5""".stripMargin
  )
}
