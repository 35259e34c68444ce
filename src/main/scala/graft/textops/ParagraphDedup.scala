package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document paragraph deduplication, keep-first — the exact-dedup
  * granularity between [[graft.operators.Dedup]] (whole documents) and
  * [[SpanDedup]] (token windows): Lee et al. 2022 (Deduplicating
  * Training Data Makes Language Models Better) and RefinedWeb (Penedo
  * et al. 2023 §3.3) both remove VERBATIM repeated paragraphs while
  * keeping one canonical occurrence. This is the complement of
  * [[LineDedup.removeBoilerplate]]'s all-occurrences rule: template
  * text must vanish everywhere, but genuinely duplicated CONTENT (a
  * quoted license block, a syndicated article paragraph) should
  * survive exactly once — at its first occurrence in corpus order.
  *
  * Semantics (the engine and the DuckDB oracle implement exactly this):
  *   - a paragraph is a `\n\n`-separated segment of `textCol` (split
  *     keeps empty segments, so `\n\n\n\n` produces an empty paragraph
  *     between the two separators);
  *   - matching is on the SPACE-trimmed form (ASCII 0x20 — the
  *     [[LineDedup]] trim rule); the emitted text keeps the original
  *     untrimmed paragraph;
  *   - paragraphs whose trimmed form is empty are structure, never
  *     counted and never dropped;
  *   - corpus order is `(idCol, paragraph index)` lexicographic: the
  *     occurrence with the smallest (id, idx) survives, every later
  *     occurrence is dropped;
  *   - output: (idCol, n_paras, n_dropped, text_dedup) with `n_paras`
  *     the total split-segment count (empties included), `n_dropped`
  *     the removed-paragraph count, `text_dedup` the survivors
  *     re-joined with `\n\n`.
  *
  * 100 TB shape: the first-occurrence rule is deliberately an
  * AGGREGATE, not a window — `min(struct(id, idx))` per trimmed
  * paragraph has map-side partial aggregation, so a pathologically hot
  * paragraph (a nav bar repeated in 10^8 documents) reduces inside
  * each task instead of funneling every occurrence into one window
  * partition (the q17-chunked-sessionize lesson). The keep flag comes
  * back via an equi-join on the paragraph key (AQE broadcasts the
  * firsts frame when it measures small, and its skew-join handles a
  * hot key otherwise), and documents reassemble with one groupBy over
  * the id. Paragraph payloads shuffle exactly twice (the join and the
  * regroup) — both unavoidable: the survivors' text must reach its
  * document's output row.
  */
object ParagraphDedup {

  /** Keep-first paragraph dedup; see object scaladoc for semantics.
    * Null text folds to `''` (one empty segment, nothing dropped) —
    * the [[SpanDedup.decontaminate]] null-fold rule.
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val paras = df
      .select(col(idCol).as("_pp_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n\n", -1))
          .as(Seq("_pp_i", "_pp_raw")))
      .withColumn("_pp_t", trim(col("_pp_raw")))

    // first occurrence per distinct trimmed non-blank paragraph — an
    // aggregate (map-side combinable), not a window (hot-key safe)
    val firsts = paras
      .filter(col("_pp_t") =!= "")
      .groupBy(col("_pp_t"))
      .agg(min(struct(col("_pp_id").as("_f_id"), col("_pp_i").as("_f_i")))
        .as("_pp_first"))

    paras
      .join(firsts, Seq("_pp_t"), "left")
      .withColumn("_pp_keep",
        col("_pp_t") === "" ||
          (col("_pp_first._f_id") === col("_pp_id") &&
            col("_pp_first._f_i") === col("_pp_i")))
      .groupBy(col("_pp_id"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("_pp_keep"), 0L).otherwise(1L)).as("n_dropped"),
        concat_ws("\n\n",
          transform(
            filter(
              array_sort(collect_list(struct(
                col("_pp_i"), col("_pp_keep").as("_pp_k"), col("_pp_raw")))),
              x => x.getField("_pp_k")),
            x => x.getField("_pp_raw"))).as("text_dedup"))
      .select(col("_pp_id").as(idCol),
        col("n_paras"), col("n_dropped"), col("text_dedup"))
  }
}
