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
  * 100 TB shape — MEASURED, not asserted (ScaleBench phase 1k): the
  * first-occurrence table is an aggregate over 64-bit paragraph
  * hashes, `min(struct(id, idx)) + count` per hash, which map-side
  * combines (a hot paragraph reduces inside each task). The naive
  * ways to apply it back both serialize the hot key: a row_number
  * window colocates every occurrence in one partition, and — the
  * round-10 duel's finding — so does an innocent-looking equi-join
  * back on the paragraph key (AQE's skew split never triggered below
  * its 256 MB partition threshold; the 2M-occurrence hot key cost
  * 16.5 s of single-task sort vs the window's 7.6 s). The shipped
  * form is therefore two-tier: paragraphs whose count ≥ `hotThreshold`
  * — boundedly few, ≤ N/hotThreshold — apply via a BROADCAST join
  * (no shuffle, no colocation, the hot row streams map-side), and the
  * cold remainder shuffle-joins a first-table where every key holds
  * < hotThreshold occurrences by construction, so no task can exceed
  * hotThreshold rows per key. Matching in the apply phase is 64-bit
  * xxhash64 equality (the [[LineDedup]]/[[SpanDedup]]
  * vanishing-collision argument); the hot tier is bounded by
  * `maxHotParagraphs` BEFORE broadcast and fails loudly past it.
  */
object ParagraphDedup {

  /** Keep-first paragraph dedup; see object scaladoc for semantics and
    * the measured two-tier shape. Null text folds to `''` (one empty
    * segment, nothing dropped) — the [[SpanDedup.decontaminate]]
    * null-fold rule.
    */
  def dedupParagraphs(
      df: DataFrame, idCol: String, textCol: String,
      hotThreshold: Long = 100000, maxHotParagraphs: Int = 2000000): DataFrame = {
    require(hotThreshold >= 2,
      s"dedupParagraphs: hotThreshold must be >= 2 (got $hotThreshold)")
    require(maxHotParagraphs > 0,
      s"dedupParagraphs: maxHotParagraphs must be positive (got $maxHotParagraphs)")
    val paras = df
      .select(col(idCol).as("_pp_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n\n", -1))
          .as(Seq("_pp_i", "_pp_raw")))
      .withColumn("_pp_t", trim(col("_pp_raw")))
      .withColumn("_pp_h", xxhash64(col("_pp_t")))

    // first occurrence + occurrence count per 64-bit paragraph hash —
    // ONE aggregate with map-side partial combine; the paragraph text
    // never enters this frame
    val stats = paras
      .filter(col("_pp_t") =!= "")
      .groupBy(col("_pp_h"))
      .agg(min(struct(col("_pp_id").as("_f_id"), col("_pp_i").as("_f_i")))
        .as("_pp_first"), count(lit(1)).as("_pp_c"))

    // hot tier: bounded collect-count guard, then a broadcast join —
    // the hot key's occurrences never colocate
    val hotF = stats.filter(col("_pp_c") >= hotThreshold)
      .select(col("_pp_h"), col("_pp_first").as("_pp_hf"))
    val limitN = math.min(maxHotParagraphs.toLong + 1L, Int.MaxValue.toLong).toInt
    val nHot = hotF.limit(limitN).count()
    require(nHot <= maxHotParagraphs,
      s"dedupParagraphs: more than $maxHotParagraphs distinct paragraphs have " +
        s">= $hotThreshold occurrences — raise hotThreshold or maxHotParagraphs " +
        "deliberately (the hot tier is broadcast)")
    val coldF = stats.filter(col("_pp_c") < hotThreshold)
      .select(col("_pp_h"), col("_pp_first").as("_pp_cf"))

    val withHot = paras.join(broadcast(hotF), Seq("_pp_h"), "left")
    val hotSide = withHot.filter(col("_pp_hf").isNotNull)
      .withColumn("_pp_first", col("_pp_hf"))
    // cold-side join keys all hold < hotThreshold occurrences — no
    // task exceeds that bound per key
    val coldSide = withHot.filter(col("_pp_hf").isNull)
      .join(coldF, Seq("_pp_h"), "left")
      .withColumn("_pp_first", col("_pp_cf"))
      .drop("_pp_cf")

    hotSide.unionByName(coldSide, allowMissingColumns = true)
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
