package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.textops.{Pii, TextAnalysis}

/** Per-source dataset "nutrition card" — the one-page release summary
  * a curation team publishes with a corpus (datasheets/data-cards in
  * the Gebru et al. tradition), composed from this engine's own
  * signals: volume (docs, whitespace tokens), quality-gate pass rate
  * (the q52 verdict), PII incidence (the q45 pattern families —
  * email/IPv4/SSN/phone, regex-only so the oracle replays them
  * verbatim), corpus-wide exact-duplicate mass attributed per source
  * (the q7 md5 rule), and the modal language with its share.
  *
  * 100 TB shape: ONE narrow scan computes every per-doc signal; all
  * aggregations reduce map-side to per-source (or per-(source, key))
  * frames. The duplicate attribution deliberately avoids the raw-doc
  * join-back (the round-10 hot-key lesson): per-md5 totals join
  * per-(source, md5) counts — BOTH already reduced, so a boilerplate
  * text shared by 10^6 docs meets the join as one row per source,
  * never 10^6 colocated rows. The modal-language window runs over
  * the reduced (source, lang) counts.
  */
object DatasetCard {

  /** (source, n_docs, n_tokens, n_quality_keep, quality_x10000,
    * n_pii_docs, pii_x10000, n_dup_docs, dup_x10000, top_lang,
    * top_lang_x10000).
    */
  def perSource(
      df: DataFrame, sourceCol: String, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    // widen: verdict + PII regex battery + tokenize per row is the
    // card's CPU mass and runs on the scan's partitioning — one task
    // at bench scale (byte-guarded identity at corpus scale)
    val base = graft.operators.Widen.widen(df).select(
      col(sourceCol).as("source"), col(idCol).as("_dc_id"),
      col(langCol).as("_dc_lang"),
      TextAnalysis.nTokens(t).cast("long").as("_dc_tok"),
      TextAnalysis.qualityVerdict(t).getField("keep").as("_dc_keep"),
      ((Pii.countEmails(t) + Pii.countIpv4(t) + Pii.countSsn(t) +
        Pii.countPhones(t)) > 0).as("_dc_pii"),
      md5(t).as("_dc_md5"))

    val main = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_dc_tok")).as("n_tokens"),
      sum(when(col("_dc_keep"), 1L).otherwise(0L)).as("n_quality_keep"),
      sum(when(col("_dc_pii"), 1L).otherwise(0L)).as("n_pii_docs"))

    // duplicate attribution over two REDUCED frames (see scaladoc)
    val perSrcMd5 = base.groupBy(col("source"), col("_dc_md5"))
      .agg(count(lit(1)).as("_dc_n"))
    val md5Tot = perSrcMd5.groupBy(col("_dc_md5"))
      .agg(sum(col("_dc_n")).as("_dc_tot"))
    val dups = perSrcMd5.join(md5Tot, Seq("_dc_md5"))
      .filter(col("_dc_tot") > 1)
      .groupBy(col("source"))
      .agg(sum(col("_dc_n")).as("n_dup_docs"))

    val langCounts = base.groupBy(col("source"), col("_dc_lang"))
      .agg(count(lit(1)).as("_dc_lc"))
    val wl = Window.partitionBy(col("source"))
      .orderBy(col("_dc_lc").desc, col("_dc_lang").asc)
    val topLang = langCounts.withColumn("_dc_rn", row_number().over(wl))
      .filter(col("_dc_rn") === 1)
      .select(col("source"), col("_dc_lang").as("top_lang"),
        col("_dc_lc").as("_dc_top_n"))

    main
      .join(dups, Seq("source"), "left")
      .join(topLang, Seq("source"), "left")
      .withColumn("n_dup_docs", coalesce(col("n_dup_docs"), lit(0L)))
      .withColumn("quality_x10000",
        expr("CAST(n_quality_keep * 10000 DIV n_docs AS BIGINT)"))
      .withColumn("pii_x10000",
        expr("CAST(n_pii_docs * 10000 DIV n_docs AS BIGINT)"))
      .withColumn("dup_x10000",
        expr("CAST(n_dup_docs * 10000 DIV n_docs AS BIGINT)"))
      .withColumn("top_lang_x10000",
        expr("CAST(_dc_top_n * 10000 DIV n_docs AS BIGINT)"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_quality_keep"), col("quality_x10000"),
        col("n_pii_docs"), col("pii_x10000"),
        col("n_dup_docs"), col("dup_x10000"),
        col("top_lang"), col("top_lang_x10000"))
  }
}
