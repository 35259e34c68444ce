package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** The curation-pipeline flagship (q65) behind a persistent
  * [[StageLedger]] — the second flagship to adopt the resumable
  * discipline (the round-11 candidate list's "resumable-ledger
  * adoption for q65"; [[CrawlResume]] is q131's). Stage bodies are
  * q65's verbatim (same operators, same constants;
  * CurationResumeSpec pins final-frame equality against the registry
  * query), but every boundary persists parquet-then-_COMMIT: a crash
  * between any two stages resumes by recomputing ONLY the
  * uncommitted tail.
  *
  * The persisted stage grain deliberately matches q65's
  * `localCheckpoint` cuts (the measured fan-out points): the gate
  * output feeds three consumers, the near-dup edges are the quadratic
  * work nobody wants to repeat, and the budget prefix is the last
  * frame before the shard join-back.
  */
object CurationResume {

  val stageNames: Seq[String] = Seq(
    "s1_gate", "s2_edges", "s3_keepbest", "s4_spans",
    "s5_decontaminate", "s6_budget", "s7_shards")

  /** Run or resume. Pass a fresh ledger dir for a fresh run, reuse it
    * to resume after a crash.
    */
  def run(s: SparkSession, dir: String, ledger: StageLedger): DataFrame = {
    val s4 = ledger.stage("s1_gate")(SparkEntry.curationStage4(s, dir))

    val edges = ledger.stage("s2_edges")(
      graft.textops.NearDup.minhashPairs(
        s4, "doc_id", "text", threshold = 0.5, maxBucketSize = 100)
        .select("id_a", "id_b"))

    val s5 = ledger.stage("s3_keepbest")(
      Dedup.dropNearDupsBy(
        s4.select(col("doc_id"), col("text"), length(col("text")).as("_len")),
        "doc_id", col("_len"), edges).drop("_len"))

    val s6 = ledger.stage("s4_spans")(
      graft.textops.SpanDedup.dedupSpans(s5, "doc_id", "text", k = 8)
        .select(col("doc_id"), col("text_dedup").as("text")))

    val s7 = ledger.stage("s5_decontaminate")(
      graft.textops.SpanDedup.decontaminate(
        s6, "doc_id", "text", SparkEntry.evalCorpus(s, dir), "text", k = 8)
        .filter(!col("flagged"))
        .select(col("doc_id"), col("text_clean").as("text"), col("n_tokens")))

    val s8 = ledger.stage("s6_budget")(
      Budget.takeWhileBudget(
        s7, col("doc_id"), col("n_tokens"), budget = 15000L,
        cumCol = "cum_tokens"))

    ledger.stage("s7_shards")(
      s8.join(s4.select(col("doc_id"), col("lang_pred")), Seq("doc_id"))
        .select(col("doc_id"), col("lang_pred"), col("text"),
          col("n_tokens"), col("cum_tokens"))
        .withColumn("shard_id", expr("greatest(cum_tokens - 1L, 0L) div 2000L")))
  }
}
