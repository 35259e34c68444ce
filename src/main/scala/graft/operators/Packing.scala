package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the training-prep step AFTER sharding: the
  * curated corpus is one long token stream (documents concatenated in
  * corpus order) cut into fixed-length training sequences of `seqLen`
  * tokens. Unlike [[Budget.shardByTokenBudget]] (where a document
  * never splits), packing is the dual: SEQUENCES never vary in length,
  * so documents split across sequence boundaries. The operator emits
  * one row per (document, sequence) overlap — the slice map a loader
  * needs to assemble each training example:
  *
  *   - `seq_id`    — which training sequence the slice lands in
  *     (global token positions `[seq_id*L, (seq_id+1)*L)`);
  *   - `doc_start` / `doc_len` — the token span WITHIN the document
  *     contributing to this sequence;
  *   - `seq_start` — where in the sequence the slice begins.
  *
  * A document with global token span `[g, g+n)` (g = exclusive running
  * total of everything before it) overlaps sequences
  * `g DIV L .. (g+n-1) DIV L`; all slice arithmetic is row-local
  * integer math on the running total.
  *
  * 100 TB shape: rides [[Budget.runningTotal]]'s ONE full-data shuffle
  * (the chunked two-phase prefix sum); the overlap explosion is a
  * Generate over a row-local `sequence()` — each document emits
  * `ceil(n/L)+1` rows at most, bounded by its own length, so there is
  * no new exchange and no skew hazard beyond the document-length
  * distribution itself (PackingSpec pins the equal-exchange-count plan
  * audit). Integral DIV keeps the assignment exact past 2^53 total
  * tokens — the regime a 100 TB corpus actually reaches.
  *
  * Zero-weight documents contribute no tokens and are dropped from the
  * slice map (they have no span to place; keep them in the SHARD
  * manifest instead if provenance needs them).
  */
object Packing {

  /** One row per (document, training-sequence) overlap; columns of
    * `df` + `cumCol` (inclusive running weight total) + `seq_id`,
    * `doc_start`, `doc_len`, `seq_start` (all long).
    *
    * Contract (shared with [[Budget.takeWhileBudget]]): `orderCol`
    * numeric-castable, unique, non-null; `weightCol` integral and
    * >= 0.
    *
    * @param seqLen fixed training-sequence length in weight units
    * @param dropIncomplete when true, drop slices of the one trailing
    *   sequence that ends past the corpus total (the standard
    *   drop-last-partial-example policy); costs one 1-row aggregate
    *   broadcast-joined back, no data-side exchange.
    */
  def packSequences(
      df: DataFrame,
      orderCol: Column,
      weightCol: Column,
      seqLen: Long,
      cumCol: String = "cum_tokens",
      chunkSize: Long = 100000L,
      dropIncomplete: Boolean = false): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be positive, got $seqLen")
    require(chunkSize > 0, s"packSequences: chunkSize must be positive, got $chunkSize")
    Budget.requireIntegralWeight(df, weightCol, "packSequences")
    val sliced = Budget.runningTotal(df, orderCol, Nil, weightCol, cumCol, chunkSize)
      .withColumn("_n", coalesce(weightCol.cast("long"), lit(0L)))
      .filter(col("_n") > 0)
      // global span [gstart, cum): gstart = exclusive prefix total
      .withColumn("_gstart", col(cumCol) - col("_n"))
      // integral div (not floor(/)): cum exceeds 2^53 at corpus scale.
      // sequence() is safe: _n > 0 implies first <= last.
      .withColumn("seq_id", explode(sequence(
        expr(s"`_gstart` div ${seqLen}L"),
        expr(s"(`$cumCol` - 1L) div ${seqLen}L"))))
      .withColumn("doc_start",
        greatest(col("seq_id") * seqLen - col("_gstart"), lit(0L)))
      .withColumn("doc_len",
        least(col("_n"), (col("seq_id") + 1) * seqLen - col("_gstart"))
          - col("doc_start"))
      .withColumn("seq_start",
        greatest(col("_gstart") - col("seq_id") * seqLen, lit(0L)))
      .drop("_n", "_gstart")
    if (!dropIncomplete) sliced
    else {
      // the corpus total decides whether the LAST sequence is full; a
      // 1-row partial aggregate off the raw frame, explicit broadcast
      // (bounded by construction), filter row-local after it
      val total = df
        .select(coalesce(weightCol.cast("long"), lit(0L)).as("_w"))
        .agg(sum(col("_w")).as("_total"))
      sliced.crossJoin(broadcast(total))
        .filter((col("seq_id") + 1) * seqLen <= col("_total"))
        .drop("_total")
    }
  }
}
