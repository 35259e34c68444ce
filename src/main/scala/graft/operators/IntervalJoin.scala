package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join — "which events fall inside which time
  * windows" (ad attribution, session enrichment, downtime overlap).
  * Spark has no native range-join strategy: the naive formulation is
  * a BroadcastNestedLoopJoin (every point × every interval — dead at
  * scale), and windows don't apply because intervals OVERLAP.
  *
  * The scale shape is the classic BUCKETIZED range join (the
  * Databricks range-join-hint technique, built from primitives):
  * time divides into fixed chunks; an interval replicates to every
  * chunk it covers, a point maps to exactly ONE chunk, and the join
  * becomes an equi-join on the chunk id followed by the exact
  * between-filter. Each qualifying (interval, point) pair emerges
  * exactly once — the point's chunk is unique, so no dedup pass.
  *
  * Cost model: interval replication = ceil(len/chunk) + 1 rows; probe
  * fan-in per chunk = points in that time slice. `chunkSeconds` is
  * the dial: small chunks replicate intervals more, large chunks scan
  * more candidates per point. `maxChunksPerInterval` fails loudly on
  * the year-long-interval × 1-second-chunk explosion instead of
  * silently materializing 31M rows per interval. For per-entity
  * intervals, prepend the entity to both join keys via `keyCols` —
  * the chunk id then partitions WITHIN the entity (the q17 chunked
  * discipline).
  */
object IntervalJoin {

  /** The explosion guard folded into the chunk-upper-bound expression:
    * a row whose interval would replicate past `maxChunks` raises a
    * loud runtime error AT THAT ROW instead of materializing the
    * explosion. This replaces the former eager 1-row `collect()`
    * pre-scan (round-10 advice): the valid path now costs ZERO extra
    * jobs — the check rides the scan the explode performs anyway —
    * and the failure still precedes any blow-up because the guard
    * evaluates before its row's `sequence` does.
    */
  private def guardedUpper(
      op: String, chunkSeconds: Long, maxChunks: Long,
      c0: Column, c1: Column): Column =
    when(c1 - c0 < maxChunks, c1).otherwise(raise_error(concat(
      lit(s"$op: an interval spans "), (c1 - c0 + 1).cast("string"),
      lit(s" chunks of $chunkSeconds s (> $maxChunks) — raise " +
        "chunkSeconds or maxChunksPerInterval deliberately"))).cast("long"))

  /** Join epoch-second points to [start, end] epoch-second intervals
    * (both ends inclusive). Output: every column of `intervals` and
    * `points` (caller projects), one row per qualifying pair.
    */
  def pointsInIntervals(
      intervals: DataFrame, startCol: String, endCol: String,
      points: DataFrame, tsCol: String,
      chunkSeconds: Long, keyCols: Seq[String] = Nil,
      maxChunksPerInterval: Long = 100000): DataFrame = {
    require(chunkSeconds > 0,
      s"pointsInIntervals: chunkSeconds must be positive (got $chunkSeconds)")
    require(maxChunksPerInterval > 0,
      s"pointsInIntervals: maxChunksPerInterval must be positive")
    val iv = intervals
      .withColumn("_ij_c0", floor(col(startCol) / chunkSeconds).cast("long"))
      .withColumn("_ij_c1",
        guardedUpper("pointsInIntervals", chunkSeconds, maxChunksPerInterval,
          col("_ij_c0"), floor(col(endCol) / chunkSeconds).cast("long")))
    val expanded = iv
      .withColumn("_ij_chunk",
        explode(sequence(col("_ij_c0"), col("_ij_c1"))))
      .drop("_ij_c0", "_ij_c1")
    val probe = points
      .withColumn("_ij_chunk", floor(col(tsCol) / chunkSeconds).cast("long"))
    val joinKeys = keyCols :+ "_ij_chunk"
    expanded.join(probe, joinKeys)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_ij_chunk")
  }

  /** Interval × interval OVERLAP join (inclusive ends: overlap iff
    * `aStart ≤ bEnd AND bStart ≤ aEnd`) — downtime correlation,
    * session co-occurrence, booking conflicts. Both sides replicate
    * to their covered chunks; a qualifying pair shares EVERY chunk in
    * the ranges' intersection, so the join would duplicate it — the
    * dedup-free trick is to keep the pair only in the FIRST shared
    * chunk, `max(chunk(aStart), chunk(bStart))`, which any
    * overlapping pair contains exactly once. Column names of the two
    * frames must be disjoint (keyCols excepted).
    */
  def intervalOverlaps(
      a: DataFrame, aStartCol: String, aEndCol: String,
      b: DataFrame, bStartCol: String, bEndCol: String,
      chunkSeconds: Long, keyCols: Seq[String] = Nil,
      maxChunksPerInterval: Long = 100000): DataFrame = {
    require(chunkSeconds > 0,
      s"intervalOverlaps: chunkSeconds must be positive (got $chunkSeconds)")
    val overlapCols =
      (a.columns.toSet intersect b.columns.toSet) -- keyCols.toSet
    require(overlapCols.isEmpty,
      s"intervalOverlaps: non-key column collision: ${overlapCols.mkString(", ")}")
    def expand(df: DataFrame, s: String, e: String, tag: String): DataFrame = {
      val iv = df
        .withColumn(s"_ij_${tag}0", floor(col(s) / chunkSeconds).cast("long"))
        .withColumn(s"_ij_${tag}1",
          guardedUpper(s"intervalOverlaps ($tag side)", chunkSeconds,
            maxChunksPerInterval,
            col(s"_ij_${tag}0"), floor(col(e) / chunkSeconds).cast("long")))
      iv.withColumn("_ij_chunk",
        explode(sequence(col(s"_ij_${tag}0"), col(s"_ij_${tag}1"))))
        .drop(s"_ij_${tag}1")
    }
    val ea = expand(a, aStartCol, aEndCol, "a")
    val eb = expand(b, bStartCol, bEndCol, "b")
    ea.join(eb, keyCols :+ "_ij_chunk")
      .filter(col(aStartCol) <= col(bEndCol) &&
        col(bStartCol) <= col(aEndCol))
      // first-shared-chunk rule: exactly-once emission, no dedup pass
      .filter(col("_ij_chunk") === greatest(col("_ij_a0"), col("_ij_b0")))
      .drop("_ij_chunk", "_ij_a0", "_ij_b0")
  }
}
