package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared deletion + compaction lifecycle for the persisted index
  * families (minhash / simhash / winnow / IVF / PQ). Completes the
  * build → append → probe loop with the two operations a long-running
  * 100 TB ingest eventually needs:
  *
  *  - '''delete''' (takedowns, re-crawls): appending ids to a
  *    `tombstones.parquet` set is O(batch) — no index rewrite. Every
  *    probe anti-joins the tombstone set, so deleted docs stop
  *    matching immediately.
  *  - '''compact''': each `mode=append` ingest batch adds parquet
  *    part-files without bound (a year of hourly batches is ~10k files
  *    per dataset — metadata pressure and tiny-file reads). Compaction
  *    physically applies the tombstones and rewrites each dataset to a
  *    bounded file count, then clears the tombstone set.
  *
  * Contract: a tombstoned id stays in the ingestion LEDGER (the
  * replay anti-join keeps using it — a replayed batch containing a
  * deleted id must not re-append), so re-adding a removed id requires
  * a compact first; the family specs pin this.
  *
  * Crash safety: compaction swaps datasets via `.bak` rename
  * (write-new → live-to-bak → new-to-live → drop-bak) and deletes the
  * tombstone file LAST, so a crash at any step is healed by simply
  * re-running compact — the prologue restores a half-swapped dataset
  * from its `.bak` and re-applies the still-present tombstones.
  * Compaction is a maintenance operation: run it from one process,
  * not concurrently with probes of the same index.
  */
object IndexOps {

  private def tombPath(dir: String) = s"$dir/tombstones.parquet"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fs(spark, p).exists(p)
  }

  /** Tombstone `ids` (their `idCol`, long-castable) in the index at
    * `dir`: O(batch) append, honored by every probe from the next read
    * on. Idempotent — re-tombstoning an id is harmless (anti-join
    * semantics don't count).
    */
  def removeFromIndex(ids: DataFrame, idCol: String, dir: String): Unit =
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .write.mode("append").parquet(tombPath(dir))

  /** `df` minus tombstoned ids, matching on `df`'s `joinCol`. The
    * no-tombstone fast path keeps the plan unchanged (and the build's
    * probe plans identical) until the first delete.
    */
  def dropTombstoned(
      spark: SparkSession, dir: String, df: DataFrame, joinCol: String): DataFrame =
    if (!exists(spark, tombPath(dir))) df
    else df.join(
      spark.read.parquet(tombPath(dir)).select(col("id").as(joinCol)).distinct(),
      Seq(joinCol), "left_anti")

  /** Compact the index at `dir`: for each `(dataset file, id column)`
    * apply the tombstones and rewrite to `targetFiles` part-files via
    * the `.bak` swap, then clear the tombstone set (LAST — so a crash
    * anywhere re-runs to the same result).
    */
  def compactIndex(
      spark: SparkSession, dir: String,
      datasets: Seq[(String, String)], targetFiles: Int = 4): Unit = {
    require(targetFiles > 0, s"compactIndex: targetFiles must be positive")
    datasets.foreach { case (name, idCol) =>
      compactDataset(spark, dir, name, idCol, targetFiles)
    }
    val t = new Path(tombPath(dir))
    val tf = fs(spark, t)
    // delete() signals failure by returning false; a silently-kept
    // tombstone file would suppress ids legitimately re-added after
    // this compact — same must() discipline as every swap step above.
    if (!(tf.delete(t, true) || !tf.exists(t)))
      throw new java.io.IOException(
        s"compactIndex: tombstone clear failed for $dir — datasets are " +
          "compacted but the stale tombstone set would suppress re-added " +
          "ids. Re-running compact heals (it re-applies the tombstones " +
          "and retries the clear).")
    ()
  }

  private def compactDataset(
      spark: SparkSession, dir: String, name: String,
      idCol: String, targetFiles: Int): Unit = {
    val live = new Path(s"$dir/$name")
    val bak = new Path(s"$dir/$name.bak")
    val fresh = new Path(s"$dir/$name.compact")
    val f = fs(spark, live)
    // Hadoop FileSystems signal rename/delete failure by RETURNING
    // false, not throwing — a swallowed false here would let
    // compactIndex delete the tombstone file while the old
    // tombstone-bearing dataset is still live, silently resurrecting
    // deleted ids. Every step must either succeed or abort the compact.
    def must(ok: Boolean, step: String, state: String): Unit =
      if (!ok) throw new java.io.IOException(
        s"compactIndex: $step failed for $dir/$name — aborting before " +
          s"the tombstone clear. $state Re-running compact heals and " +
          "completes the swap.")
    // heal a previous crash mid-swap: live missing but .bak present
    if (!f.exists(live) && f.exists(bak)) must(f.rename(bak, live), "bak restore",
      "The dataset is at its .bak path; probes fail until restored.")
    if (!f.exists(live)) return // dataset not written yet (e.g. ledger-only index)
    f.delete(fresh, true) // false = nothing to delete; verified below
    f.delete(bak, true)
    must(!f.exists(fresh) && !f.exists(bak), "stale .compact/.bak cleanup",
      "The live dataset is unchanged.")
    // repartition, not coalesce: bounds the file count while keeping
    // the write parallel (coalesce(1) would single-thread a large
    // dataset rewrite)
    dropTombstoned(spark, dir, spark.read.parquet(live.toString), idCol)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(fresh.toString)
    must(f.rename(live, bak), "live -> .bak rename",
      "The live dataset is unchanged.")
    must(f.rename(fresh, live), ".compact -> live rename",
      "The live dataset is MISSING (it sits at .bak); probes fail until re-run.")
    must(f.delete(bak, true) || !f.exists(bak), ".bak delete",
      "The compacted dataset is live; only the stale .bak remains.")
    ()
  }
}
