package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key document quotas — "keep at most k docs per host/source/
  * domain" — the crawl-curation cap that stops one giant domain from
  * dominating a training mix (the C4/RefinedWeb per-host cap).
  *
  * Semantics: for each distinct key, keep the first `k` rows in the
  * order given by `order` (made total with the caller's unique `id`
  * tiebreak — a non-total order would make "first k" partition-
  * dependent), ranked 1..k in a `rk` column.
  *
  * 100 TB shape — the plain window IS the plan you want on Spark 4:
  * `row_number() OVER (PARTITION BY key ORDER BY ...)` followed by
  * `filter(rk <= k)` triggers Catalyst's `InferWindowGroupLimit`
  * (SPARK-37099, for k <=
  * `spark.sql.optimizer.windowGroupLimitThreshold`, default 1000),
  * which inserts a MAP-SIDE per-key top-k prune before the exchange:
  * each scan task forwards at most k rows per key, so the hot key's
  * reduce task sees <= k * numMapTasks rows — the same bound a
  * hand-rolled salted two-phase achieves, minus one full-data
  * exchange. The ScaleBench phase-1f duel measures exactly this
  * (50M wide rows, one host owning half): the optimizer-pruned
  * window beats [[capPerKeySalted]] AND dwarfs the truly naive plan
  * (rule disabled), which drags the hot host's half-corpus through
  * one task. Hand-scheduling lost to declaring the plan — kept below
  * only for the cases the rule cannot see.
  */
object Quota {

  /** Keep at most `k` rows per `key`, first-by-`order` (tiebroken by
    * `id`, which must be unique per row), with the final 1-based rank
    * in `rk`. One window, one exchange; Catalyst bounds the hot-key
    * task map-side via `InferWindowGroupLimit` (see object doc).
    * `k` above `spark.sql.optimizer.windowGroupLimitThreshold`
    * (default 1000) silently loses the prune — raise the threshold or
    * use [[capPerKeySalted]] there.
    */
  def capPerKey(
      df: DataFrame, key: Seq[Column], order: Seq[Column], id: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"capPerKey: k must be >= 1, got $k")
    require(!df.columns.contains("rk"),
      "capPerKey: input must not already have an rk column")
    val w = Window.partitionBy(key: _*).orderBy((order :+ id.asc): _*)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** The hand-rolled two-phase salted top-k — the shape to reach for
    * ONLY when `InferWindowGroupLimit` cannot fire (k above the
    * threshold in an environment where the conf is fixed, or a future
    * rank-like function the rule doesn't recognize):
    *
    *  1. rank within (key, salt) where salt = hash(id) % salts and keep
    *     rank <= k — any globally-top-k row is top-k within its salt
    *     group, so phase 1 keeps a superset (<= salts * k rows per key);
    *     max task holds hotKey/salts rows;
    *  2. re-rank the survivors per key and keep rank <= k.
    *
    * Two exchanges instead of one; row-set equal to [[capPerKey]] for
    * every `salts >= 1` (QuotaSpec pins this). The salt is a
    * deterministic function of the id column (never
    * `spark_partition_id()` — PLANS.md: shuffle keys must be derivable
    * from data, or stage retry re-salts rows into partitions other
    * reducers already fetched).
    */
  def capPerKeySalted(
      df: DataFrame, key: Seq[Column], order: Seq[Column], id: Column,
      k: Int, salts: Int = 16): DataFrame = {
    require(k >= 1, s"capPerKeySalted: k must be >= 1, got $k")
    require(salts >= 1, s"capPerKeySalted: salts must be >= 1, got $salts")
    val saltCol = "__graft_quota_salt"
    val rkCol = "__graft_quota_rk"
    require(!df.columns.contains(saltCol) && !df.columns.contains("rk"),
      "capPerKeySalted: input must not already have rk/__graft_quota_salt columns")
    val total = order :+ id.asc
    val salted = df.withColumn(saltCol, pmod(xxhash64(id), lit(salts.toLong)))
    val phase1 = Window.partitionBy((key :+ col(saltCol)): _*).orderBy(total: _*)
    val survivors = salted
      .withColumn(rkCol, row_number().over(phase1))
      .filter(col(rkCol) <= k)
      .drop(rkCol)
    val phase2 = Window.partitionBy(key: _*).orderBy(total: _*)
    survivors
      .withColumn("rk", row_number().over(phase2))
      .filter(col("rk") <= k)
      .drop(saltCol)
  }
}
