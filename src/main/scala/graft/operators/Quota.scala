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
  * 100 TB shape: the naive formulation is ONE window over the key —
  * `row_number() OVER (PARTITION BY key ORDER BY ...)` — which sorts
  * every row of a hot key in ONE task: a 100M-row domain is a 100M-row
  * sort on one core. [[capPerKey]] runs the standard two-phase top-k
  * instead:
  *
  *  1. rank within (key, salt) where salt = hash(id) % salts and keep
  *     rank <= k — any globally-top-k row is top-k within its salt
  *     group, so phase 1 keeps a superset (<= salts * k rows per key);
  *     max task holds hotKey/salts rows;
  *  2. re-rank the survivors per key and keep rank <= k — the final
  *     window sees at most salts * k rows per key, bounded regardless
  *     of skew.
  *
  * Two exchanges (hash on (key, salt), then hash on key over <=
  * salts*k rows/key) instead of one unbounded-sort exchange. The salt
  * is a deterministic function of the id column (never
  * `spark_partition_id()` — PLANS.md: shuffle keys must be derivable
  * from data, or stage retry re-salts rows into partitions other
  * reducers already fetched). `salts = 1` degenerates to the plain
  * single-window form.
  */
object Quota {

  /** Keep at most `k` rows per `key`, first-by-`order` (tiebroken by
    * `id`, which must be unique per row), with the final 1-based rank
    * in `rk`. Row set equals the naive single-window form for every
    * `salts >= 1` (QuotaSpec pins this).
    */
  def capPerKey(
      df: DataFrame, key: Seq[Column], order: Seq[Column], id: Column,
      k: Int, salts: Int = 16): DataFrame = {
    require(k >= 1, s"capPerKey: k must be >= 1, got $k")
    require(salts >= 1, s"capPerKey: salts must be >= 1, got $salts")
    val saltCol = "__graft_quota_salt"
    val rkCol = "__graft_quota_rk"
    require(!df.columns.contains(saltCol) && !df.columns.contains("rk"),
      "capPerKey: input must not already have rk/__graft_quota_salt columns")
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
