package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift report between two corpus snapshots — the
  * release-over-release mix check beside [[SnapshotDiff]]'s
  * content diff and the q160 contamination trend: per key (language,
  * source, …), both snapshots' row shares and the population
  * stability index term
  *
  *   psi_term = (p_cur − p_prev) · ln(p_cur / p_prev)
  *
  * whose sum over keys is the classic PSI (< 0.1 stable, > 0.25
  * action). Shares are integral x10000 (exact); the PSI term is the
  * ONE float column, computed per key from already-integral shares
  * (no float aggregation anywhere — the sum is the CALLER's single
  * add over a #keys-row frame) and 4-decimal rounded, the q145/q64
  * ln convention. Keys absent from one side clip to a 1-of-10000
  * share floor (the standard PSI zero-bin treatment) so the term is
  * finite and the disappearance still screams.
  *
  * 100 TB shape: one map-side-combined count per snapshot, a
  * #keys-row full-outer join, then narrow arithmetic — nothing else
  * shuffles.
  */
object DriftReport {

  /** (key, n_prev, n_cur, share_prev_x10000, share_cur_x10000,
    * delta_x10000, psi_term).
    */
  def shareDrift(
      prev: DataFrame, cur: DataFrame, keyCol: String): DataFrame = {
    def shares(df: DataFrame, nCol: String, sCol: String): DataFrame = {
      val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as(nCol))
      counts
        .crossJoin(broadcast(counts.agg(
          coalesce(sum(col(nCol)), lit(0L)).as("_dr_tot"))))
        .withColumn(sCol,
          when(col("_dr_tot") === 0, lit(0L))
            .otherwise(expr(s"CAST($nCol * 10000 DIV _dr_tot AS BIGINT)")))
        .drop("_dr_tot")
    }
    val p = shares(prev, "n_prev", "share_prev_x10000")
    val c = shares(cur, "n_cur", "share_cur_x10000")
    p.join(c, Seq(keyCol), "full_outer")
      .withColumn("n_prev", coalesce(col("n_prev"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("share_prev_x10000",
        coalesce(col("share_prev_x10000"), lit(0L)))
      .withColumn("share_cur_x10000",
        coalesce(col("share_cur_x10000"), lit(0L)))
      .withColumn("delta_x10000",
        col("share_cur_x10000") - col("share_prev_x10000"))
      .withColumn("psi_term", round(
        (greatest(col("share_cur_x10000"), lit(1L)).cast("double") / 10000.0 -
          greatest(col("share_prev_x10000"), lit(1L)).cast("double") / 10000.0) *
          log(greatest(col("share_cur_x10000"), lit(1L)).cast("double") /
            greatest(col("share_prev_x10000"), lit(1L)).cast("double")),
        4))
      .select(col(keyCol), col("n_prev"), col("n_cur"),
        col("share_prev_x10000"), col("share_cur_x10000"),
        col("delta_x10000"), col("psi_term"))
  }
}
