package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity by global recoding (Sweeney 2002; Samarati 2001) — the
  * metadata-side privacy gate beside [[graft.textops.Pii]]'s content
  * scrubbing: quasi-identifier columns (zip, age band, host, …)
  * generalize UNIFORMLY up a caller-supplied ladder until every
  * remaining equivalence class holds ≥ k rows, with rows whose class
  * is still below k at the chosen level suppressed. Global recoding
  * (one ladder level for the whole dataset) is the variant whose
  * decision is a corpus-level scalar — reproducible, auditable, and
  * exactly replayable in SQL (the DuckDB oracle unrolls the ladder
  * and picks the same level).
  *
  * Level choice: the smallest level ℓ whose suppressed-row count
  * satisfies `suppressed · 1000 ≤ n · maxSuppressedPermille`; if none
  * qualifies, the ladder's top. All-integer arithmetic.
  *
  * 100 TB shape: each candidate level costs ONE scan of the QI
  * columns (parquet pruning reads nothing else) feeding a map-side-
  * combined class-size aggregation reduced to below-k classes — and
  * ladders are short (3–4 rungs), so the search is a handful of
  * bounded jobs, not an optimization loop. The final labeling joins
  * the REDUCED (class → size) frame back on the generalized key;
  * class keys are low-cardinality by construction at the chosen
  * level (that is what k-anonymity means), so AQE broadcasts it.
  */
object KAnonymity {

  /** `ladder`: per QI output column, its generalization rungs —
    * rung 0 the raw value, later rungs coarser; shorter ladders clamp
    * at their top. Output: (idCol, QIs at the chosen level...,
    * class_size, suppressed, level). Suppressed rows carry NULL in
    * every QI column — the frame is safe to release as-is (a caller
    * who forgot to filter cannot leak the below-k classes this
    * operator exists to protect); `suppressed` keeps the accounting.
    */
  def kAnonymize(
      df: DataFrame, idCol: String,
      ladder: Seq[(String, Seq[Column])], k: Long,
      maxSuppressedPermille: Long = 100L): DataFrame = {
    require(ladder.nonEmpty && ladder.forall(_._2.nonEmpty),
      "kAnonymize: every quasi-identifier needs at least one rung")
    require(k >= 2, s"kAnonymize: k must be >= 2 (got $k)")
    require(maxSuppressedPermille >= 0 && maxSuppressedPermille <= 1000,
      s"kAnonymize: maxSuppressedPermille must be in [0, 1000]")
    val maxL = ladder.map(_._2.size).max
    val qiNames = ladder.map(_._1)

    def gen(l: Int): DataFrame = df.select(
      col(idCol) +: ladder.map { case (nm, rungs) =>
        rungs(math.min(l, rungs.size - 1)).as(nm)
      }: _*)

    val n = df.count()
    def suppressedAt(l: Int): Long = {
      val r = gen(l)
        .groupBy(qiNames.map(col): _*)
        .agg(count(lit(1)).as("_ka_cs"))
        .filter(col("_ka_cs") < k)
        .agg(coalesce(sum(col("_ka_cs")), lit(0L)))
        .collect()(0).getLong(0)
      r
    }
    val level = (0 until maxL)
      .find(l => suppressedAt(l) * 1000L <= n * maxSuppressedPermille)
      .getOrElse(maxL - 1)

    val g = gen(level)
    val sizes = g.groupBy(qiNames.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    g.join(sizes, qiNames)
      .select(col(idCol) +:
        qiNames.map(nm =>
          when(col("class_size") < k, lit(null)).otherwise(col(nm)).as(nm)) :+
        col("class_size") :+
        (col("class_size") < k).as("suppressed") :+
        lit(level.toLong).as("level"): _*)
  }
}
