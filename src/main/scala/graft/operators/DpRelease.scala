package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private count release (Dwork et al. 2006) — the
  * third member of the privacy family ([[graft.textops.Pii]] scrubs
  * content, [[KAnonymity]] generalizes metadata, this releases
  * AGGREGATES): per-group counts with Laplace(Δ/ε) noise (Δ = 1 for
  * counting queries), negatives clamped by post-processing (which
  * never weakens the guarantee).
  *
  * Noise here is SEEDED — drawn by inverse-CDF from the uniform
  * `hash60(seed ‖ group key) / 2^60`:
  *
  *   lap(u) = −b · sign(u − ½) · ln(1 − 2·|u − ½|),   b = Δ/ε
  *
  * making the whole release deterministic and therefore
  * oracle-checkable bit-for-bit (the repo's no-wall-clock/no-PRNG
  * rule). A production deployment feeds a fresh secret seed per
  * release — the MECHANISM is identical; replaying a seed replays
  * the noise, so seed reuse across releases of the same statistic is
  * the caller's privacy budget to manage, exactly as ε is. `true_n`
  * rides along for the correctness gate and is documented as a
  * drop-before-publishing column.
  *
  * 100 TB shape: one map-side-combined count aggregation; the noise
  * is a per-GROUP scalar expression over the reduced frame — zero
  * extra passes, zero shuffles beyond the count's own.
  */
object DpRelease {

  /** Per-group ε-DP noisy counts:
    * (groupCols..., true_n, noise_x1000, dp_n).
    * `epsilonX1000` is ε scaled by 1000 (integral API — ε = 1.0 is
    * 1000); sensitivity is 1 (add/remove one row moves a count by 1).
    *
    * SECURITY CONTRACT ON `seed`: the noise is a deterministic
    * function of (seed, group key) — anyone who knows or guesses the
    * seed can subtract it exactly, so the ε guarantee rests ENTIRELY
    * on the seed being a high-entropy secret (≥ 128 bits from a CSPRNG,
    * e.g. `java.util.UUID.randomUUID().toString`), fresh per release,
    * and never co-published with the output. Low-entropy fixed
    * strings ("test", a date) are for TEST DETERMINISM only — they
    * carry no privacy. Production and test are deliberately one code
    * path (determinism is what makes the oracle gate possible); the
    * seed's provenance is what distinguishes them.
    */
  def laplaceNoisyCounts(
      df: DataFrame, groupCols: Seq[Column],
      epsilonX1000: Long, seed: String): DataFrame = {
    require(epsilonX1000 > 0,
      s"laplaceNoisyCounts: epsilonX1000 must be positive (got $epsilonX1000)")
    val b = 1000.0 / epsilonX1000.toDouble
    val keyNames = df.select(groupCols: _*).columns.toSeq
    val counts = df.groupBy(groupCols: _*).agg(count(lit(1)).as("true_n"))
    val keyStr = concat_ws("|", lit(seed) +: keyNames.map(col): _*)
    val u = DistinctSketch.hash60(keyStr).cast("double") /
      lit(1152921504606846976.0) // 2^60
    val lap = lit(-b) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    counts
      .withColumn("noise_x1000", round(lap * lit(1000.0), 0).cast("long"))
      .withColumn("dp_n",
        greatest(col("true_n") + round(lap, 0).cast("long"), lit(0L)))
  }
}
