package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, seed-free corpus sampling — the repeatable-subset
  * primitive a training-data pipeline needs (ablations, held-out
  * splits, debugging slices that stay STABLE across runs, partitions
  * and engines).
  *
  * `sample(fraction)` / `TABLESAMPLE` are per-run random and
  * partition-order-sensitive; this derives a 0-255 bucket from the md5
  * of the row's id rendered as a string — reproducible anywhere md5
  * exists (the q48 oracle recomputes it in DuckDB verbatim). A narrow
  * codegen'd filter: predicate-pushdown-friendly, no shuffle, no state.
  */
object Sampling {

  /** 0-255 bucket from the first md5 byte of the id's string form. */
  def bucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 2), 16, 10).cast("int")

  /** Keep rows whose bucket falls below `keepBuckets` (of 256) — e.g.
    * 32 keeps a deterministic ~12.5% of ids, and the kept set for a
    * smaller `keepBuckets` is always a SUBSET of a larger one's (nested
    * samples for scaling-law-style runs).
    */
  def deterministicSample(df: DataFrame, idCol: Column, keepBuckets: Int): DataFrame = {
    require(keepBuckets >= 1 && keepBuckets <= 256,
      s"keepBuckets must be in [1, 256], got $keepBuckets")
    df.filter(bucket(idCol) < keepBuckets)
  }

  /** Stratified deterministic sample: per-stratum keep rates (the
    * corpus-mix rebalancing step — downsample the over-represented
    * language/source, keep the rare one whole). Same md5 bucket as
    * [[deterministicSample]], so per-stratum kept sets nest the same
    * way, and a row's fate never depends on partitioning or run order.
    * Strata absent from `keepBucketsByStratum` use
    * `defaultKeepBuckets`; 0 drops them entirely. Narrow codegen'd
    * filter — no shuffle, no state.
    */
  def stratifiedSample(
      df: DataFrame, idCol: Column, strataCol: Column,
      keepBucketsByStratum: Map[String, Int],
      defaultKeepBuckets: Int = 0): DataFrame = {
    (defaultKeepBuckets +: keepBucketsByStratum.values.toSeq).foreach(k =>
      require(k >= 0 && k <= 256, s"keepBuckets must be in [0, 256], got $k"))
    require(keepBucketsByStratum.nonEmpty, "need at least one stratum rate")
    val cutoff = keepBucketsByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultKeepBuckets)) { case (acc, (stratum, k)) =>
        when(strataCol === stratum, lit(k)).otherwise(acc)
      }
    df.filter(bucket(idCol) < cutoff)
  }

  /** Per-row-probability hash-gated Bernoulli — the importance
    * RESAMPLING primitive (DSIR, Xie et al. 2023; DoReMi-style
    * reweighting applied at the example level): every row carries its
    * own acceptance probability `probX10000Col` (x10000 integral —
    * e.g. a normalized importance weight target_score/source_score,
    * or a quality-classifier acceptance curve), and is kept iff
    *
    *   hash60(salt || id) mod 10000 < clamp(prob_x10000, 0, 10000)
    *
    * Exact integral arithmetic (hash60 is the md5-derived 60-bit
    * value the sketch family uses, so DuckDB replays the decision
    * bit-for-bit); deterministic per (salt, id) — run order,
    * partitioning, and retries cannot change a row's fate, and
    * DIFFERENT salts draw independent decisions for the same id (the
    * [[saltedBucket]] argument). One narrow codegen'd filter; no
    * shuffle, no state.
    */
  def importanceResample(
      df: DataFrame, idCol: Column, probX10000Col: Column,
      salt: String = "isamp:"): DataFrame = {
    val h = DistinctSketch.hash60(
      concat(lit(salt), idCol.cast("string")))
    val p = greatest(lit(0L), least(lit(10000L), probX10000Col.cast("long")))
    df.filter(pmod(h, lit(10000L)) < p)
  }

  /** 0-255 bucket of `salt || id` — [[bucket]] with a domain label, so
    * independent decisions about the SAME id (split assignment vs
    * subsampling vs an A/B holdout) draw from decorrelated hashes
    * instead of all keying off one byte.
    */
  def saltedBucket(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 2), 16, 10)
      .cast("int")

  /** Deterministic train/val/test split — the partition every training
    * run needs, as a row-local labeling (NOT a per-run random split):
    * an id's assignment is a pure function of the id, so it is stable
    * across runs, partitionings, engines, and — the property random
    * splits lack — across CORPUS VERSIONS: re-curating, adding, or
    * removing documents never moves a surviving document between
    * splits, so yesterday's test set never leaks into today's train
    * set. Rates are in the repo's /256 bucket units on a salted hash
    * (default salt `"split:"` decorrelates the split from
    * [[deterministicSample]]'s plain-md5 subsetting, so sampled
    * subcorpora keep all three splits at the same rates).
    *
    * 100 TB shape: one narrow codegen'd projection — zero shuffles,
    * zero state; test/val land in the LOW buckets so growing either
    * rate only ever moves rows OUT of train (never test -> val).
    */
  def assignSplit(
      df: DataFrame, idCol: Column, valBuckets: Int, testBuckets: Int,
      salt: String = "split:", splitCol: String = "split"): DataFrame = {
    require(valBuckets >= 0 && testBuckets >= 0 && valBuckets + testBuckets < 256,
      s"val+test buckets must leave train nonempty in [0, 256): " +
        s"got val=$valBuckets test=$testBuckets")
    val b = saltedBucket(idCol, salt)
    df.withColumn(splitCol,
      when(b < testBuckets, "test")
        .when(b < testBuckets + valBuckets, "val")
        .otherwise("train"))
  }

  /** Efraimidis–Spirakis A-ES key for weighted sampling WITHOUT
    * replacement: rank ids by `ln(u)/w` descending, where `u` is a
    * deterministic md5-derived uniform in (0, 1] — the largest-key rows
    * are a weight-proportional sample, and because `u` is a pure
    * function of (salt, id), the selection is reproducible across runs,
    * partitionings, and engines (the q95 oracle recomputes it in
    * DuckDB). `u = (h60 + 1) / 2^60` with h60 the family's md5-60-bit
    * hash: +1 keeps `u` strictly positive (ln(0) = -Inf would tie every
    * zero-hash row) and the upper end u = 1 -> key = 0 is fine.
    *
    * Floating point: ln and the divide are IEEE doubles on both
    * engines; only the SELECTED SET is output, so a cross-engine ulp
    * divergence matters only if two keys straddle the k-boundary within
    * ~1 ulp — SamplingSpec audits the actual boundary margin (orders of
    * magnitude above ulp noise for md5-spread keys).
    */
  def weightedKey(idCol: Column, weightCol: Column, salt: String = "wsamp:"): Column = {
    val h60 = conv(substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 15),
      16, 10).cast("long")
    val w = weightCol.cast("double")
    // contract enforcement: w <= 0 gives ln(u)/0 = ±Inf (or a flipped
    // key sign for w < 0), silently ranking the bad row FIRST and
    // poisoning the sample — fail loudly instead. assert_true also
    // raises on a NULL weight (condition evaluates null), returns null
    // on success, so the coalesce(…, 0.0) addend is a no-op for valid
    // rows and stays inside the key expression (a standalone guard
    // column would be pruned by the optimizer before it could fire)
    val guard = coalesce(
      assert_true(w > lit(0.0d),
        lit("weighted sampling: weights must be strictly positive"))
        .cast("double"),
      lit(0.0d))
    log((h60 + 1).cast("double") / lit(1152921504606846976.0d)) / // u = h/2^60
      w + guard
  }

  /** Weight-proportional sample of `k` rows without replacement (the
    * corpus-mix primitive when strata rates aren't known up front —
    * e.g. sample by token count or by a quality score). Weights must be
    * strictly positive (enforced inside [[weightedKey]]: a non-positive
    * or NULL weight raises instead of silently winning the sample). 100 TB shape: `orderBy(key).limit(k)` plans as
    * TakeOrderedAndProject — each task keeps its local top-k, only
    * k rows per task reach the driver merge, no global sort, no
    * shuffle of the data itself.
    */
  def weightedSample(
      df: DataFrame, idCol: Column, weightCol: Column, k: Int,
      salt: String = "wsamp:"): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    df.withColumn("_wkey", weightedKey(idCol, weightCol, salt))
      .orderBy(col("_wkey").desc, idCol)
      .limit(k)
      .drop("_wkey")
  }

  /** Per-stratum weighted sample without replacement: `k` rows per
    * group by the same A-ES key — the per-language/per-source variant
    * every mixture plan needs. Written as the PLAIN window + rank
    * filter: Spark's InferWindowGroupLimit (the q76 lesson) performs
    * the map-side per-group top-k prune, so each task forwards at most
    * k rows per group it sees — a hot stratum never concentrates in
    * one task's sort.
    */
  def weightedSamplePerKey(
      df: DataFrame, idCol: Column, weightCol: Column,
      strataCol: Column, k: Int, salt: String = "wsamp:"): DataFrame = {
    require(k >= 1, s"weightedSamplePerKey: k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(col("_wkey").desc, idCol)
    df.withColumn("_wkey", weightedKey(idCol, weightCol, salt))
      .withColumn("_rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_wkey", "_rk")
  }
}
