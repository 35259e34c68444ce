package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/val/test split-leakage audit — the eval-hygiene check behind
  * [[Sampling.assignSplit]]'s promise: identical CONTENT must not
  * straddle splits (an exact duplicate of a test document inside
  * train is memorized eval contamination, invisible to per-row
  * bucketing because the copies carry different ids).
  *
  * [[exactDupLeakage]] groups rows by content hash and reports, per
  * observed SPLIT-SET (the sorted distinct splits a content group
  * touches), how many groups and rows land there: `"train"` rows are
  * clean, `"test,train"` rows are the leak. One hash aggregation on
  * the content key + one on the #split-sets summary; the shuffle
  * carries (hash, split) pairs, never text.
  *
  * The near-dup variant of this audit composes the minhash pair
  * machinery (q25) with the same split join; exact-content grouping
  * is the oracle-exact core.
  */
object SplitAudit {

  /** (splits, n_groups, n_docs): `splits` is the comma-joined sorted
    * distinct split set of a content group. Rows with
    * `splits.contains(",")` are leaking groups.
    */
  def exactDupLeakage(
      df: DataFrame, textCol: Column, splitCol: Column): DataFrame =
    df.select(md5(textCol.cast("binary")).as("_sa_grp"),
        splitCol.as("_sa_split"))
      .groupBy(col("_sa_grp"))
      .agg(
        array_join(array_sort(collect_set(col("_sa_split"))), ",")
          .as("splits"),
        count(lit(1)).as("_sa_n"))
      .groupBy(col("splits"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("_sa_n")).as("n_docs"))

  /** The CONSTRUCTIVE twin of [[exactDupLeakage]]: group-atomic split
    * assignment. Rows are bucketed by the md5 of their CONTENT
    * instead of their id ([[Sampling.assignSplit]]'s salted rule on
    * the content hash), so exact duplicates land in the same split by
    * construction and the audit's leaking-group count is zero — a
    * row-local projection, no shuffle, same cross-run/cross-engine
    * stability as every md5-bucket op in the family. The id-keyed
    * split keeps its own virtue (stable under content edits); pick
    * per corpus: content-keyed when dedup is incomplete, id-keyed
    * when content is mutable.
    */
  def assignSplitByContent(
      df: DataFrame, textCol: Column,
      valBuckets: Int, testBuckets: Int,
      salt: String = "split:", splitCol: String = "split"): DataFrame =
    Sampling.assignSplit(df, md5(textCol.cast("binary")),
      valBuckets, testBuckets, salt, splitCol)

  /** NEAR-dup-atomic split: rows joined to their connected-component
    * label over caller-supplied similarity edges (the q36 CC
    * machinery — minhash pairs, embedding pairs, whatever the
    * pipeline's near-dup stage emits), then bucketed by COMPONENT
    * id — an entire near-dup CLUSTER lands in one split. This is the
    * guarantee [[assignSplitByContent]] cannot give when
    * near-duplicates differ byte-wise (the common case: boilerplate
    * variants, re-crawls, light edits). Cost: the CC fixed-point over
    * the edge set + one hash join back; the split itself is the same
    * row-local salted bucket.
    */
  def assignSplitByComponent(
      df: DataFrame, idCol: String, edges: DataFrame,
      valBuckets: Int, testBuckets: Int,
      salt: String = "split:", splitCol: String = "split"): DataFrame = {
    val comps = Dedup.connectedComponents(df, idCol, edges)
      .select(col("id").as(idCol), col("component"))
    Sampling.assignSplit(df.join(comps, Seq(idCol)), col("component"),
      valBuckets, testBuckets, salt, splitCol)
  }
}
