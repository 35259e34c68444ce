package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-curation primitive: given
  * two versions of a corpus (last month's crawl and today's), classify
  * every document as `added` / `removed` / `changed` / `unchanged` by
  * content hash. Downstream, only `added`+`changed` re-enter the
  * expensive pipeline stages (dedup, decontamination, scoring) and
  * `removed` feeds the index-deletion path ([[IndexOps]]) — a real
  * 100 TB pipeline never recurates the unchanged 99%.
  *
  * 100 TB shape: each side is projected to `(id, md5-hash)` BEFORE the
  * join, so the one full-outer shuffle carries 40-byte rows, never the
  * payload; the hash is computed map-side in the scan stage. md5 (not
  * xxhash64) keeps the hash engine-agnostic — any system (the DuckDB
  * oracle, a Python loader) can recompute and re-verify the diff, the
  * [[Sampling]]/[[DistinctSketch]] discipline.
  */
object SnapshotDiff {

  /** One row per id present in either snapshot:
    * `(idCol, status, old_hash, new_hash)` with `status` in
    * `added | removed | changed | unchanged` and the absent side's
    * hash null. `idCol` must be unique per side (two rows with one id
    * would make the classification ambiguous — diff keys, not rows).
    * Null payloads hash as the empty string (a document emptied
    * between snapshots reads as `changed`, not as an error).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      payloadCol: String): DataFrame = {
    def hashed(df: DataFrame, hashName: String): DataFrame =
      df.select(col(idCol),
        md5(coalesce(col(payloadCol).cast("string"), lit(""))).as(hashName))
    hashed(oldDf, "old_hash")
      .join(hashed(newDf, "new_hash"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(idCol), col("status"), col("old_hash"), col("new_hash"))
  }

  /** The re-curation worklist: ids whose content is new to this
    * snapshot (`added` or `changed`), joined back to the new
    * snapshot's payload — the frame the expensive stages actually run
    * on. The join is id-keyed; AQE broadcasts the (usually small)
    * worklist side when its measured size allows.
    */
  def changedDocs(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      payloadCol: String): DataFrame = {
    val work = diff(oldDf, newDf, idCol, payloadCol)
      .filter(col("status").isin("added", "changed"))
      .select(col(idCol), col("status"))
    newDf.join(work, Seq(idCol))
  }
}
