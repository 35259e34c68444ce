package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shard write manifests — the integrity record a 100 TB training-data
  * materialization needs: after [[Budget.writeTokenShards]] lays the
  * curated corpus down as `shard_id=N/` parquet, every later copy /
  * transfer / re-read must be checkable WITHOUT trusting the
  * filesystem: per shard, how many docs, how many tokens, which id
  * range, and an order-independent content checksum.
  *
  * The checksum is `bit_xor` over a 60-bit md5-derived hash of
  * `id:weight` ([[DistinctSketch.hash60]]'s engine-agnostic
  * discipline) — XOR is commutative/associative, so the check is
  * independent of row order, partitioning, and merge shape (any
  * engine, including the DuckDB oracle and whatever reads the shards
  * after a cross-cluster copy, reproduces it with plain md5 + xor);
  * a lost, duplicated, or altered row flips it. (XOR does cancel a
  * row duplicated an EVEN number of times — but that also changes
  * `n_docs`/`n_tokens`, which the manifest checks alongside.)
  *
  * 100 TB shape: the manifest is one hash aggregation over the sharded
  * frame (map-side partial combine; ~one output row per shard), the
  * verify is the same aggregation over the read-back data plus a
  * broadcast-sized join of two manifest frames. Nothing driver-side
  * ever holds more than the manifest itself.
  */
object ShardManifest {

  /** Per-row 60-bit content hash: md5 of `"id:weight"`. */
  def contentHash(id: Column, weight: Column): Column =
    DistinctSketch.hash60(concat_ws(":", id.cast("string"), weight.cast("string")))

  /** Per-shard manifest of a sharded frame:
    * (shard_id, n_docs, n_tokens, min_id, max_id, content_check).
    */
  def manifest(
      sharded: DataFrame, shardCol: String, idCol: String,
      weightCol: String): DataFrame =
    sharded
      .select(col(shardCol).cast("long").as("shard_id"),
        col(idCol).as("_mf_id"), col(weightCol).cast("long").as("_mf_w"),
        contentHash(col(idCol), col(weightCol)).as("_mf_ck"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_mf_w")).as("n_tokens"),
        min(col("_mf_id")).cast("long").as("min_id"),
        max(col("_mf_id")).cast("long").as("max_id"),
        expr("bit_xor(_mf_ck)").as("content_check"))

  /** [[Budget.writeTokenShards]] plus a manifest written LAST at
    * `outDir/_manifest` — underscore-prefixed, so `spark.read.parquet
    * (outDir)` never picks it up as data, and its presence doubles as
    * the commit marker: a crash between the data write and the
    * manifest write leaves shards without a manifest, which
    * [[verifyShards]] reports loudly instead of trusting half a write.
    */
  def writeWithManifest(
      df: DataFrame, shardCol: String, orderCol: Column,
      idCol: String, weightCol: String, outDir: String): Unit = {
    Budget.writeTokenShards(df, shardCol, orderCol, outDir)
    manifest(df, shardCol, idCol, weightCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/_manifest")
  }

  /** Recompute the manifest from the shards on disk and diff it
    * against the stored one. Returns one row per shard id present on
    * either side: (shard_id, ok, stored struct, actual struct) — `ok`
    * false for a missing/extra shard or ANY field drift. The caller
    * gates on `filter(!col("ok"))` being empty.
    */
  def verifyShards(
      spark: SparkSession, outDir: String, shardCol: String,
      idCol: String, weightCol: String): DataFrame = {
    val stored = spark.read.parquet(s"$outDir/_manifest")
    // partition-column type inference may read shard_id back narrower
    // than long; manifest() casts, so both sides land on long
    val actual = manifest(spark.read.parquet(outDir), shardCol, idCol, weightCol)
    val fields = Seq("n_docs", "n_tokens", "min_id", "max_id", "content_check")
    val s = stored.select(col("shard_id") +: fields.map(col): _*)
      .select(col("shard_id"), struct(fields.map(col): _*).as("stored"))
    val a = actual
      .select(col("shard_id"), struct(fields.map(col): _*).as("actual"))
    s.join(a, Seq("shard_id"), "full_outer")
      .select(col("shard_id"),
        (col("stored").isNotNull && col("actual").isNotNull &&
          col("stored") === col("actual")).as("ok"),
        col("stored"), col("actual"))
  }
}
