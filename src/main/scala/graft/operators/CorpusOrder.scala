package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle — the training-order
  * permutation step between curation and materialization. A training
  * run wants the corpus in a SEEDED random-but-reproducible order
  * (same seed -> same order on any cluster size), never the incidental
  * parquet/file order; the standard trick is sorting by a keyed hash
  * of the row id (the sort-by-hash shuffle used by large-corpus
  * training preps), which this operator makes explicit:
  *
  *   shuffle_key = xxhash64(seed, id)     // codegen'd, no UDF
  *   order       = (shuffle_key, id)      // id breaks hash ties
  *
  * The id tiebreak matters at corpus scale: xxhash64 collides at the
  * birthday bound (~4e9 rows for 64 bits), and a collision without a
  * tiebreak would make the permutation nondeterministic across
  * partitionings exactly where determinism is the point.
  *
  * 100 TB shape: [[permuted]] assigns each row its 1-based POSITION in
  * the permutation through [[Budget.runningTotal]]'s chunked prefix
  * sum (weight = 1) — ONE full-data hash shuffle, never an
  * unpartitioned `row_number()` window. The chunk bucket is a pure
  * function of the hash key (`key DIV 2^44` -> at most 2^20 key-range
  * buckets, only non-empty ones materialize), so the summary frame
  * stays tiny at any scale. [[shuffleShard]] composes the permutation
  * with [[Budget.shardByTokenBudget]] — shuffle-then-shard is the
  * exact sequence that turns a curated corpus into training shards —
  * riding the SAME single shuffle: the token cumsum in shuffle order
  * IS the prefix sum, and both position and shard id are row-local
  * projections on top of it.
  */
object CorpusOrder {

  /** The permutation key: `xxhash64(seed, id)`. Exposed so oracles and
    * downstream stages can recompute it column-for-column.
    */
  def shuffleKey(seed: Long, idCol: Column): Column =
    xxhash64(lit(seed), idCol)

  /** Width of a chunk bucket in key space. Keys span the full signed
    * 64-bit range; 2^44-wide buckets give at most 2^20 of them —
    * non-empty ones only, so the summary frame is min(rows, 2^20) and
    * a per-bucket task sorts ~rows/2^20 rows at any corpus size.
    * The double cast in the bucket computation loses key bits below
    * 2^11 at full magnitude — harmless: bucketing only needs weak
    * monotonicity (Budget.runningTotal's floor(double) argument), the
    * exact key still orders rows within the bucket.
    */
  private val KeyChunk = 1L << 44

  /** `df` + `keyCol` (the seeded hash) + `posCol` (this row's 1-based
    * position in the shuffled order). `idCol` can be any
    * xxhash64-hashable type but must be unique and non-null (it seeds
    * the key AND breaks hash ties — a duplicate id duplicates its key
    * and the order between the copies is undefined).
    * Downstream writes that want the rows PHYSICALLY in permutation
    * order add `.sortWithinPartitions(keyCol, id)` after a range or
    * shard repartition — this operator deliberately does not sort.
    */
  def permuted(
      df: DataFrame,
      seed: Long,
      idCol: Column,
      keyCol: String = "shuffle_key",
      posCol: String = "pos"): DataFrame =
    Budget.runningTotal(
      df.withColumn(keyCol, shuffleKey(seed, idCol)),
      col(keyCol), Seq(idCol), lit(1L), posCol, KeyChunk)

  /** Shuffle-then-shard: the curated corpus in seeded permutation
    * order, cut into fixed-token-budget training shards. Returns
    * `df` + `keyCol` + `cumCol` (running `weightCol` total in
    * permutation order) + `shardCol` (per
    * [[Budget.shardByTokenBudget]]'s (cum-1) DIV budget assignment —
    * contiguous in the SHUFFLED order, never splitting a document).
    * ONE full-data shuffle total; write with
    * `Budget.writeTokenShards(out, shardCol, col(keyCol), dir)`.
    */
  def shuffleShard(
      df: DataFrame,
      seed: Long,
      idCol: Column,
      weightCol: Column,
      shardBudget: Long,
      keyCol: String = "shuffle_key",
      shardCol: String = "shard_id",
      cumCol: String = "cum_tokens"): DataFrame = {
    require(shardBudget > 0,
      s"shuffleShard: shardBudget must be positive, got $shardBudget")
    Budget.requireIntegralWeight(df, weightCol, "shuffleShard")
    Budget.runningTotal(
      df.withColumn(keyCol, shuffleKey(seed, idCol)),
      col(keyCol), Seq(idCol), weightCol, cumCol, KeyChunk)
      .withColumn(shardCol,
        expr(s"greatest(`$cumCol` - 1L, 0L) div ${shardBudget}L"))
  }
}
