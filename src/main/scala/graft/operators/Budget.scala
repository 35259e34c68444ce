package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus budgeting operators: cut a deterministically-ordered corpus
  * at a global weight budget (the "fill a 1T-token training mix" step)
  * and cap rows per group (per-domain/source quotas).
  *
  * The budget cut needs a GLOBAL running sum in `orderCol` order. The
  * naive `sum().over(Window.orderBy(o))` is an unpartitioned window —
  * every row through one task, the one shape that cannot survive
  * 100 TB. A first cut of this operator range-partitioned and keyed on
  * `spark_partition_id()`, but the totals branch then re-ran the range
  * exchange on every row (plan audit: two full-data shuffles, no
  * exchange reuse). This formulation uses the repo's chunking idiom
  * (asofBackwardChunked, withClustersChunked) instead — the bucket is
  * a PURE FUNCTION of the order column, so no pass needs a second
  * full-data shuffle:
  *
  *  1. bucket = `orderCol DIV chunkSize` (numeric order column;
  *     bucket order == global order by construction);
  *  2. running sums WITHIN each bucket: one hash shuffle + bounded
  *     per-bucket sort;
  *  3. per-bucket totals from the RAW frame: map-side partial
  *     aggregate on the scan — only #buckets summary rows shuffle;
  *  4. running offsets over the #buckets-row summary frame (window
  *     over bucket count, not data rows; fold-proof constant key);
  *  5. join offsets back on bucket (AQE broadcasts the small side —
  *     same no-hint policy as the sessionizer) and filter
  *     `offset + local_cum <= budget`.
  *
  * The input is read twice (steps 2 and 3) — the unavoidable two
  * passes of a distributed prefix sum without materializing an
  * intermediate — but the second pass collapses into its scan's
  * partial aggregate instead of re-shuffling data rows.
  */
object Budget {

  /** Rows whose INCLUSIVE running `weightCol` total in ascending
    * `orderCol` order stays within `budget`, with the running total
    * appended as `cumCol`. `orderCol` must be numeric-castable, unique
    * and non-null per row (ties would make the cut nondeterministic —
    * use a row id). `weightCol` values must be >= 0: the
    * `cum <= budget` filter is a true take-while prefix only when the
    * running sum is monotone — a negative weight would let later rows
    * re-enter the budget and the kept set would no longer be a
    * contiguous prefix of the order.
    *
    * @param chunkSize bucket width in `orderCol` units. Trades the
    *   per-task sort (one bucket's rows) against the summary frame
    *   (#buckets rows); with dense ids, `chunkSize` rows per bucket
    *   and `n / chunkSize` summary rows.
    */
  def takeWhileBudget(
      df: DataFrame,
      orderCol: Column,
      weightCol: Column,
      budget: Long,
      cumCol: String = "cum_weight",
      chunkSize: Long = 100000L): DataFrame = {
    require(budget >= 0, s"takeWhileBudget: budget must be >= 0, got $budget")
    require(chunkSize > 0, s"takeWhileBudget: chunkSize must be positive, got $chunkSize")
    requireIntegralWeight(df, weightCol, "takeWhileBudget")
    runningTotal(df, orderCol, Nil, weightCol, cumCol, chunkSize)
      .filter(col(cumCol) <= budget)
  }

  /** The distributed prefix sum behind [[takeWhileBudget]] and
    * [[shardByTokenBudget]]: `df` with the INCLUSIVE running
    * `weightCol` total in ascending (`orderCol`, `tiebreak*`) order
    * appended as `cumCol`. `orderCol` must be numeric-castable (it is
    * also the chunking key); (`orderCol`, tiebreak) must be unique and
    * non-null per row. The plan shape is documented on the object:
    * ONE full-data hash shuffle, a summary-frame window, and an
    * AQE-broadcastable join back.
    *
    * `tiebreak` exists for hash-ordered passes ([[CorpusOrder]]): the
    * bucket is a function of `orderCol` alone, but the within-bucket
    * sort appends the tiebreak columns so equal hash keys still have a
    * deterministic global order.
    */
  private[operators] def runningTotal(
      df: DataFrame,
      orderCol: Column,
      tiebreak: Seq[Column],
      weightCol: Column,
      cumCol: String,
      chunkSize: Long): DataFrame = {
    // floor(double) is weakly monotone in orderCol even past 2^53
    // (round-to-double, /positive, floor are each monotone), which is
    // the only property the cut needs from the bucketing; true floor
    // also keeps negative ids ordered (floor(-3/2) = -2)
    val bucket = floor(orderCol.cast("double") / chunkSize).cast("long")
    val inBucket = Window.partitionBy(col("_bkt"))
      .orderBy(orderCol +: tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localCum = df
      .withColumn("_bkt", bucket)
      .withColumn("_w", coalesce(weightCol.cast("long"), lit(0L)))
      .withColumn("_local_cum", sum(col("_w")).over(inBucket))
    // totals fork from the RAW frame: partial aggregation runs inside
    // the scan stage, so this pass shuffles #buckets rows, not data
    val totals = df
      .select(bucket.as("_bkt"), coalesce(weightCol.cast("long"), lit(0L)).as("_w"))
      .groupBy(col("_bkt"))
      .agg(sum(col("_w")).as("_bkt_total"))
    // running offsets over the summary frame — a window over #buckets
    // rows. The explicit single-partition key reuses the sessionizer's
    // fold-proof trick (an aggregate output is never constant to
    // Catalyst), so it can't silently become an unpartitioned window.
    val overBuckets = Window
      .partitionBy(coalesce(col("_bkt_total") * lit(0L), lit(0L)))
      .orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_base", coalesce(sum(col("_bkt_total")).over(overBuckets), lit(0L)))
      .select(col("_bkt"), col("_base"))
    // no broadcast hint: #buckets is usually tiny but data-dependent —
    // AQE broadcasts when the measured size allows, else a shuffled
    // join (never a driver OOM)
    localCum
      .join(offsets, Seq("_bkt"))
      .withColumn(cumCol, col("_base") + col("_local_cum"))
      .drop("_bkt", "_w", "_local_cum", "_base")
  }

  /** Token-bounded output sharding — the MATERIALIZE-FOR-TRAINING step
    * that ends a real curation run: assign each document a shard id so
    * that consecutive documents (in ascending `orderCol` order) fill
    * each shard up to `shardBudget` weight before the next shard
    * starts. Returns `df` + `cumCol` (inclusive running total) +
    * `shardCol` where
    *
    *   shard_id = (cum_weight - 1) DIV shardBudget   (clamped at 0)
    *
    * i.e. shard s holds the rows whose running total lies in
    * (s*B, (s+1)*B]. Every shard's total weight is <= shardBudget
    * + (its first row's weight - 1): a document NEVER splits across
    * shards, so a row heavier than the budget gets a shard of its own
    * (and zero-weight rows ride along with their predecessor's shard).
    * Shard ids are dense from 0 while weights are positive.
    *
    * Same contract as [[takeWhileBudget]]: `orderCol` numeric, unique,
    * non-null; weights integral and >= 0 (negative weights would break
    * the monotone running sum that makes shards contiguous).
    *
    * 100 TB shape: rides [[runningTotal]]'s ONE full-data shuffle —
    * the shard assignment itself is a row-local projection on top, no
    * new exchange (verified by the ShardingSpec plan audit). Write
    * with [[writeTokenShards]].
    */
  def shardByTokenBudget(
      df: DataFrame,
      orderCol: Column,
      weightCol: Column,
      shardBudget: Long,
      shardCol: String = "shard_id",
      cumCol: String = "cum_tokens",
      chunkSize: Long = 100000L): DataFrame = {
    require(shardBudget > 0,
      s"shardByTokenBudget: shardBudget must be positive, got $shardBudget")
    require(chunkSize > 0,
      s"shardByTokenBudget: chunkSize must be positive, got $chunkSize")
    requireIntegralWeight(df, weightCol, "shardByTokenBudget")
    runningTotal(df, orderCol, Nil, weightCol, cumCol, chunkSize)
      // integral DIV, not floating /: cum can exceed 2^53 at corpus
      // scale where a double quotient would round. greatest(..,0)
      // covers leading zero-weight rows (cum = 0 -> shard 0).
      .withColumn(shardCol,
        expr(s"greatest(`$cumCol` - 1L, 0L) div ${shardBudget}L"))
  }

  /** Write a sharded frame as one directory per shard
    * (`outDir/<shardCol>=N/...`), each shard's rows in ascending
    * `orderCol` order within its files — the training-shard layout a
    * loader streams sequentially. One hash exchange on the shard id
    * (so each shard is written by exactly one task — without it every
    * input task would emit a file into every shard directory, file
    * count = tasks x shards); a shard is at most `shardBudget` tokens,
    * so the per-task sort is bounded by construction.
    */
  def writeTokenShards(
      df: DataFrame,
      shardCol: String,
      orderCol: Column,
      outDir: String): Unit =
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), orderCol)
      .write.partitionBy(shardCol).mode("overwrite").parquet(outDir)

  /** Per-GROUP budget cut: within each `groupCols` group, keep rows in
    * ascending `orderCol` order while the group's inclusive running
    * `weightCol` total stays within `budget` (per-language token
    * budgets — the mix-spec form of [[takeWhileBudget]]). Unlike the
    * global cut this needs no two-phase trick: the window partitions
    * by group, so it is ONE hash shuffle with per-group bounded sorts
    * (a pathologically hot group degrades that group's task, not the
    * job — for a single giant group use [[takeWhileBudget]] on it).
    * `orderCol` must be unique within a group; `weightCol` values must
    * be >= 0 (see [[takeWhileBudget]] — negative weights break the
    * prefix property of the cut).
    */
  def takeWhileBudgetPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      orderCol: Column,
      weightCol: Column,
      budget: Long,
      cumCol: String = "cum_weight"): DataFrame = {
    require(budget >= 0, s"takeWhileBudgetPerGroup: budget must be >= 0, got $budget")
    require(groupCols.nonEmpty, "takeWhileBudgetPerGroup: need at least one group column")
    requireIntegralWeight(df, weightCol, "takeWhileBudgetPerGroup")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(cumCol, sum(coalesce(weightCol.cast("long"), lit(0L))).over(w))
      .filter(col(cumCol) <= budget)
  }

  /** [[takeWhileBudgetPerGroup]] with PER-GROUP budgets carried in a
    * column (join the plan — e.g. [[Mixture.waterFill]] allocations —
    * onto the rows first): keep a group's rows while its running
    * weight total stays within ITS budget. Same one-shuffle shape.
    */
  def takeWhileBudgetPerGroupVar(
      df: DataFrame,
      groupCols: Seq[Column],
      orderCol: Column,
      weightCol: Column,
      budgetCol: Column,
      cumCol: String = "cum_weight"): DataFrame = {
    require(groupCols.nonEmpty,
      "takeWhileBudgetPerGroupVar: need at least one group column")
    requireIntegralWeight(df, weightCol, "takeWhileBudgetPerGroupVar")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(cumCol, sum(coalesce(weightCol.cast("long"), lit(0L))).over(w))
      .filter(col(cumCol) <= budgetCol.cast("long"))
  }

  /** Weights must be an integral type: a silent fractional cast would
    * truncate BEFORE summation (0.9 -> 0) and make the cut keep far
    * more than the true weighted budget — round/scale fractional
    * weights explicitly first. Null weights count as 0 (the row is
    * kept free); resolved at plan time, no job runs.
    */
  private[operators] def requireIntegralWeight(df: DataFrame, weightCol: Column, api: String): Unit = {
    val dt = df.select(weightCol).schema.head.dataType
    require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
      s"$api: weight column must be an integral type, got ${dt.typeName}; " +
        "round or rescale fractional weights explicitly before the cut")
  }

  /** At most `quota` rows per `groupCols` group, keeping the first rows
    * in ascending `orderCol` order (per-domain/source caps — the
    * anti-over-representation step of a corpus mix). One hash shuffle
    * on the group key; `orderCol` ties inside a group are broken
    * arbitrarily, so pass a unique id for determinism.
    */
  def quotaPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      orderCol: Column,
      quota: Int): DataFrame = {
    require(quota > 0, s"quotaPerGroup: quota must be positive, got $quota")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= quota)
      .drop("_rn")
  }
}
