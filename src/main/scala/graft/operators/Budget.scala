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
  * every row through one task, the exact shape Spark warns about and
  * the one thing that cannot survive 100 TB. [[takeWhileBudget]] is the
  * scalable two-phase formulation (same base-offset algebra as
  * `Sessionizer.withGlobalIds`):
  *
  *  1. `repartitionByRange(orderCol)` — ranges are assigned to
  *     ascending partition ids, so partition id order IS global order;
  *  2. per-partition running sums via a window PARTITIONED by the
  *     range-partition id (parallel, bounded by partition size);
  *  3. per-partition totals -> running offsets over the #partitions-row
  *     summary frame (a window over partition COUNT rows, not data
  *     rows);
  *  4. broadcast-join the offsets back and filter
  *     `offset + local_cum <= budget`.
  */
object Budget {

  /** Rows whose INCLUSIVE running `weightCol` total in ascending
    * `orderCol` order stays within `budget`, with the running total
    * appended as `cumCol`. `orderCol` must be unique per row (ties
    * would make the cut nondeterministic — use a row id).
    *
    * @param numPartitions range partitions for the cumsum phase; size
    *   so one partition's rows fit a task comfortably.
    */
  def takeWhileBudget(
      df: DataFrame,
      orderCol: Column,
      weightCol: Column,
      budget: Long,
      cumCol: String = "cum_weight",
      numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, s"takeWhileBudget: budget must be >= 0, got $budget")
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // spark_partition_id is evaluated AFTER the range exchange, so it
    // names the range bucket; the partition-id window then re-shuffles
    // by that id without breaking range order (ids are range-ordered by
    // construction of RangePartitioner)
    val ranged = df.repartitionByRange(n, orderCol)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_w", weightCol.cast("long"))
    val inPart = Window.partitionBy(col("_pid")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localCum = ranged.withColumn("_local_cum", sum(col("_w")).over(inPart))
    // summary frame: one row per range partition — the running offset
    // window runs over #partitions rows, never data rows. The explicit
    // single-partition key reuses the sessionizer's fold-proof trick
    // (an aggregate output is never constant to Catalyst).
    val totals = localCum.groupBy(col("_pid"))
      .agg(sum(col("_w")).as("_part_total"))
    val overParts = Window
      .partitionBy(coalesce(col("_part_total") * lit(0L), lit(0L)))
      .orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_base", coalesce(sum(col("_part_total")).over(overParts), lit(0L)))
      .select(col("_pid"), col("_base"))
    // offsets has numPartitions rows — always broadcastable
    localCum
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn(cumCol, col("_base") + col("_local_cum"))
      .filter(col(cumCol) <= budget)
      .drop("_pid", "_w", "_local_cum", "_base")
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
