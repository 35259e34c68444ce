package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for CPU-heavy NARROW passes (opt guide §2.6 —
  * idle capacity; the round-16 ProfileOne finding).
  *
  * The bench tables are single parquet files, so a scan plans ONE
  * partition and every narrow chain above it — text cleaning, lang-id,
  * fingerprint hashing, dense scoring — runs serialized on one core
  * while the other 31 idle (q65's stage-4 job: 4.9 s wall, 3.8 s cpu,
  * 1 task). AQE cannot help: it only coalesces, never widens, and its
  * byte estimates undercount rows that inflate in the projection (the
  * documented denseFrom trap). `widen` inserts one explicit
  * round-robin repartition to the target width — user-specified
  * partitioning, so AQE keeps it — gated ONLY by the plan-stats byte
  * guard below: a SMALL frame (<= `spark.graft.widen.maxBytes`) is
  * repartitioned to exactly `target` partitions whatever its current
  * width (a clamp, not a floor — a small frame already wider than the
  * target is reshuffled down to it, which is harmless at guard-sized
  * bytes). Current partition count is deliberately NOT consulted:
  * asking an unexecuted AQE frame for it forces hidden materialization
  * (see the guard comment in [[widen]]).
  *
  * 100 TB shape: a real corpus scan reports file-scale plan bytes, so
  * the byte guard fails and widen is the identity — no payload shuffle
  * is ever added at scale (a stats UNDERestimate on a big frame would
  * add one 8-way shuffle; scans report file bytes, so the risky
  * estimates sit above exchanges where widen is not applied).
  * The target derives from the
  * runtime (`defaultParallelism` = total cores on a cluster, the
  * local[n] core count under the bench contract), overridable via
  * `spark.graft.widen.parallelism`; <= 1 disables.
  *
  * Content-safe by construction: round-robin repartition reorders rows
  * but changes no values, and Spark's sort-before-repartition (on by
  * default, SPARK-23207) keeps the row→partition assignment
  * deterministic under retries. Callers must still be
  * partition-agnostic — do NOT widen above `spark_partition_id`,
  * `monotonically_increasing_id`, seeded `rand`, or input_file_name
  * consumers (the operators here already ban those as shuffle keys).
  */
object Widen {
  /** Key-preserving widen: hash-repartition to the target width on
    * `keys` so a window/aggregation partitioned by those keys reuses
    * the exchange (no second shuffle) instead of letting AQE coalesce
    * its own exchange to one task at bench-scale bytes. Same byte
    * guard and target as [[widen]]; identity above the guard, so the
    * 100 TB path keeps AQE's sizing of the operator's own exchange.
    */
  def widenBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = targetOf(df)
    if (target <= 1) df
    else if (isSmall(df)) df.repartition(target, keys: _*)
    else df
  }
  /** Default width cap. Full-core fan-out measured NET NEGATIVE at
    * bench scale: the heavy text expressions pay ~150 ms of per-task
    * initialization (codegen + regex automata), so 32 tasks of 0.1 s
    * of real work burn 5x the serialized CPU (q65's stage-4 cpu went
    * 3.8 -> 17 s wide; q118 regressed 4 -> 18.5 s). Width 6-8 splits
    * the multi-second serialized stages while paying single-digit
    * inits — q65 12.1 -> 8.4 s, q118 4.0 -> 3.3 s in the same-box
    * worktree A/B. Override per deployment via
    * `spark.graft.widen.parallelism`.
    */
  val DefaultMaxWiden = 8

  def widen(df: DataFrame): DataFrame = {
    val target = targetOf(df)
    if (target <= 1) df
    else if (isSmall(df)) df.repartition(target)
    else df
  }

  private def targetOf(df: DataFrame): Int = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.widen.parallelism")
      .map(_.toInt)
      .getOrElse(math.min(DefaultMaxWiden, spark.sparkContext.defaultParallelism))
  }

  // size guard from PLAN STATS, not .rdd.getNumPartitions: asking a
  // frame with unexecuted exchanges for its partitions forces AQE
  // to materialize every query stage eagerly (a hidden extra
  // execution), while optimizedPlan.stats is planning-only. Scans
  // report file bytes; joins/windows propagate conservatively
  // upward, and an OVERestimate merely skips the optimization. At
  // corpus scale sizeInBytes is huge, the guard fails, and widen
  // is the identity — no shuffle is added to the 100 TB path.
  private def isSmall(df: DataFrame): Boolean = {
    val maxBytes = df.sparkSession.conf.getOption("spark.graft.widen.maxBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)
    try df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes
    catch { case scala.util.control.NonFatal(_) => false }
  }
}
