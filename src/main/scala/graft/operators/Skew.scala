package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation utilities (SURVEY §7.4.7).
  *
  * Most skew is already handled without help: hash aggregation does
  * map-side partial aggregation (a hot key reduces to one row per
  * input partition before the shuffle), and AQE splits oversized
  * shuffle partitions for sort-merge joins at runtime. The case that
  * remains is a hot-key equi-join the planner executes as a broadcast
  * or whose single key exceeds what AQE's split granularity can
  * balance: [[saltedJoin]] shards each big-side row into one of
  * `salts` sub-keys and replicates the matching small-side rows across
  * all shards, so one pathological key (the one scanner IP with a
  * billion rows) spreads over `salts` tasks.
  *
  * The result is row-for-row equal to the plain inner join
  * (SkewSpec pins this): each big row joins the small rows carrying
  * its own salt replica, exactly once.
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `keys`,
    * sharded `salts` ways; the small side is exploded `salts`-fold
    * (multiplying the SMALL side only — keep it the dimension side).
    *
    * The big side's salt is a DETERMINISTIC hash of the whole row. A
    * row-position salt (`monotonically_increasing_id`, `rand`) would
    * also spread byte-identical rows, but a nondeterministic value used
    * as a shuffle key is unsafe under partial stage retry: re-executed
    * map tasks can re-salt rows into shuffle partitions that other
    * reducers already fetched — rows silently dropped or duplicated
    * (the SPARK-23207 failure class). The price of determinism:
    * byte-identical copies of a row share a salt and do NOT spread. No
    * deterministic function can separate indistinguishable rows — if
    * your hot key is literal repeats of one line, aggregate them first
    * (count per distinct row) and join the distinct rows instead.
    */
  /** Key-skew diagnosis — "find the hot keys before they find you":
    * top-k keys by row count with their x10000 share of the table and
    * a deterministic rank (count desc, key asc). The report that
    * decides whether a join needs [[saltedJoin]] or a two-tier apply
    * (the ParagraphDedup/hot-key discipline) BEFORE the 16-hour job
    * discovers it the hard way.
    *
    * 100 TB shape: one map-side-combined count per key, then the
    * global top-k rides Spark's rank-limit pushdown
    * (TakeOrderedAndProject / WindowGroupLimit — the q145-pinned
    * plan shape), never a one-task global sort.
    */
  def keySkewReport(df: DataFrame, keyCol: Column, topK: Int = 20): DataFrame = {
    require(topK > 0, "keySkewReport: topK must be positive")
    val counts = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("_sk_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_x10000",
        expr("CAST(n * 10000 DIV _sk_total AS BIGINT)"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("key").asc)))
      .filter(col("rank") <= topK)
      .select(col("key").cast("string").as("key"), col("n"),
        col("share_x10000"), col("rank"))
  }

  def saltedJoin(
      big: DataFrame, small: DataFrame,
      keys: Seq[String], salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltCol = "__graft_salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"inputs must not already have a $saltCol column")
    val bigSalted = big.withColumn(saltCol,
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts.toLong)))
    val smallSalted = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigSalted
      .join(smallSalted, keys :+ saltCol)
      .drop(saltCol)
  }
}
