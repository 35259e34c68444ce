package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.session.Sessionizer

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared done in SURVEY §2 has a `queries` entry (run
  * by Verify/Bench against the driver's parquet tables) and, where
  * ANSI-SQL-expressible, a DuckDB `oracleSql` twin. Column names/aliases
  * match pairwise — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) in the driver's parquet; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a nanos
    * long. Convert with integer division (a double division would lose
    * precision above 2^53 nanos).
    */
  def eventsTable(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the real log pipeline over synthetic apache lines generated
    * from the events table (parse -> normalize -> sessionize -> risk).
    */
  def entry(spark: SparkSession): DataFrame =
    Flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-style aggregation (hash agg, partial+final)
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("cnt"))
    }),

    // J1/A1 — request_count as a window count (no self-join)
    "q2_window_count" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
      eventsTable(s, dir)
        .select(col("event_id"), count(lit(1)).over(w).as("request_count"))
    }),

    // join shape (broadcast dim + shuffled fact agg)
    "q3_join" -> ((s, dir) => {
      val orders = table(s, dir, "orders")
      val cust = table(s, dir, "customer")
      val li = table(s, dir, "lineitem")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
    }),

    // W1 — time-gap sessionization over the events table
    "q4_sessionize" -> ((s, dir) => {
      val logs = eventsTable(s, dir).select(
        col("event_id"),
        col("event_type").as("source"),
        col("user_id").cast("string").as("ip"),
        col("ts").as("utc_timestamp"))
      Sessionizer.withClusters(logs, threshold = 300L)
        .select(col("event_id"), col("cluster"))
    }),

    // filter surface F1/F5/F6 over events
    "q5_filter" -> ((s, dir) => {
      eventsTable(s, dir)
        .filter(col("event_type").isin("click", "view") &&
          col("value") >= 5.0 && col("value") <= 50.0 &&
          col("ts") >= lit("2024-01-01 12:00:00").cast("timestamp"))
        .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_window_count" ->
      """SELECT event_id,
        |  count(*) OVER (PARTITION BY user_id, event_type) AS request_count
        |FROM events""".stripMargin,

    "q3_join" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q4_sessionize" ->
      """WITH logs AS (
        |  SELECT event_id, event_type AS source, CAST(user_id AS VARCHAR) AS ip,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ep
        |  FROM events),
        |lagged AS (
        |  SELECT *, CASE WHEN ep - lag(ep) OVER w >= 300 THEN 1 ELSE 0 END AS new_s
        |  FROM logs WINDOW w AS (PARTITION BY source, ip ORDER BY ep, event_id)),
        |sess AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY source, ip ORDER BY ep, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS local_id
        |  FROM lagged),
        |keys AS (SELECT DISTINCT source, ip, local_id FROM sess),
        |numbered AS (
        |  SELECT source, ip, local_id,
        |         row_number() OVER (ORDER BY source, ip, local_id) - 1 AS cluster
        |  FROM keys)
        |SELECT s.event_id, n.cluster
        |FROM sess s JOIN numbered n USING (source, ip, local_id)""".stripMargin,

    "q5_filter" ->
      """SELECT event_id, event_type, round(value, 2) AS value
        |FROM events
        |WHERE event_type IN ('click', 'view')
        |  AND value >= 5.0 AND value <= 50.0
        |  AND ts >= TIMESTAMP '2024-01-01 12:00:00'""".stripMargin
  )
}
