package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W2 — Burp-Intruder burst detection (reference `burp_intruder`,
  * risk.py:335-382).
  *
  * On the `status == 500` subset: per
  * `(source, ip, cluster, request_uri, method)` in event-time order,
  * an inter-arrival gap strictly greater than `maxGapSeconds` starts a
  * new burst; bursts with >= `minRequests` rows qualify. Then ANY row in
  * the full table with `status == 200`, the same
  * `(source, ip, cluster, request_uri)` — method deliberately NOT
  * checked (risk.py:369-372) — and `ts >= burst min_time` gets
  * `risk_score = 95.0` / the fixed rule title, UNCONDITIONALLY
  * overwriting whatever the rule engine set (risk.py:376-377).
  *
  * Scale: the burst scan shuffles only the 500-status subset; qualifying
  * bursts are reduced to one `min(min_time)` row per
  * `(source, ip, cluster, request_uri)` — a tiny table that Catalyst
  * broadcast-joins back against the full frame (an existence check at
  * `ts >= min_time` is equivalent to checking every individual burst).
  */
object BurstDetector {

  val RuleTitle = "Attack Success After High-Frequency Server Failures"

  def apply(
      df: DataFrame,
      riskScore: Double = 95.0,
      minRequests: Long = 100,
      maxGapSeconds: Double = 1.0): DataFrame = {

    val s500 = df.filter(col("status") === 500)
      .select("source", "ip", "cluster", "request_uri", "method", "utc_timestamp")

    val grp = Window
      .partitionBy(col("source"), col("ip"), col("cluster"), col("request_uri"), col("method"))
      .orderBy(col("utc_timestamp"))

    val micros = unix_micros(col("utc_timestamp"))
    val gap = (micros - lag(micros, 1).over(grp)).cast("double") / 1e6
    val newBurst = when(gap > maxGapSeconds, 1L).otherwise(0L) // first row: null gap -> 0
    val withBurst = s500
      .withColumn("_burst_id",
        sum(newBurst).over(grp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val bursts = withBurst
      .groupBy(col("source"), col("ip"), col("cluster"), col("request_uri"), col("method"), col("_burst_id"))
      .agg(count(lit(1)).as("_burst_count"), min(col("utc_timestamp")).as("_min_time"))
      .filter(col("_burst_count") >= minRequests)

    // any burst with min_time <= ts matches  <=>  the earliest qualifying
    // burst's min_time <= ts; method drops out of the key here on purpose.
    val earliest = bursts
      .groupBy(col("source"), col("ip"), col("cluster"), col("request_uri"))
      .agg(min(col("_min_time")).as("_min_time"))

    val joined = df.join(
      broadcast(earliest.withColumnRenamed("request_uri", "_b_uri")
        .withColumnRenamed("source", "_b_source")
        .withColumnRenamed("ip", "_b_ip")
        .withColumnRenamed("cluster", "_b_cluster")),
      col("source") === col("_b_source") && col("ip") === col("_b_ip") &&
        col("cluster") === col("_b_cluster") && col("request_uri") === col("_b_uri"),
      "left")

    val hit = col("status") === 200 && col("_min_time").isNotNull &&
      col("utc_timestamp") >= col("_min_time")

    joined
      .withColumn("risk_score", when(hit, lit(riskScore)).otherwise(col("risk_score")))
      .withColumn("rule_applied", when(hit, lit(RuleTitle)).otherwise(col("rule_applied")))
      .drop("_b_source", "_b_ip", "_b_cluster", "_b_uri", "_min_time")
  }
}
