package graft.schema

import org.apache.spark.sql.types._

/** Canonical schema of the normalized access-log table.
  *
  * Mirrors the reference's implicit pandas schema: regex named capture
  * groups (reference parser.py:8-18) plus post-processing defaults
  * (parser.py:142-157) and derived pipeline columns
  * (dataframe.py:60-94, risk.py:96-100,392-394).
  */
object LogSchema {

  /** Columns produced by the parse stage (SURVEY §1.2, first table). */
  val parsed: StructType = StructType(Seq(
    StructField("source", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = true),
    StructField("method", StringType, nullable = true),
    StructField("request_uri", StringType, nullable = true),
    StructField("status", IntegerType, nullable = true),
    StructField("resp_size", LongType, nullable = true),
    StructField("referrer", StringType, nullable = true),
    StructField("user_agent", StringType, nullable = true),
    StructField("extra", StringType, nullable = true),
    StructField("time_taken", StringType, nullable = true),
    StructField("ip", StringType, nullable = true),
    StructField("format", StringType, nullable = true) // diagnostics: which pattern won
  ))

  /** Derived columns added by normalize/session/risk stages (SURVEY §1.2). */
  val derived: StructType = StructType(Seq(
    StructField("utc_timestamp", TimestampType, nullable = true),
    StructField("cluster", LongType, nullable = true),
    StructField("request_count", LongType, nullable = true),
    StructField("uri_risk", IntegerType, nullable = true),
    StructField("method_risk", IntegerType, nullable = true),
    StructField("status_risk", IntegerType, nullable = true),
    StructField("risk_score", DoubleType, nullable = true),
    StructField("rule_applied", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("tool_name", StringType, nullable = true),
    StructField("tool_desc", StringType, nullable = true)
  ))

  val full: StructType = StructType(parsed.fields ++ derived.fields)

  /** Normalized-dedup key (reference dataframe.py:163). */
  val dedupKey: Seq[String] = Seq(
    "timestamp", "ip", "method", "request_uri",
    "status", "resp_size", "user_agent", "referrer")
}

/** Typed row for the few operators that need Dataset[T] (tool scanner). */
final case class LogEvent(
    source: String,
    ip: String,
    cluster: Long,
    request_uri: String,
    epoch: Long,
    row_id: Long)
