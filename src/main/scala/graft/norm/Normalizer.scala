package graft.norm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C9/C10/C11 normalization + D1 cross-source dedup (SURVEY §2.5, §2.8).
  */
object Normalizer {

  /** Timestamp-format masks (reference dataframe.py:215-216). */
  val iisMask = "^\\d{4}-\\d{2}-\\d{2}\\s\\d{2}:\\d{2}:\\d{2}$"
  val apacheMask =
    "^\\d{2}/[A-Za-z]{3}/\\d{4}:\\d{2}:\\d{2}:\\d{2}\\s(?:[+-]\\d{4}|UTC|[A-Za-z]+)$"

  /** C10 — parse the raw text `timestamp` into `utc_timestamp`.
    *
    * Two formats (reference dataframe.py:222-240): Apache
    * `dd/MMM/yyyy:HH:mm:ss Z`, IIS `yyyy-MM-dd HH:mm:ss` assumed UTC
    * (session time zone is pinned to UTC). Unknown formats are a hard
    * error in the reference (dataframe.py:218-220); with `strict=true`
    * we fail fast if any row yields a null timestamp (costs one extra
    * action — disable for very large batch runs where the parse stage
    * already guarantees the format).
    *
    * C11 — `timeOffset` seconds are added for clock-skew correction
    * (reference dataframe.py:239-240).
    */
  def withUtcTimestamp(df: DataFrame, timeOffset: Long = 0, strict: Boolean = true): DataFrame = {
    val ts = col("timestamp")
    val parsed = when(ts.rlike(iisMask), try_to_timestamp(ts, lit("yyyy-MM-dd HH:mm:ss")))
      .when(ts.rlike(apacheMask), try_to_timestamp(ts, lit("dd/MMM/yyyy:HH:mm:ss Z")))
      .otherwise(lit(null).cast("timestamp"))
    val shifted =
      if (timeOffset == 0) parsed
      else parsed + expr(s"INTERVAL $timeOffset SECOND")
    val out = df.withColumn("utc_timestamp", shifted)
    if (strict) {
      val bad = out.filter(col("utc_timestamp").isNull).limit(5)
        .select(col("source"), col("timestamp")).collect()
      if (bad.nonEmpty) throw invalidTimestampError(bad)
    }
    out
  }

  /** The C10 hard-error, shared by the eager check above and the
    * staging-folded check ([[graft.Pipeline.writeStageChecked]]) so
    * both paths raise the byte-identical reference message
    * (dataframe.py:218-220).
    */
  def invalidTimestampError(bad: Array[org.apache.spark.sql.Row]): IllegalArgumentException =
    new IllegalArgumentException(
      "Found timestamps with an unknown or invalid format: " +
        bad.map(r => s"${r.get(0)}:'${r.get(1)}'").mkString(", "))

  /** C9 — the normalized copies of the 8 dedup-key columns
    * (reference dataframe.py:170-186): trim, lower, strip one wrapping
    * quote pair, literal 'nan' -> '', numeric coercion with 0-fill.
    * Applied to throwaway columns only — kept rows retain originals.
    */
  def normKey(name: String): Column = name match {
    case "status" | "resp_size" =>
      coalesce(col(name).cast("long"), lit(0L))
    case _ =>
      val c = lower(trim(col(name).cast("string")))
      val unquoted = regexp_replace(c, "^\"|\"$", "")
      when(unquoted === "nan", lit("")).otherwise(unquoted)
  }

  private val dedupKeyCols = Seq(
    "timestamp", "ip", "method", "request_uri",
    "status", "resp_size", "user_agent", "referrer")

  /** D1 — cross-source duplicate removal (reference dataframe.py:161-203).
    *
    * A row is dropped iff (a) it is a non-first occurrence of its
    * normalized 8-column key in `orderCol` order AND (b) the key group
    * spans more than one distinct `source`. Same-file exact repeats are
    * kept (they feed `request_count`).
    *
    * pandas `keep='first'` is input order; Spark needs the explicit
    * `orderCol` tiebreaker. Since duplicate rows agree on every key
    * column, the surviving copy differs observationally only in `source`
    * (and un-normalized case/whitespace) — callers pass a stable id
    * (per-file line number or `monotonically_increasing_id` captured at
    * parse time).
    *
    * Scale: one hash-shuffle on the normalized key; `collect_set(source)`
    * is bounded by the number of input files, not by group size.
    */
  def removeDuplicates(df: DataFrame, orderCol: Column): DataFrame = {
    val keyExprs = dedupKeyCols.map(c => normKey(c).as(s"_nk_$c"))
    val withKey = df.select(col("*") +: keyExprs: _*)
    val keyNames = dedupKeyCols.map(c => col(s"_nk_$c"))
    graft.operators.Dedup
      .exact(withKey, keyNames, orderCol, sourceCol = Some(col("source")))
      .drop(dedupKeyCols.map(c => s"_nk_$c"): _*)
  }
}
