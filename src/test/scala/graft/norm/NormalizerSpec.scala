package graft.norm

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class NormalizerSpec extends GraftSparkSpec {
  import spark.implicits._

  private val apacheTs = "21/Apr/2025:18:23:15 +1000"
  private val iisTs = "2025-04-21 08:23:15"

  test("C10: apache tz-offset and iis naive-utc timestamps (dataframe.py:215-237)") {
    val df = Seq(("a.log", apacheTs), ("b.log", iisTs)).toDF("source", "timestamp")
    val got = Normalizer.withUtcTimestamp(df)
      .select(col("utc_timestamp").cast("long")).collect().map(_.getLong(0)).toSeq
    // 2025-04-21T18:23:15+10:00 == 2025-04-21T08:23:15Z
    assert(got.toSet.size == 1)
  }

  test("C10 strict: unknown format is a hard error (dataframe.py:218-220)") {
    val df = Seq(("a.log", "21-04-2025 18:23")).toDF("source", "timestamp")
    val e = intercept[IllegalArgumentException](Normalizer.withUtcTimestamp(df))
    assert(e.getMessage.contains("unknown or invalid format"))
  }

  test("C11: time offset shifts by N seconds (dataframe.py:239-240)") {
    val df = Seq(("a.log", iisTs)).toDF("source", "timestamp")
    val base = Normalizer.withUtcTimestamp(df).select(col("utc_timestamp").cast("long")).head.getLong(0)
    val shifted = Normalizer.withUtcTimestamp(df, timeOffset = -3600)
      .select(col("utc_timestamp").cast("long")).head.getLong(0)
    assert(shifted == base - 3600)
  }

  private def dedupRows(rows: Seq[(String, String, String, String, Int, Long, String, String, Long)]) = {
    val df = rows.toDF("source", "timestamp", "ip", "method", "status",
      "resp_size", "user_agent", "referrer", "_row_id")
      .withColumn("request_uri", lit("/x"))
    Normalizer.removeDuplicates(df, col("_row_id")).select("_row_id")
      .collect().map(_.getLong(0)).toSet
  }

  test("D1 matrix: same-file repeats kept; cross-source non-first dropped (dataframe.py:188-195)") {
    // rows 0,1 identical in same source -> both kept
    // rows 2,3 identical across sources -> first kept, second dropped
    val kept = dedupRows(Seq(
      ("a.log", apacheTs, "1.1.1.1", "GET", 200, 5L, "ua", "-", 0L),
      ("a.log", apacheTs, "1.1.1.1", "GET", 200, 5L, "ua", "-", 1L),
      ("a.log", apacheTs, "2.2.2.2", "GET", 200, 5L, "ua", "-", 2L),
      ("b.log", apacheTs, "2.2.2.2", "GET", 200, 5L, "ua", "-", 3L)))
    assert(kept == Set(0L, 1L, 2L))
  }

  test("D1 normalization: case/whitespace/quotes fold into one key (dataframe.py:170-186)") {
    val kept = dedupRows(Seq(
      ("a.log", apacheTs, "1.1.1.1", "GET", 200, 5L, "\"UA x\"", "-", 0L),
      ("b.log", " " + apacheTs + " ", "1.1.1.1", "get", 200, 5L, "ua x", "-", 1L)))
    assert(kept == Set(0L))
  }

  test("D1: three sources, only first survives; mixed same-source repeats respected") {
    val kept = dedupRows(Seq(
      ("a.log", apacheTs, "3.3.3.3", "GET", 200, 5L, "ua", "-", 0L),
      ("a.log", apacheTs, "3.3.3.3", "GET", 200, 5L, "ua", "-", 1L),
      ("b.log", apacheTs, "3.3.3.3", "GET", 200, 5L, "ua", "-", 2L),
      ("c.log", apacheTs, "3.3.3.3", "GET", 200, 5L, "ua", "-", 3L)))
    // pandas: keep='first' keeps only row 0 of the key; 1,2,3 all dropped
    // because the group spans >1 source
    assert(kept == Set(0L))
  }
}
