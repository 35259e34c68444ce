package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** W2 boundary matrix (FIXTURES §3.4): 99 vs 100 burst rows; 1.0 s gaps
  * stay in-burst, 1.01 s splits; success tag ignores method; overwrite is
  * unconditional.
  */
class BurstDetectorSpec extends GraftSparkSpec {
  import spark.implicits._

  private def mkDf(rows: Seq[(String, String, Long, String, String, Double, Double)]) =
    rows.toDF("source", "ip", "cluster", "request_uri", "method", "ep", "risk_in")
      .withColumn("utc_timestamp", timestamp_micros((col("ep") * 1e6).cast("long")))
      .withColumn("status", when(col("risk_in") < 0, 200).otherwise(500))
      .withColumn("risk_score", lit(10.0))
      .withColumn("rule_applied", lit("prior"))
      .drop("ep", "risk_in")

  private def burstRows(n: Int, gap: Double, start: Double = 0.0) =
    (0 until n).map(i => ("a", "1.1.1.1", 0L, "/u", "POST", start + i * gap, 1.0))

  test("100 rows at 1.0s gaps qualify; success row AFTER min_time tagged (risk.py:335-377)") {
    val success = Seq(("a", "1.1.1.1", 0L, "/u", "GET", 150.0, -1.0)) // status 200, different method!
    val out = BurstDetector(mkDf(burstRows(100, 1.0) ++ success), minRequests = 100)
    val tagged = out.filter(col("status") === 200).select("risk_score", "rule_applied").head
    assert(tagged.getDouble(0) == 95.0)
    assert(tagged.getString(1) == BurstDetector.RuleTitle)
    // 500 rows untouched
    assert(out.filter(col("status") === 500 && col("risk_score") === 10.0).count() == 100)
  }

  test("99 rows do not qualify") {
    val success = Seq(("a", "1.1.1.1", 0L, "/u", "GET", 150.0, -1.0))
    val out = BurstDetector(mkDf(burstRows(99, 1.0) ++ success), minRequests = 100)
    assert(out.filter(col("risk_score") === 95.0).count() == 0)
  }

  test("1.01s gaps split bursts -> no qualification") {
    val success = Seq(("a", "1.1.1.1", 0L, "/u", "GET", 250.0, -1.0))
    val out = BurstDetector(mkDf(burstRows(100, 1.01) ++ success), minRequests = 100)
    assert(out.filter(col("risk_score") === 95.0).count() == 0)
  }

  test("success row BEFORE burst start is not tagged (ts >= min_time)") {
    val success = Seq(("a", "1.1.1.1", 0L, "/u", "GET", 10.0, -1.0))
    val out = BurstDetector(mkDf(burstRows(100, 1.0, start = 20.0) ++ success), minRequests = 100)
    assert(out.filter(col("risk_score") === 95.0).count() == 0)
  }

  test("different uri/cluster not tagged") {
    val success = Seq(
      ("a", "1.1.1.1", 0L, "/other", "GET", 150.0, -1.0),
      ("a", "1.1.1.1", 1L, "/u", "GET", 150.0, -1.0))
    val out = BurstDetector(mkDf(burstRows(100, 1.0) ++ success), minRequests = 100)
    assert(out.filter(col("risk_score") === 95.0).count() == 0)
  }
}
