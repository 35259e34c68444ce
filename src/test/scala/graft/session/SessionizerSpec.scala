package graft.session

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class SessionizerSpec extends GraftSparkSpec {
  import spark.implicits._

  private def mk(rows: (String, String, Long)*) =
    rows.toSeq.toDF("source", "ip", "ep")
      .withColumn("utc_timestamp", col("ep").cast("timestamp"))

  private def clusters(rows: (String, String, Long)*): Map[Long, Long] = {
    Sessionizer.withClusters(mk(rows: _*))
      .select(col("ep"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("no window in the sessionize plan is ever unpartitioned (fold-proof key holds)") {
    // withGlobalIds pins the per-source-totals window to an explicit
    // single hash partition via `_src_total * 0`, which works only while
    // Catalyst can't constant-fold an aggregate output. If a future
    // optimizer rule learns that null-safe x*0 rewrite, the window
    // silently reverts to unpartitioned — same values, lost scaling
    // guarantee. This asserts it loudly at the optimized-plan level.
    val df = Sessionizer.withClusters(mk(
      ("a", "1.1.1.1", 1000L), ("a", "1.1.1.1", 2000L), ("b", "2.2.2.2", 1500L)))
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected Window nodes in the sessionize plan")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window leaked into the sessionize plan:\n$w"))
  }

  test("W1 boundary: delta 59 same / 60 new / 61 new (dataframe.py:630-635)") {
    val c = clusters(
      ("a", "1.1.1.1", 1000L),
      ("a", "1.1.1.1", 1059L), // +59 -> same
      ("a", "1.1.1.1", 1119L), // +60 -> new
      ("a", "1.1.1.1", 1180L)) // +61 -> new
    assert(c(1000L) == c(1059L))
    assert(c(1059L) != c(1119L))
    assert(c(1119L) != c(1180L))
  }

  test("W1 ids are dense, 0-based, in (source, ip, localId) order (factorize parity)") {
    val c = clusters(
      ("b", "2.2.2.2", 5000L),
      ("a", "1.1.1.1", 1000L),
      ("a", "1.1.1.1", 2000L), // new session, same group
      ("a", "9.9.9.9", 1500L))
    // lexicographic (source, ip, localId): (a,1.1.1.1,0)=0 (a,1.1.1.1,1)=1
    // (a,9.9.9.9,0)=2 (b,2.2.2.2,0)=3
    assert(c(1000L) == 0 && c(2000L) == 1 && c(1500L) == 2 && c(5000L) == 3)
  }

  test("A1: request_count per (source, ip, cluster, method, uri) (dataframe.py:70-89)") {
    val df = Seq(
      ("a", "1.1.1.1", 0L, "GET", "/x"),
      ("a", "1.1.1.1", 0L, "GET", "/x"),
      ("a", "1.1.1.1", 0L, "GET", "/y"),
      ("a", "1.1.1.1", 1L, "GET", "/x"))
      .toDF("source", "ip", "cluster", "method", "request_uri")
    val got = Sessionizer.withRequestCount(df)
      .groupBy(col("request_uri"), col("cluster")).agg(max("request_count").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("/x", 0L)) == 2 && got(("/y", 0L)) == 1 && got(("/x", 1L)) == 1)
  }
}
