package graft.session

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** The skew-proof two-phase sessionizer must be observationally
  * IDENTICAL to the single-scan one — same dense ids, same grouping —
  * across chunk sizes, including chunks that split sessions.
  */
class SessionizerChunkedSpec extends GraftSparkSpec {
  import spark.implicits._

  private def logsFrame = {
    val ev = graft.SparkEntry.eventsTable(spark, "/root/testdata/sf0.001")
    ev.select(
      col("event_id"),
      col("event_type").as("source"),
      col("user_id").cast("string").as("ip"),
      col("ts").as("utc_timestamp"))
  }

  private def clusterMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("event_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chunked == single-scan on real events for several chunk sizes") {
    val base = clusterMap(Sessionizer.withClusters(logsFrame, threshold = 300L))
    for (chunk <- Seq(300L, 3600L, 86400L)) {
      val chunked = clusterMap(
        Sessionizer.withClustersChunked(logsFrame, threshold = 300L, chunkSeconds = chunk))
      assert(chunked == base, s"chunkSeconds=$chunk diverged")
    }
  }

  test("boundary-split session is re-merged (hand fixture)") {
    // session spans a 3600s chunk boundary: 3590, 3620 (gap 30 < 60)
    val df = Seq(
      ("a", "1.1.1.1", 3590L), ("a", "1.1.1.1", 3620L), // one session across chunks 0/1
      ("a", "1.1.1.1", 4000L),                          // gap 380 -> new session
      ("a", "2.2.2.2", 100L))
      .toDF("source", "ip", "ep")
      .withColumn("utc_timestamp", col("ep").cast("timestamp"))
    val single = Sessionizer.withClusters(df, 60L)
      .select("ep", "cluster").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunked = Sessionizer.withClustersChunked(df, 60L, 3600L)
      .select("ep", "cluster").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunked == single)
    assert(chunked(3590L) == chunked(3620L))
    assert(chunked(3620L) != chunked(4000L))
  }
}
