package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl politeness scheduling — the step between frontier filtering
  * ([[RobotsGate]], [[Blocklist]]) and fetching: every URL gets a
  * per-host FETCH SLOT (0-based sequence number within its host) and a
  * fetch time `slot · crawl_delay(host)`, so the fetcher can stream
  * the frontier in slot order without ever hitting one host faster
  * than its robots crawl-delay allows.
  *
  * Within-host order is the md5 of the URL — deterministic fair
  * queueing (no path-prefix run monopolizes a host's early slots), and
  * an order both engines express identically.
  *
  * 100 TB shape: a per-host `row_number` window serializes the hottest
  * host (10^8-URL domains exist in every crawl) into one task — the
  * q17-sessionizer lesson. The slot is therefore computed two-phase
  * over md5-prefix buckets, ordered consistently with the full md5
  * (fixed-width lowercase hex: prefix-integer order = string order):
  * per-(host, bucket) counts reduce with map-side combine, per-host
  * bucket offsets ride a ≤ 2^(4·`bucketHexChars`)-row window, and the
  * in-bucket rank window is bounded by hotHost/nBuckets rows per task.
  * CrawlSchedulerSpec pins the two-phase slot EQUAL to the naive
  * per-host window's on every partitioning; raise `bucketHexChars`
  * when hotHost/256 itself exceeds a task (the same dial as the
  * chunked sessionizer's chunk width).
  */
object CrawlScheduler {

  /** (urlCols..., host, fetch_slot, fetch_time_ms). `delays` is the
    * per-host (host, delay_ms) table (from robots crawl-delay; hosts
    * absent there get `defaultDelayMs`).
    */
  def schedule(
      urls: DataFrame, hostCol: String, urlCol: String,
      delays: DataFrame, defaultDelayMs: Long = 1000L,
      bucketHexChars: Int = 2): DataFrame = {
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      s"schedule: bucketHexChars must be in [1, 8] (got $bucketHexChars)")
    require(defaultDelayMs >= 0,
      s"schedule: defaultDelayMs must be >= 0 (got $defaultDelayMs)")
    val keyed = urls
      .withColumn("_cs_md5", md5(col(urlCol)))
      .withColumn("_cs_b",
        conv(substring(col("_cs_md5"), 1, bucketHexChars), 16, 10).cast("long"))

    // phase 1: per-(host, bucket) counts -> per-host running offsets
    // (≤ 16^bucketHexChars rows per host enter this window)
    val wOff = Window.partitionBy(col(hostCol)).orderBy(col("_cs_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = keyed.groupBy(col(hostCol), col("_cs_b"))
      .agg(count(lit(1)).as("_cs_n"))
      .withColumn("_cs_off", coalesce(sum(col("_cs_n")).over(wOff), lit(0L)))
      .select(col(hostCol), col("_cs_b"), col("_cs_off"))

    // phase 2: in-bucket rank, bounded by hotHost/nBuckets per task
    val wIn = Window.partitionBy(col(hostCol), col("_cs_b"))
      .orderBy(col("_cs_md5").asc, col(urlCol).asc)
    val slotted = keyed
      .join(offsets, Seq(hostCol, "_cs_b"))
      .withColumn("fetch_slot",
        col("_cs_off") + row_number().over(wIn).cast("long") - 1L)

    val d = delays.select(col(hostCol), col("delay_ms").cast("long").as("_cs_d"))
    slotted
      .join(broadcast(d), Seq(hostCol), "left")
      .withColumn("fetch_time_ms",
        col("fetch_slot") * coalesce(col("_cs_d"), lit(defaultDelayMs)))
      .drop("_cs_md5", "_cs_b", "_cs_off", "_cs_d")
  }
}
