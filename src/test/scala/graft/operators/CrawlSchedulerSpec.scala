package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class CrawlSchedulerSpec extends GraftSparkSpec {
  import spark.implicits._

  private def urls(n: Int, hosts: Int) =
    (1 to n).map(i => (s"h${i % hosts}", s"https://h${i % hosts}/p/$i"))
      .toDF("host", "url")

  private val delays = Seq(("h0", 100L), ("h1", 250L)).toDF("host", "delay_ms")

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host"))
      .orderBy(md5(col("url")).asc, col("url").asc)
    df.withColumn("fetch_slot", row_number().over(w).cast("long") - 1L)
      .select("host", "url", "fetch_slot")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
  }

  test("two-phase slots equal the naive per-host window at several bucket widths") {
    val df = urls(400, 3)
    val want = naive(df)
    for (hex <- Seq(1, 2, 3)) {
      val got = CrawlScheduler.schedule(df, "host", "url", delays,
          bucketHexChars = hex)
        .select("host", "url", "fetch_slot")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"bucketHexChars=$hex")
    }
  }

  test("slots are a 0-based permutation per host; times multiply the host delay") {
    val got = CrawlScheduler.schedule(urls(90, 2), "host", "url", delays)
      .select("host", "fetch_slot", "fetch_time_ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (h, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0L until rows.length).toSeq, h)
      val d = if (h == "h0") 100L else 250L
      rows.foreach { case (_, slot, t) => assert(t == slot * d) }
    }
  }

  test("hosts without a delay row use the default") {
    val got = CrawlScheduler.schedule(
      Seq(("hx", "https://hx/a"), ("hx", "https://hx/b")).toDF("host", "url"),
      "host", "url", delays, defaultDelayMs = 777L)
      .select("fetch_slot", "fetch_time_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L), (1L, 777L)))
  }

  test("partitioning-insensitive") {
    val df = urls(200, 4)
    def go(parts: Int) =
      CrawlScheduler.schedule(df.repartition(parts), "host", "url", delays)
        .collect().map(_.toSeq).toSet
    assert(go(1) == go(13))
  }
}
