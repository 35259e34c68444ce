package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class ParquetStageSpec extends GraftSparkSpec {
  import spark.implicits._

  test("staged layout partitions by (event_date, source) and prunes on read") {
    val dir = Files.createTempDirectory("graft_stage").toString
    val df = Seq(
      ("a.log", "1.1.1.1", "2025-04-21 08:00:00"),
      ("a.log", "2.2.2.2", "2025-04-22 09:00:00"),
      ("b.log", "1.1.1.1", "2025-04-21 10:00:00"))
      .toDF("source", "ip", "ts")
      .withColumn("utc_timestamp", col("ts").cast("timestamp")).drop("ts")

    ParquetStage.write(df, dir)

    // physical layout: one directory per (event_date, source)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("event_date=2025-04-21", "event_date=2025-04-22"))

    val pruned = ParquetStage.read(spark, dir)
      .filter(col("event_date") === "2025-04-21" && col("source") === "a.log")
    assert(pruned.count() == 1)
    // partition filters must appear in the scan, not as a post-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }
}
