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

  test("alike-bucketed tables join with no exchange (co-located join)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 200).map(i => (s"ip${i % 37}", i)).toDF("ip", "x")
      val b = (1 to 150).map(i => (s"ip${i % 37}", i * 2)).toDF("ip", "y")
      ParquetStage.writeBucketed(a, "bkt_a", Seq("ip"), 8)
      ParquetStage.writeBucketed(b, "bkt_b", Seq("ip"), 8)
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("ip"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it's the same result as the unbucketed join
      assert(joined.count() ==
        a.join(b, Seq("ip")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("stage-then-requery equals the direct pipeline (parse once, query many)") {
    import graft.{Pipeline, PseudoLog}
    val dir = Files.createTempDirectory("graft_stage2").toString + "/store"
    val logs = PseudoLog.logs(spark, "/root/testdata/sf0.001")
      .withColumn("timestamp",
        date_format(col("utc_timestamp"), "dd/MMM/yyyy:HH:mm:ss Z"))
      .withColumn("_row_id", col("event_id"))
      .limit(2000)
    // normalize-equivalent input: already has _row_id/utc_timestamp, so
    // sessionize + counts stand in for the full normalize here
    val normalized = graft.session.Sessionizer.withRequestCount(
      graft.session.Sessionizer.withClusters(logs, threshold = 300L))
    ParquetStage.write(normalized, dir)

    val config = graft.rules.GraftConfig.default
    val rules = graft.rules.RuleEngine.parseRules(graft.SparkEntry.oracleRulesYaml)
    val direct = Pipeline.score(normalized, config, rules, graft.SparkEntry.oracleShells)
      .select(col("_row_id"), col("risk_score"), col("rule_applied"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val staged = Pipeline.score(
      ParquetStage.read(spark, dir).drop("event_date"),
      config, rules, graft.SparkEntry.oracleShells)
      .select(col("_row_id"), col("risk_score"), col("rule_applied"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(staged == direct && direct.nonEmpty)
  }
}
