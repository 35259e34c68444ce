package graft.plans

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class NanoTsPushdownSpec extends GraftSparkSpec {
  import spark.implicits._

  // one microsecond = 1000 nanos; pick a literal micros value m and lay
  // rows exactly around the m*1000 nano boundary
  private val m = 1700000000000000L // 2023-11-14 22:13:20 UTC in micros
  private val boundary = Seq(
    m * 1000 - 1,    // truncates to m-1 micros
    m * 1000,        // exactly m
    m * 1000 + 500,  // sub-micro inside m
    m * 1000 + 999,  // last nano of m
    m * 1000 + 1000) // m+1

  private def df = {
    val d = boundary.toDF("n")
    d.withColumn("ts", timestamp_micros(expr("n DIV 1000")))
  }

  private val lit_ts = lit(new java.sql.Timestamp(m / 1000))
    .cast("timestamp") // m micros (m is whole-millisecond here)

  test("rewritten predicates keep exact truncation semantics at the boundary") {
    def nanosOf(c: org.apache.spark.sql.Column): Seq[Long] =
      df.filter(c).select("n").collect().map(_.getLong(0)).toSeq.sorted

    assert(nanosOf(col("ts") >= lit_ts) ==
      Seq(m * 1000, m * 1000 + 500, m * 1000 + 999, m * 1000 + 1000))
    assert(nanosOf(col("ts") > lit_ts) == Seq(m * 1000 + 1000))
    assert(nanosOf(col("ts") <= lit_ts) ==
      Seq(m * 1000 - 1, m * 1000, m * 1000 + 500, m * 1000 + 999))
    assert(nanosOf(col("ts") < lit_ts) == Seq(m * 1000 - 1))
    assert(nanosOf(col("ts") === lit_ts) ==
      Seq(m * 1000, m * 1000 + 500, m * 1000 + 999))
    // mirrored literal-first forms
    assert(nanosOf(lit_ts <= col("ts")) ==
      Seq(m * 1000, m * 1000 + 500, m * 1000 + 999, m * 1000 + 1000))
    assert(nanosOf(lit_ts > col("ts")) == Seq(m * 1000 - 1))
  }

  test("max-nanos sentinel upper bound is NOT rewritten (would overflow) and stays correct") {
    // 2262-04-11T23:47:16.854775Z = Long.MaxValue/1000 micros; its nanos
    // upper bound m*1000+999 overflows Long — the unguarded rewrite
    // flipped `<= sentinel` (keep everything) into `<= negative` (keep
    // nothing)
    val sentinelMicros = Long.MaxValue / 1000
    val rows = Seq(0L, m * 1000, Long.MaxValue - 1).toDF("n")
      .withColumn("ts", timestamp_micros(expr("n DIV 1000")))
    val lit_sentinel = lit(java.time.Instant.ofEpochSecond(
      sentinelMicros / 1000000, (sentinelMicros % 1000000) * 1000))
    assert(rows.filter(col("ts") <= lit_sentinel).count() == 3)
    assert(rows.filter(col("ts") > lit_sentinel).count() == 0)
  }

  // (no optimizedPlan.toString assertion on the LocalRelation frame —
  // ConvertToLocalRelation folds the filter into data there; the
  // parquet test below proves the rewrite fires where it matters)
  test("filter on the converted column reaches the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("nanots").toString + "/t.parquet"
    boundary.toDF("n").write.parquet(dir)
    val rd = spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("n DIV 1000")))
      .filter(col("ts") >= lit_ts)
    val explained = rd.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(explained.contains("PushedFilters") &&
      explained.contains("GreaterThanOrEqual(n,"), s"no pushdown:\n$explained")
    assert(rd.count() == 4)
  }
}
