package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[TableProfile.profile]]: null/distinct/min/max semantics
  * (distinct ignores nulls; min/max rendered as strings), one row per
  * requested column, and the join-free plan.
  */
class TableProfileSpec extends GraftSparkSpec {

  import spark.implicits._

  private val df = Seq(
    (1L, Option("b"), Option(10L)),
    (2L, Option("a"), Option(20L)),
    (3L, Option("a"), Option.empty[Long]),
    (4L, Option.empty[String], Option(10L))).toDF("id", "s", "v")

  test("per-column stats on the hand fixture") {
    val rep = TableProfile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep.keySet === Set("id", "s", "v"))
    val id = rep("id"); val s = rep("s"); val v = rep("v")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L &&
      id.getLong(3) === 4L && id.getString(4) === "1" &&
      id.getString(5) === "4")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L &&
      s.getString(4) === "a" && s.getString(5) === "b")
    assert(v.getLong(2) === 1L && v.getLong(3) === 2L &&
      v.getString(4) === "10" && v.getString(5) === "20")
  }

  test("plan has no join; distinct counts ride one aggregation (Expand)") {
    val rep = TableProfile.profile(df, Seq("id", "s"))
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Expand"), plan)
  }

  test("duplicate columns are rejected") {
    intercept[IllegalArgumentException] {
      TableProfile.profile(df, Seq("id", "id"))
    }
  }
}
