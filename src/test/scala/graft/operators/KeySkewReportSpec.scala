package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[Skew.keySkewReport]]: counts/shares/deterministic ranks on a
  * hand-skewed fixture, and the bounded top-k plan (rank-limit
  * pushdown — the q145 assertion discipline).
  */
class KeySkewReportSpec extends GraftSparkSpec {

  import spark.implicits._

  test("hot key surfaces with exact share and rank") {
    // key 7 owns 50 of 100 rows; keys 0..9 split the rest
    val df = ((0L until 50L).map(_ => 7L) ++
      (0L until 50L).map(i => i % 10)).toDF("k")
    val rep = Skew.keySkewReport(df, $"k", topK = 3)
      .orderBy("rank").collect()
    assert(rep(0).getString(0) === "7")
    assert(rep(0).getLong(1) === 55L) // 50 hot + 5 from the modulo
    assert(rep(0).getLong(2) === 5500L)
    // keys 0..6, 8, 9 all hold 5 rows -> rank 2 and 3 tie-break by key
    assert(rep(1).getString(0) === "0" && rep(2).getString(0) === "1")
    assert(rep.length === 3)
  }

  test("top-k plan is bounded (rank-limit pushdown, no one-task global sort)") {
    val df = (0L until 1000L).map(i => i % 97).toDF("k")
    val plan = Skew.keySkewReport(df, $"k", topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") ||
      plan.contains("TakeOrderedAndProject"), plan)
  }
}
