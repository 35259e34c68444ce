package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[Calibration.thresholdSweep]]: exact per-threshold counts
  * and integral ratios on a hand-checked frame, null score/weight
  * behavior (never kept / zero mass), single-scan shape (no join, no
  * window), and grid-order independence.
  */
class CalibrationSpec extends GraftSparkSpec {

  import spark.implicits._

  private val frame = Seq[(java.lang.Long, java.lang.Long)](
    (0L, 10L), (2500L, 20L), (5000L, 30L), (7500L, 40L), (10000L, 50L),
    (null, 100L), // null score: counted in totals, never kept
    (5000L, null) // null weight: kept by count, zero weight mass
  ).toDF("score", "w")

  test("exact counts and integral ratios on a hand-checked frame") {
    val out = Calibration.thresholdSweep(
      frame, "score", "w", Seq(0L, 5000L, 10001L))
      .orderBy("threshold").collect()

    assert(out.length === 3)
    val byThr = out.map(r => r.getAs[Long]("threshold") -> r).toMap

    // totals identical on every row
    for (r <- out) {
      assert(r.getAs[Long]("n_docs") === 7L)
      assert(r.getAs[Long]("w_total") === 250L)
    }

    // thr=0: everything with a non-null score
    assert(byThr(0L).getAs[Long]("n_kept") === 6L)
    assert(byThr(0L).getAs[Long]("w_kept") === 150L)
    assert(byThr(0L).getAs[Long]("docs_kept_x10000") === 10000L * 6 / 7)

    // thr=5000: scores 5000, 7500, 10000 (incl. the null-weight row)
    assert(byThr(5000L).getAs[Long]("n_kept") === 4L)
    assert(byThr(5000L).getAs[Long]("w_kept") === 120L)
    assert(byThr(5000L).getAs[Long]("w_kept_x10000") === 10000L * 120 / 250)

    // above the max score: nothing survives
    assert(byThr(10001L).getAs[Long]("n_kept") === 0L)
    assert(byThr(10001L).getAs[Long]("w_kept") === 0L)
    assert(byThr(10001L).getAs[Long]("docs_kept_x10000") === 0L)
  }

  test("grid order does not change results; empty input yields zero rows with zero masses") {
    val shuffled = Calibration.thresholdSweep(
      frame, "score", "w", Seq(10001L, 0L, 5000L))
      .orderBy("threshold").collect()
    val sorted = Calibration.thresholdSweep(
      frame, "score", "w", Seq(0L, 5000L, 10001L))
      .orderBy("threshold").collect()
    assert(shuffled.map(_.toString).toSeq === sorted.map(_.toString).toSeq)

    val empty = Calibration.thresholdSweep(
      frame.filter(lit(false)), "score", "w", Seq(0L, 5000L))
      .orderBy("threshold").collect()
    assert(empty.length === 2)
    for (r <- empty) {
      assert(r.getAs[Long]("n_docs") === 0L)
      assert(r.getAs[Long]("w_total") === 0L)
      assert(r.getAs[Long]("docs_kept_x10000") === 0L)
    }
  }

  test("plan shape: one aggregation, no join, no window") {
    val plan = Calibration.thresholdSweep(
      frame, "score", "w", (0L to 10000L by 1000L))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("percentileRank: distinct deterministic ranks under ties, full 0..10000 span") {
    import spark.implicits._
    // 11 rows, score has heavy ties (0,0,0,5,5,5,5,9,9,9,9)
    val df = (0L until 11L)
      .map(i => (i, if (i < 3) 0L else if (i < 7) 5L else 9L))
      .toDF("id", "score")
    val got = Calibration.percentileRank(df, $"id", $"score")
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq === (1L to 11L)) // ranks dense+distinct
    assert(got.head.getLong(3) === 0L && got.last.getLong(3) === 10000L)
    // rank order respects score order (ties resolved inside the tie set)
    assert(got.map(_.getLong(1)).toSeq === got.map(_.getLong(1)).toSeq.sorted)
    // reproducible across runs (the salted-hash tiebreak is pure)
    val again = Calibration.percentileRank(df, $"id", $"score")
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(again === got.map(_.getLong(0)).toSeq)
    // no unpartitioned window over data rows anywhere in the plan
    val wplans = Calibration.percentileRank(df, $"id", $"score")
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(wplans.nonEmpty)
    wplans.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window leaked into percentileRank:\n$w"))
  }
}
