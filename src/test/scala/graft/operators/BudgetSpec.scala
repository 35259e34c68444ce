package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class BudgetSpec extends GraftSparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, ((i * 37) % 23 + 1).toLong))
      .toDF("id", "w")

  /** The semantics in its naive single-partition form. */
  private def naiveCut(n: Int, budget: Long): Seq[(Long, Long)] = {
    var cum = 0L
    (0 until n).flatMap { i =>
      val w = (i * 37) % 23 + 1
      cum += w
      if (cum <= budget) Some((i.toLong, cum)) else None
    }
  }

  test("two-phase cumsum equals the naive cut across chunk sizes") {
    // 1 = one row per bucket (summary frame == data), 1000 = a single
    // bucket (degenerate single-task sort) — both ends must agree
    for (chunk <- Seq(1L, 7L, 50L, 1000L)) {
      val got = Budget.takeWhileBudget(
        corpus(500).repartition(11), // scrambled input partitioning
        col("id"), col("w"), budget = 2000L, chunkSize = chunk)
        .select(col("id"), col("cum_weight"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got == naiveCut(500, 2000L), s"chunkSize=$chunk diverged")
    }
  }

  test("negative order values bucket and accumulate in true order") {
    val df = Seq((-5L, 1L), (-3L, 2L), (-1L, 4L), (0L, 8L), (2L, 16L))
      .toDF("id", "w")
    val got = Budget.takeWhileBudget(df, col("id"), col("w"), 15L, chunkSize = 2L)
      .select(col("id"), col("cum_weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((-5L, 1L), (-3L, 3L), (-1L, 7L), (0L, 15L)))
  }

  test("budget boundaries: inclusive cut, zero budget, budget beyond total") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("id", "w")
    // inclusive: cum 10,20,30 with budget 20 keeps ids 1,2
    assert(Budget.takeWhileBudget(df, col("id"), col("w"), 20L)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Budget.takeWhileBudget(df, col("id"), col("w"), 9L).count() == 0)
    assert(Budget.takeWhileBudget(df, col("id"), col("w"), 1000L).count() == 3)
  }

  test("no unpartitioned window in the budget-cut plan (fold-proof key holds)") {
    // same loud-failure contract as the sessionizer: if an optimizer
    // rule ever folds the summary window's constant key, the global
    // cumsum reverts to one task — values identical, scaling gone
    val plan = Budget.takeWhileBudget(corpus(100), col("id"), col("w"), 500L)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window leaked into the budget-cut plan:\n$w"))
  }

  test("per-group budget: each group cut independently, inclusive boundary") {
    val df = Seq(
      ("en", 1L, 10L), ("en", 2L, 10L), ("en", 3L, 10L),
      ("zh", 1L, 25L), ("zh", 2L, 5L), ("zh", 3L, 1L))
      .toDF("lang", "id", "w")
    val got = Budget.takeWhileBudgetPerGroup(
      df, Seq(col("lang")), col("id"), col("w"), budget = 30L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // en: cum 10,20,30 all within; zh: 25,30 within, 31 over
    assert(got == Seq(("en", 1L, 10L), ("en", 2L, 20L), ("en", 3L, 30L),
      ("zh", 1L, 25L), ("zh", 2L, 30L)))
  }

  test("per-group VARIABLE budgets: each group cut at its own allocation") {
    val df = Seq(
      ("en", 1L, 10L, 25L), ("en", 2L, 10L, 25L), ("en", 3L, 10L, 25L),
      ("zh", 1L, 25L, 60L), ("zh", 2L, 5L, 60L), ("zh", 3L, 40L, 60L))
      .toDF("lang", "id", "w", "alloc")
    val got = Budget.takeWhileBudgetPerGroupVar(
      df, Seq(col("lang")), col("id"), col("w"), col("alloc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    // en budget 25: cum 10,20 in, 30 out; zh budget 60: 25,30 in, 70 out
    assert(got == Seq(("en", 1L, 10L), ("en", 2L, 20L),
      ("zh", 1L, 25L), ("zh", 2L, 30L)))
  }

  test("quotaPerGroup keeps the first `quota` rows per group in order") {
    val df = (0 until 60).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val got = Budget.quotaPerGroup(df, Seq(col("g")), col("id"), quota = 5)
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // group g0 holds ids 0,3,6,... -> first five are 0,3,6,9,12
    assert(got("g0") == Seq(0L, 3L, 6L, 9L, 12L))
    assert(got("g1") == Seq(1L, 4L, 7L, 10L, 13L))
    assert(got("g2") == Seq(2L, 5L, 8L, 11L, 14L))
    // quota beyond group size keeps everything
    assert(Budget.quotaPerGroup(df, Seq(col("g")), col("id"), 100).count() == 60)
  }
}
