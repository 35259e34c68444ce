package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[Mixture.waterFill]]: saturation order, cap-at-availability,
  * proportional floor-DIV redistribution, and the two degenerate
  * regimes (budget below every saturation point; budget above total
  * availability).
  */
class WaterFillSpec extends GraftSparkSpec {

  import spark.implicits._

  // strata: A(avail 10, w 1)  C(avail 100, w 2)  B(avail 100, w 1)
  // saturation order by avail/w: A(10) < C(50) < B(100)
  private val totals = Seq(
    ("A", 10L, 1L), ("B", 100L, 1L), ("C", 100L, 2L))
    .toDF("stratum", "avail", "wgt")

  private def plan(budget: Long): Map[String, (Long, Boolean)] =
    Mixture.waterFill(totals, "stratum", "avail", "wgt", lit(budget))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap

  test("mid budget: A saturates, surplus redistributes by weight") {
    // B=110: A caps at 10; remaining 100 over weights C:2 B:1
    val p = plan(110L)
    assert(p("A") === ((10L, true)))
    assert(p("C") === ((66L, false))) // 2 * 100 DIV 3
    assert(p("B") === ((33L, false))) // 1 * 100 DIV 3
    // floors never overshoot and leave < #unsat strata unassigned
    assert(p.values.map(_._1).sum <= 110L)
    assert(110L - p.values.map(_._1).sum < 3L)
  }

  test("small budget: nobody saturates, pure proportional shares") {
    val p = plan(30L)
    assert(p.values.forall(!_._2))
    assert(p("A") === ((7L, false)) && p("B") === ((7L, false)) &&
      p("C") === ((15L, false)))
  }

  test("budget above total availability: everyone capped") {
    val p = plan(1000L)
    assert(p("A") === ((10L, true)) && p("B") === ((100L, true)) &&
      p("C") === ((100L, true)))
  }

  test("allocation never exceeds availability at any budget") {
    for (b <- Seq(1L, 15L, 55L, 150L, 209L, 210L, 211L)) {
      val p = plan(b)
      assert(p("A")._1 <= 10L && p("B")._1 <= 100L && p("C")._1 <= 100L, s"budget $b")
      assert(p.values.map(_._1).sum <= b || p.values.map(_._1).sum === 210L, s"budget $b")
    }
  }

  test("annealSchedule: consumed availability, integer weight lattice, budget respected") {
    val tot = Seq(("A", 100L, 4L, 1L), ("B", 1000L, 1L, 1L), ("C", 500L, 1L, 2L))
      .toDF("stratum", "avail", "sw", "ew")
    val sched = Mixture.annealSchedule(
      tot, "stratum", "avail", "sw", "ew", epochs = 3, budgetPerEpoch = lit(300L))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sched.length === 9, "one row per (epoch, stratum)")
    // weight lattice: w_e = sw*(2-e) + ew*e
    for ((e, s, w, _, _) <- sched) {
      val (sw, ew) = Map("A" -> ((4L, 1L)), "B" -> ((1L, 1L)), "C" -> ((1L, 2L)))(s)
      assert(w === sw * (2 - e) + ew * e, s"epoch $e stratum $s weight")
    }
    // per-epoch budget respected (floor-DIV may leave < #unsat unassigned)
    for (e <- 0 until 3) {
      val al = sched.filter(_._1 == e).map(_._5).sum
      assert(al <= 300L, s"epoch $e over budget: $al")
    }
    // availability consumed: epoch e's avail = base - prior allocations,
    // and cumulative allocation never exceeds the base (no repetition)
    val base = Map("A" -> 100L, "B" -> 1000L, "C" -> 500L)
    for (s <- Seq("A", "B", "C")) {
      val rows = sched.filter(_._2 == s).sortBy(_._1)
      var remain = base(s)
      for ((_, _, _, avail, alloc) <- rows) {
        assert(avail === remain, s"stratum $s entering avail")
        assert(alloc <= avail, s"stratum $s allocation exceeds availability")
        remain -= alloc
      }
      assert(remain >= 0L)
    }
    // A (only 100 available, heavily weighted early) runs dry: its
    // epoch-0 allocation saturates at 100 and later epochs get 0
    val aRows = sched.filter(_._2 == "A").sortBy(_._1).map(_._5)
    assert(aRows(0) === 100L && aRows(1) === 0L && aRows(2) === 0L)
  }

  test("annealAssign: rows fill epochs in order, none past the total allocation") {
    val tot = Seq(("A", 100L, 4L, 1L), ("B", 60L, 1L, 1L))
      .toDF("stratum", "avail", "sw", "ew")
    val sched = Mixture.annealSchedule(
      tot, "stratum", "avail", "sw", "ew", epochs = 3, budgetPerEpoch = lit(30L))
    // rows: stratum A ids 1..10 weight 10 each, B ids 1..6 weight 10
    val rows = ((1 to 10).map(i => ("A", i.toLong, 10L)) ++
      (1 to 6).map(i => ("B", i.toLong, 10L)))
      .toDF("stratum", "id", "w")
    val out = Mixture.annealAssign(rows, sched, "stratum", col("id"), col("w"))
      .select(col("stratum"), col("id"), col("epoch"), col("cum_weight"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val plan = sched.collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(4)).toMap
    // epoch boundaries snap at row granularity: a row whose cumsum
    // crosses hi_e lands in the NEXT epoch, so each epoch's assigned
    // weight deviates from its allocation by less than one row
    for (e <- 0 until 3; s <- Seq("A", "B")) {
      val got = out.filter(o => o._1 == s && o._3 == e).length * 10L
      val alloc = plan((e, s))
      assert(math.abs(got - alloc) < 10L,
        s"epoch $e stratum $s: assigned $got of $alloc")
    }
    // nothing past the schedule's total allocation is ever emitted
    for (s <- Seq("A", "B")) {
      val totalGot = out.filter(_._1 == s).length * 10L
      val totalAlloc = (0 until 3).map(e => plan((e, s))).sum
      assert(totalGot <= totalAlloc, s"stratum $s overshoot")
    }
    // epochs are contiguous in id order within a stratum
    for (s <- Seq("A", "B")) {
      val byId = out.filter(_._1 == s).sortBy(_._2).map(_._3)
      assert(byId === byId.sorted, s"stratum $s epoch labels must be monotone")
    }
    // cumsum column is the inclusive running weight
    for ((s, id, _, cum) <- out) assert(cum === id * 10L, s"$s $id")
  }

  test("annealSchedule refuses non-positive endpoint weights") {
    val tot = Seq(("A", 10L, 0L, 1L)).toDF("stratum", "avail", "sw", "ew")
    intercept[IllegalArgumentException] {
      Mixture.annealSchedule(tot, "stratum", "avail", "sw", "ew", 3, lit(5L))
    }
  }

  test("non-positive weight and negative availability are refused") {
    // wgt=0 would make the avail/wgt sort key Infinity (NaN at 0/0)
    // and silently corrupt the saturation order — must fail loudly
    val zeroW = Seq(("A", 10L, 0L), ("B", 5L, 1L)).toDF("stratum", "avail", "wgt")
    intercept[IllegalArgumentException] {
      Mixture.waterFill(zeroW, "stratum", "avail", "wgt", lit(10L)).collect()
    }
    val negA = Seq(("A", -1L, 1L), ("B", 5L, 1L)).toDF("stratum", "avail", "wgt")
    intercept[IllegalArgumentException] {
      Mixture.waterFill(negA, "stratum", "avail", "wgt", lit(10L)).collect()
    }
  }

  test("annealScheduleGated: epochs fill from their cleared pool minus prior consumption") {
    // two strata, two epochs; epoch 0's floor clears only part of the
    // pool (A: 10 of 30, B: 20 of 60), epoch 1 clears everything.
    // budget 15 per epoch, equal weights.
    val perEpoch = Seq(
      ("A", 0, 10L, 1L), ("B", 0, 20L, 1L),
      ("A", 1, 30L, 1L), ("B", 1, 60L, 1L))
      .toDF("stratum", "epoch", "cleared", "wgt")
    val out = Mixture.annealScheduleGated(
      perEpoch, "stratum", "epoch", "cleared", "wgt", lit(15L))
      .collect()
      .map(r => ((r.getInt(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    // epoch 0: avail (10, 20), budget 15 -> water-fill: A saturates at
    // 10? test: 10*2 <= 15*1 false -> A unsaturated; equal weights ->
    // 7 each (floor-DIV), A gets 7, B gets 7
    assert(out((0, "A")) === ((1L, 10L, 7L, false)))
    assert(out((0, "B")) === ((1L, 20L, 7L, false)))
    // epoch 1: cleared (30, 60) minus consumed (7, 7) -> avail (23, 53);
    // budget 15 -> 7 each again, both unsaturated
    assert(out((1, "A")) === ((1L, 23L, 7L, false)))
    assert(out((1, "B")) === ((1L, 53L, 7L, false)))
  }

  test("annealScheduleGated: scarce epoch saturates fully; tightening floor fails loudly") {
    // epoch 0 clears only 4+2=6 < budget 10: every stratum saturated,
    // the whole quality tier is taken
    val scarce = Seq(
      ("A", 0, 4L, 1L), ("B", 0, 2L, 1L),
      ("A", 1, 100L, 1L), ("B", 1, 100L, 1L))
      .toDF("stratum", "epoch", "cleared", "wgt")
    val out = Mixture.annealScheduleGated(
      scarce, "stratum", "epoch", "cleared", "wgt", lit(10L))
      .collect()
      .map(r => ((r.getInt(0), r.getString(1)), (r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out((0, "A")) === ((4L, true)) && out((0, "B")) === ((2L, true)))
    assert(out((1, "A")) === ((5L, false)) && out((1, "B")) === ((5L, false)))
    // a TIGHTENING floor (epoch 1 clears LESS than epoch 0 consumed)
    // drives availability negative -> loud refusal, never a silent
    // wrong plan
    val tight = Seq(
      ("A", 0, 100L, 1L), ("B", 0, 100L, 1L),
      ("A", 1, 3L, 1L), ("B", 1, 3L, 1L))
      .toDF("stratum", "epoch", "cleared", "wgt")
    intercept[IllegalArgumentException] {
      Mixture.annealScheduleGated(
        tight, "stratum", "epoch", "cleared", "wgt", lit(50L)).collect()
    }
    // epochs must be dense from 0
    intercept[IllegalArgumentException] {
      Mixture.annealScheduleGated(
        Seq(("A", 1, 5L, 1L)).toDF("stratum", "epoch", "cleared", "wgt"),
        "stratum", "epoch", "cleared", "wgt", lit(5L))
    }
  }

  test("NULL weight or availability trips the guard (not silently filtered)") {
    // a bare `<= 0` predicate is NULL for NULL inputs and the where
    // drops it — the NULL row would then poison the avail/wgt ratio
    // and silently corrupt the saturation order
    val nullW = Seq(("A", 10L, Some(1L)), ("B", 5L, None))
      .toDF("stratum", "avail", "wgt")
    intercept[IllegalArgumentException] {
      Mixture.waterFill(nullW, "stratum", "avail", "wgt", lit(10L)).collect()
    }
    val nullA = Seq(("A", Some(10L), 1L), ("B", None, 1L))
      .toDF("stratum", "avail", "wgt")
    intercept[IllegalArgumentException] {
      Mixture.waterFill(nullA, "stratum", "avail", "wgt", lit(10L)).collect()
    }
    val nullEw = Seq(("A", 10L, 1L, Some(1L)), ("B", 5L, 1L, None))
      .toDF("stratum", "avail", "sw", "ew")
    intercept[IllegalArgumentException] {
      Mixture.annealSchedule(nullEw, "stratum", "avail", "sw", "ew", 3, lit(5L))
    }
  }
}
