package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class IntervalJoinSpec extends GraftSparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 100L, 200L), (2L, 150L, 250L), (3L, 1000L, 1000L))
    .toDF("iid", "s", "e")
  private val points = Seq(
    (10L, 99L), (11L, 100L), (12L, 175L), (13L, 200L), (14L, 250L),
    (15L, 251L), (16L, 1000L), (17L, 5000L))
    .toDF("pid", "ts")

  private def run(chunk: Long) =
    IntervalJoin.pointsInIntervals(intervals, "s", "e", points, "ts", chunk)
      .select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val naive = intervals.crossJoin(points)
    .filter(col("ts") >= col("s") && col("ts") <= col("e"))
    .select("iid", "pid").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the naive theta join; both interval ends inclusive") {
    val got = run(chunk = 60)
    assert(got == naive)
    assert(got.contains((1L, 11L)) && got.contains((1L, 13L))) // boundaries
    assert(got.contains((2L, 12L)) && got.contains((1L, 12L))) // overlap
    assert(got.contains((3L, 16L)))                            // zero-length
    assert(!got.contains((1L, 10L)) && !got.contains((2L, 15L)))
  }

  test("pairs emerge exactly once regardless of chunk size") {
    for (chunk <- Seq(1L, 7L, 50L, 1000L, 100000L)) {
      val rows = IntervalJoin.pointsInIntervals(
        intervals, "s", "e", points, "ts", chunk)
        .select("iid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.toSet.size, s"chunk=$chunk duplicated pairs")
      assert(rows.toSet == naive, s"chunk=$chunk")
    }
  }

  test("keyCols: per-entity intervals only match same-entity points") {
    val iv = Seq(("a", 1L, 0L, 100L), ("b", 2L, 0L, 100L))
      .toDF("k", "iid", "s", "e")
    val pt = Seq(("a", 10L, 50L), ("b", 11L, 50L), ("c", 12L, 50L))
      .toDF("k", "pid", "ts")
    val got = IntervalJoin.pointsInIntervals(iv, "s", "e", pt, "ts",
      chunkSeconds = 10, keyCols = Seq("k"))
      .select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
  }

  test("overlap join matches the naive theta join, exactly once per pair") {
    val a = Seq((1L, 100L, 200L), (2L, 150L, 250L), (3L, 500L, 500L))
      .toDF("aid", "as", "ae")
    val b = Seq((10L, 180L, 300L), (11L, 200L, 210L), (12L, 251L, 400L),
      (13L, 500L, 600L), (14L, 0L, 99L))
      .toDF("bid", "bs", "be")
    val naiveOv = a.crossJoin(b)
      .filter(col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (chunk <- Seq(1L, 13L, 60L, 10000L)) {
      val rows = IntervalJoin.intervalOverlaps(
        a, "as", "ae", b, "bs", "be", chunkSeconds = chunk)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.toSet.size, s"chunk=$chunk duplicated")
      assert(rows.toSet == naiveOv, s"chunk=$chunk")
    }
    // inclusive boundary overlap (a1 ends exactly where b11 starts)
    assert(naiveOv.contains((1L, 11L)))
    // zero-length interval overlapping a range start
    assert(naiveOv.contains((3L, 13L)))
  }

  test("overlap join rejects colliding non-key column names") {
    val x = Seq((1L, 0L, 1L)).toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      IntervalJoin.intervalOverlaps(x, "s", "e", x, "s", "e", 10)
    }
  }

  test("the chunk-explosion guard fails loudly (at action, zero extra jobs)") {
    // the guard is folded into the chunk expression (raise_error), so
    // it surfaces when the plan RUNS — the valid path pays no 1-row
    // collect() pre-scan job per call anymore
    val huge = Seq((1L, 0L, 10000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      IntervalJoin.pointsInIntervals(huge, "s", "e", points, "ts",
        chunkSeconds = 1, maxChunksPerInterval = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("raise chunkSeconds")),
      s"guard message missing: ${msgs(ex).mkString(" | ")}")
  }

  test("overlap-side chunk-explosion guard also fails loudly") {
    val huge = Seq((1L, 0L, 10000000L)).toDF("xid", "xs", "xe")
    val other = Seq((2L, 5L, 9L)).toDF("yid", "ys", "ye")
    val ex = intercept[Exception] {
      IntervalJoin.intervalOverlaps(huge, "xs", "xe", other, "ys", "ye",
        chunkSeconds = 1, maxChunksPerInterval = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("raise chunkSeconds")))
  }
}
