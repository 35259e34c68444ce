package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Sequence packing (Packing.packSequences): slice map against a naive
  * sequential recompute, the exact-coverage invariants (every token
  * position lands in exactly one slice; every sequence but the last is
  * exactly full), chunk-size insensitivity, document splitting,
  * drop-incomplete policy, and the no-new-exchange plan audit.
  */
class PackingSpec extends GraftSparkSpec {
  import spark.implicits._

  private def weights(n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (i.toLong, ((i * 41) % 29 + 1).toLong))

  private def corpus(n: Int) = weights(n).toDF("id", "w").repartition(7)

  /** The semantics in its naive sequential form: walk the token
    * stream, emit (id, cum, seq, doc_start, doc_len, seq_start).
    */
  private def naiveSlices(
      ws: Seq[(Long, Long)], L: Long): Seq[(Long, Long, Long, Long, Long, Long)] = {
    var cum = 0L
    ws.sortBy(_._1).flatMap { case (id, n) =>
      val g = cum
      cum += n
      if (n == 0) Nil
      else (g / L to (cum - 1) / L).map { s =>
        val ds = math.max(s * L - g, 0L)
        val de = math.min(n, (s + 1) * L - g)
        (id, cum, s, ds, de - ds, math.max(g - s * L, 0L))
      }
    }
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), col("cum_tokens"), col("seq_id"),
      col("doc_start"), col("doc_len"), col("seq_start"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("slice map equals the naive sequential packing across chunk sizes") {
    for (chunk <- Seq(1L, 7L, 50L, 1000L)) {
      val got = collect(Packing.packSequences(
        corpus(400), col("id"), col("w"), seqLen = 64L, chunkSize = chunk))
      assert(got == naiveSlices(weights(400), 64L), s"chunkSize=$chunk diverged")
    }
  }

  test("every token position is covered exactly once; sequences are exactly full") {
    val L = 50L
    val rows = collect(Packing.packSequences(
      corpus(300), col("id"), col("w"), seqLen = L))
    val total = weights(300).map(_._2).sum
    // global positions reconstructed from (seq_id, seq_start, doc_len)
    // partition [0, total) with no gaps or overlaps
    val spans = rows.map { case (_, _, s, _, len, ss) => (s * L + ss, s * L + ss + len) }
      .sortBy(_._1)
    assert(spans.head._1 == 0L)
    assert(spans.last._2 == total)
    spans.sliding(2).foreach { case Seq((_, e), (b, _)) =>
      assert(e == b, s"gap or overlap at position $e vs $b")
    }
    // every sequence but the last holds exactly L tokens
    val perSeq = rows.groupBy(_._3).view.mapValues(_.map(_._5).sum)
    val lastSeq = (total - 1) / L
    perSeq.foreach { case (s, n) =>
      if (s < lastSeq) assert(n == L, s"sequence $s holds $n tokens, want $L")
      else assert(n == total - lastSeq * L)
    }
  }

  test("an oversized document splits across consecutive sequences") {
    val df = Seq((1L, 10L), (2L, 130L), (3L, 5L)).toDF("id", "w")
    val got = collect(Packing.packSequences(df, col("id"), col("w"), seqLen = 50L))
    // doc 2 spans [10, 140): sequences 0..2 with slices 40/50/40
    assert(got == Seq(
      (1L, 10L, 0L, 0L, 10L, 0L),
      (2L, 140L, 0L, 0L, 40L, 10L),
      (2L, 140L, 1L, 40L, 50L, 0L),
      (2L, 140L, 2L, 90L, 40L, 0L),
      (3L, 145L, 2L, 0L, 5L, 40L)))
  }

  test("zero-weight documents emit no slices") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, 10L)).toDF("id", "w")
    val got = collect(Packing.packSequences(df, col("id"), col("w"), seqLen = 8L))
    assert(!got.exists(_._1 == 2L))
    // doc 3 still starts at global position 10
    assert(got.filter(_._1 == 3L).map(t => t._3 * 8L + t._6).min == 10L)
  }

  test("dropIncomplete removes exactly the trailing partial sequence") {
    val df = Seq((1L, 30L), (2L, 30L), (3L, 15L)).toDF("id", "w") // total 75
    val L = 25L // sequences 0,1 full; 2 holds 25 (full); total 75 = 3*25
    val all = collect(Packing.packSequences(df, col("id"), col("w"), L))
    val kept = collect(Packing.packSequences(
      df, col("id"), col("w"), L, dropIncomplete = true))
    assert(kept == all) // total divides evenly: nothing dropped
    val df2 = Seq((1L, 30L), (2L, 30L), (3L, 17L)).toDF("id", "w") // total 77
    val all2 = collect(Packing.packSequences(df2, col("id"), col("w"), L))
    val kept2 = collect(Packing.packSequences(
      df2, col("id"), col("w"), L, dropIncomplete = true))
    assert(kept2 == all2.filter(_._3 < 3L))
    assert(all2.exists(_._3 == 3L))
  }

  test("plan audit: packing adds NO exchange beyond the budget cumsum's") {
    import org.apache.spark.sql.execution.exchange.Exchange
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect { case e: Exchange => e }.size
    val base = Budget.runningTotal(
      corpus(200), col("id"), Nil, col("w"), "cum_tokens", 50L)
    val packed = Packing.packSequences(
      corpus(200), col("id"), col("w"), seqLen = 64L, chunkSize = 50L)
    assert(exchanges(packed) == exchanges(base),
      "the slice explosion must be a row-local Generate on the cumsum plan")
  }

  test("fractional weights are rejected loudly") {
    val df = Seq((1L, 0.9), (2L, 0.9)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      Packing.packSequences(df, col("id"), col("w"), 10L)
    }
    assert(e.getMessage.contains("integral"))
  }
}
