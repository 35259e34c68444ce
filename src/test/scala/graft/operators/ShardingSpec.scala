package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Token-bounded output sharding (Budget.shardByTokenBudget /
  * writeTokenShards): shard assignment against a naive single-pass
  * recompute, the never-split / contiguity / bound invariants, the
  * no-new-exchange plan audit, and the partitionBy write round-trip.
  */
class ShardingSpec extends GraftSparkSpec {
  import spark.implicits._

  private def weights(n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (i.toLong, ((i * 37) % 23 + 1).toLong))

  private def corpus(n: Int) = weights(n).toDF("id", "w").repartition(9)

  /** The semantics in its naive sequential form. */
  private def naiveShards(ws: Seq[(Long, Long)], b: Long): Seq[(Long, Long, Long)] = {
    var cum = 0L
    ws.sortBy(_._1).map { case (id, w) =>
      cum += w
      (id, cum, math.max(cum - 1, 0L) / b)
    }
  }

  test("shard assignment equals the naive sequential cut across chunk sizes") {
    for (chunk <- Seq(1L, 7L, 50L, 1000L)) {
      val got = Budget.shardByTokenBudget(
        corpus(500), col("id"), col("w"), shardBudget = 100L, chunkSize = chunk)
        .select(col("id"), col("cum_tokens"), col("shard_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got == naiveShards(weights(500), 100L), s"chunkSize=$chunk diverged")
    }
  }

  test("shards are contiguous, dense from 0, within budget, and never split a row") {
    val rows = Budget.shardByTokenBudget(
      corpus(300), col("id"), col("w"), shardBudget = 97L)
      .select(col("id"), col("w"), col("cum_tokens"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // non-decreasing in order, dense from 0
    val shardSeq = rows.map(_._4)
    assert(shardSeq.head == 0L)
    shardSeq.sliding(2).foreach { case Array(a, b) =>
      assert(b == a || b == a + 1, s"shard ids skipped: $a -> $b")
    }
    // each shard's total <= budget + (first row's weight - 1): the
    // straddling first row is the only overshoot a no-split cut allows
    rows.groupBy(_._4).foreach { case (sid, rs) =>
      val total = rs.map(_._2).sum
      val firstW = rs.minBy(_._1)._2
      assert(total <= 97L + (firstW - 1),
        s"shard $sid total $total exceeds budget+straddle")
    }
  }

  test("oversized row gets a shard of its own; zero-weight rows ride along") {
    val df = Seq((1L, 10L), (2L, 500L), (3L, 0L), (4L, 10L))
      .toDF("id", "w")
    val got = Budget.shardByTokenBudget(df, col("id"), col("w"), 100L)
      .select(col("id"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // cum: 10, 510, 510, 520 -> shards 0, 5, 5, 5
    assert(got == Seq((1L, 0L), (2L, 5L), (3L, 5L), (4L, 5L)))
  }

  test("shard DIV stays exact past double precision (cum > 2^53)") {
    // one row pushes cum to 2^53 + 3; a double-rounded quotient would
    // misplace the following row's shard
    val big = (1L << 53) + 3L
    val df = Seq((1L, big), (2L, 10L)).toDF("id", "w")
    val got = Budget.shardByTokenBudget(df, col("id"), col("w"), 10L)
      .select(col("id"), col("cum_tokens"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, big, (big - 1) / 10L),
      (2L, big + 10L, (big + 9L) / 10L)))
  }

  test("plan audit: sharding adds NO exchange beyond the budget cumsum's") {
    import org.apache.spark.sql.execution.exchange.Exchange
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect { case e: Exchange => e }.size
    val base = Budget.runningTotal(
      corpus(200), col("id"), Nil, col("w"), "cum_tokens", 50L)
    val sharded = Budget.shardByTokenBudget(
      corpus(200), col("id"), col("w"), 100L, chunkSize = 50L)
    assert(exchanges(sharded) == exchanges(base),
      "shard assignment must be a row-local projection on the cumsum plan")
  }

  test("writeTokenShards round-trips: one directory per shard, content preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val sharded = Budget.shardByTokenBudget(
      corpus(200), col("id"), col("w"), shardBudget = 200L)
    Budget.writeTokenShards(sharded, "shard_id", col("id"), s"$dir/out")
    val back = spark.read.parquet(s"$dir/out")
    // partition column round-trips (as int after partition discovery —
    // compare values, not types)
    val got = back.select(col("id"), col("shard_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val want = sharded.select(col("id"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == want)
    // layout: shard_id=N subdirectories, one per shard
    val subdirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard_id=")).sorted
    assert(subdirs.length == want.map(_._2).distinct.length)
  }

  test("fractional weights are rejected loudly") {
    val df = Seq((1L, 0.9), (2L, 0.9)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      Budget.shardByTokenBudget(df, col("id"), col("w"), 10L)
    }
    assert(e.getMessage.contains("integral"))
  }
}
