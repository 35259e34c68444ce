package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Deterministic global corpus shuffle (CorpusOrder): the position
  * column is an exact 1..n permutation matching a local sort by
  * (xxhash64(seed, id), id), stable across partitionings, seed-
  * sensitive, and the shuffle-then-shard composition reproduces the
  * naive sequential cut over the shuffled order with no extra
  * exchange over the chunked cumsum.
  */
class CorpusOrderSpec extends GraftSparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, ((i * 37) % 23 + 1).toLong))
      .toDF("id", "w")

  /** Engine-computed keys (xxhash64 has no JVM-local twin here — the
    * determinism under test is order/position machinery, not the
    * hash), then a local sort defines the expected permutation.
    */
  private def localOrder(n: Int, seed: Long): Seq[Long] = {
    val keys = docs(n)
      .select(col("id"), CorpusOrder.shuffleKey(seed, col("id")).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    keys.sortBy { case (id, k) => (k, id) }.map(_._1).toSeq
  }

  test("pos is the exact 1..n permutation of the (key, id) sort") {
    val n = 400
    val got = CorpusOrder.permuted(docs(n).repartition(7), seed = 7L, col("id"))
      .select(col("id"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).sorted.toSeq == (1L to n).toSeq, "pos not a permutation")
    val byPos = got.sortBy(_._2).map(_._1).toSeq
    assert(byPos == localOrder(n, 7L), "permutation order diverged from (key, id) sort")
  }

  test("same seed is stable across partitionings; different seed permutes differently") {
    val a = CorpusOrder.permuted(docs(300).repartition(3), 99L, col("id"))
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = CorpusOrder.permuted(docs(300).repartition(17), 99L, col("id"))
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b, "permutation depends on input partitioning")
    val c = CorpusOrder.permuted(docs(300), 100L, col("id"))
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a != c, "seed does not change the permutation")
  }

  test("shuffleShard equals the naive sequential cut over the shuffled order") {
    val n = 300
    val budget = 120L
    val got = CorpusOrder.shuffleShard(
      docs(n).repartition(5), 42L, col("id"), col("w"), budget)
      .select(col("id"), col("cum_tokens"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toMap2
    val ws = docs(n).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    var cum = 0L
    localOrder(n, 42L).foreach { id =>
      cum += ws(id)
      val (gotCum, gotShard) = got(id)
      assert(gotCum == cum, s"cum diverged at id $id")
      assert(gotShard == math.max(cum - 1, 0L) / budget, s"shard diverged at id $id")
    }
  }

  test("hash-tie determinism: duplicate keys order by the id tiebreak") {
    // force colliding keys by feeding duplicate ids through the key
    // expression but unique tiebreak ids: build the frame manually
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("id", "w")
      .withColumn("k", lit(12345L)) // all keys equal
    val got = Budget.runningTotal(
      df, col("k"), Seq(col("id")), col("w"), "cum", 1L << 44)
      .select(col("id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      "equal order keys must fall back to the id tiebreak")
  }

  test("plan audit: shuffle-then-shard rides ONE full-data exchange branch") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = CorpusOrder.shuffleShard(docs(200), 42L, col("id"), col("w"), 100L)
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    // cumsum shape: data hash exchange + tiny summary-frame exchanges
    // (bucket totals + offsets window) + possibly a join-side exchange;
    // the guard is against a SECOND full-data pass sneaking in — the
    // full-data exchange count must match the plain budget cumsum's
    val base = Budget.takeWhileBudget(
      docs(200).withColumn("k", CorpusOrder.shuffleKey(42L, col("id"))),
      col("k"), col("w"), Long.MaxValue, chunkSize = 1L << 44)
      .queryExecution.executedPlan.collect { case e: Exchange => e }
    assert(exchanges.size <= base.size,
      s"shuffleShard grew the exchange set: ${exchanges.size} vs base ${base.size}")
    // and no global sort anywhere (the operator assigns order without
    // materializing it)
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(sorts.isEmpty, "global sort leaked into shuffleShard")
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}
