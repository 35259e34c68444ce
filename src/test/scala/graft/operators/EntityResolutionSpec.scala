package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[EntityResolution]]: exact integral pair scores, threshold
  * precision (same-block decoys rejected), transitive clustering,
  * singleton labeling, the block-size cap's graceful degradation, and
  * unblockable-record handling.
  */
class EntityResolutionSpec extends GraftSparkSpec {

  import spark.implicits._

  private def recs(rows: (Long, String, Long, String)*) =
    rows.toDF("rec_id", "name", "nation", "segment")
      .withColumn("blk", regexp_extract(col("name"), "[0-9]+", 0))
      .withColumn("toks", array_distinct(split(col("name"), " ")))

  private val bonus = Seq("nation" -> 250, "segment" -> 150)

  test("pair scores are the exact integral algebra") {
    val r = recs(
      (1L, "customer 000000042", 7L, "building"),
      (2L, "customer 000000042 inc", 7L, "building"),      // 400+250+150
      (3L, "customer 000000042 llc corp", 8L, "building")) // vs 1: 300+0+150
    val pairs = EntityResolution.scoredPairs(
      r, "rec_id", "blk", "toks", 600, bonus)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(pairs((1L, 2L)) === 800L)
    assert(pairs((1L, 3L)) === 450L)
    assert(pairs((2L, 3L)) === 240L + 0L + 150L)
  }

  test("resolve: twins cluster, decoys stay singleton, transitivity holds") {
    val r = recs(
      (1L, "customer 000000042", 7L, "building"),
      (2L, "customer 000000042 inc", 7L, "building"),
      (3L, "customer 000000042 llc corp", 8L, "building"),
      (4L, "customer 000000099 north", 9L, "auto"),
      (5L, "customer 000000099", 9L, "auto"),
      (6L, "customer 000000099 south", 9L, "auto"),
      (7L, "customer 000000777", 3L, "metal"))
    val out = EntityResolution.resolve(
        r, "rec_id", "blk", "toks", 600, bonus, threshold = 700L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap

    assert(out(1L) === ((1L, 2L)))  // twin entity of size 2
    assert(out(2L) === ((1L, 2L)))
    assert(out(3L) === ((3L, 1L)))  // decoy rejected -> singleton
    // 4~5 (inter 2, union 3 -> 400 + 400 = 800), 5~6 same, and 4~6
    // lands exactly AT threshold (300 + 400 = 700) — one entity of 3
    assert(out(4L) === ((4L, 3L)))
    assert(out(5L) === ((4L, 3L)))
    assert(out(6L) === ((4L, 3L)))
    assert(out(7L) === ((7L, 1L)))
  }

  test("oversized blocks are dropped, not scored") {
    val big = recs((1L to 10L).map(i =>
      (i, s"customer 000000001 v$i", 1L, "x")): _*)
    val capped = EntityResolution.scoredPairs(
      big, "rec_id", "blk", "toks", 600, bonus, maxBlockSize = 9)
    assert(capped.count() === 0L)
    val uncapped = EntityResolution.scoredPairs(
      big, "rec_id", "blk", "toks", 600, bonus, maxBlockSize = 10)
    assert(uncapped.count() === 45L)
    // resolve still labels every record when its block was dropped
    val out = EntityResolution.resolve(
      big, "rec_id", "blk", "toks", 600, bonus, 700L, maxBlockSize = 9)
    assert(out.count() === 10L)
    assert(out.filter(col("n_records") === 1).count() === 10L)
  }

  test("records with null or empty block keys never pair but are labeled") {
    val r = Seq((1L, "no digits here", 1L, "x"), (2L, "also none", 1L, "x"))
      .toDF("rec_id", "name", "nation", "segment")
      .withColumn("blk", regexp_extract(col("name"), "[0-9]+", 0))
      .withColumn("toks", array_distinct(split(col("name"), " ")))
    assert(EntityResolution.scoredPairs(
      r, "rec_id", "blk", "toks", 600, bonus).count() === 0L)
    val out = EntityResolution.resolve(
      r, "rec_id", "blk", "toks", 600, bonus, 700L)
    assert(out.count() === 2L)
    assert(out.filter(col("entity_id") === col("rec_id")).count() === 2L)
  }
}
