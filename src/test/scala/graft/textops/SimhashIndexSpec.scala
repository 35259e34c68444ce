package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Incremental near-dup against a persisted simhash index must equal
  * the cross-pair slice of a fresh simhashPairs over the union — same
  * chunk keys, same cap universe, same exact hamming.
  */
class SimhashIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def doc(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
  }

  private def corpusDf = (0 until 40).map(i => (i.toLong, doc(i, 30))).toDF("doc_id", "text")
  // fresh docs + one-token edits of corpus docs (small hamming distance)
  private def newDf = ((100 until 110).map(i => (i.toLong, doc(i, 30))) ++
    (0 until 8).map(i => ((200 + i).toLong, doc(i, 30) + " kappa")))
    .toDF("doc_id", "text")

  test("pairs against a persisted index equal the cross-pair slice of the union run") {
    val dir = Files.createTempDirectory("simhash_index").toString
    NearDup.buildSimhashIndex(corpusDf, "doc_id", "text", dir)
    for ((hamming, cap) <- Seq((6, 0L), (6, 100L), (3, 0L))) {
      val indexed = NearDup.simhashPairsAgainstIndex(
        newDf, "doc_id", "text", dir, maxHamming = hamming, maxBucketSize = cap)
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)), r.getInt(2))).toSet
      val newIds = (100 until 110).map(_.toLong).toSet ++ (200 until 208).map(_.toLong)
      val full = NearDup.simhashPairs(
        corpusDf.unionByName(newDf), "doc_id", "text",
        maxHamming = hamming, maxBucketSize = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .filter { case (a, b, _) => newIds.contains(a) ^ newIds.contains(b) }
        .toSet
      assert(indexed == full, s"hamming=$hamming cap=$cap")
    }
    // the one-token edits must actually surface at a loose bound
    val hits = NearDup.simhashPairsAgainstIndex(
      newDf, "doc_id", "text", dir, maxHamming = 12)
      .collect().map(_.getLong(0)).toSet
    assert(hits.exists(_ >= 200L), "planted near-dups must surface")
  }

  test("index after append equals an index rebuilt from the union, and serves") {
    val dir1 = Files.createTempDirectory("simhash_app1").toString
    val dir2 = Files.createTempDirectory("simhash_app2").toString
    NearDup.buildSimhashIndex(corpusDf, "doc_id", "text", dir1)
    NearDup.appendToSimhashIndex(newDf, "doc_id", "text", dir1)
    NearDup.buildSimhashIndex(corpusDf.unionByName(newDf), "doc_id", "text", dir2)
    def fpOf(d: String) = spark.read.parquet(s"$d/fp.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fpOf(dir1) == fpOf(dir2))
    // an exact copy of an appended doc hits it at hamming 0
    val probe = Seq((900L, doc(101, 30))).toDF("doc_id", "text")
    val hits = NearDup.simhashPairsAgainstIndex(probe, "doc_id", "text", dir1,
      maxHamming = 0)
      .collect().map(_.getLong(1)).toSet
    assert(hits.contains(101L))
  }

  test("the index layout is the documented narrow shape") {
    val dir = Files.createTempDirectory("simhash_index2").toString
    NearDup.buildSimhashIndex(corpusDf, "doc_id", "text", dir)
    val fp = spark.read.parquet(s"$dir/fp.parquet")
    assert(fp.columns.toSeq == Seq("id", "sh") && fp.count() == 40)
  }
}
