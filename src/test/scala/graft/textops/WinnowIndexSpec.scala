package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Incremental near-dup against a persisted winnow index must equal
  * the cross-pair slice of a fresh winnowPairs over the union — same
  * fingerprints, same joined-universe cap, same post-cap denominators.
  */
class WinnowIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def doc(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
  }

  private def corpusDf = (0 until 40).map(i => (i.toLong, doc(i, 30))).toDF("doc_id", "text")
  private def newDf = ((100 until 110).map(i => (i.toLong, doc(i, 30))) ++
    (0 until 8).map(i => ((200 + i).toLong, doc(i, 30) + " kappa")))
    .toDF("doc_id", "text")

  test("pairs against a persisted index equal the cross-pair slice of the union run") {
    val dir = Files.createTempDirectory("winnow_index").toString
    NearDup.buildWinnowIndex(corpusDf, "doc_id", "text", dir)
    // cap 0 = uncapped, 200 = default never-binding, 5 = actually binds
    for (cap <- Seq(0L, 200L, 5L)) {
      val indexed = NearDup.winnowPairsAgainstIndex(
        newDf, "doc_id", "text", dir, minSharedRatio = 0.5, maxBucketSize = cap)
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)), r.getLong(2), r.getDouble(3))).toSet
      val newIds = (100 until 110).map(_.toLong).toSet ++ (200 until 208).map(_.toLong)
      val full = NearDup.winnowPairs(
        corpusDf.unionByName(newDf), "doc_id", "text",
        minSharedRatio = 0.5, maxBucketSize = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .filter { case (a, b, _, _) => newIds.contains(a) ^ newIds.contains(b) }
        .toSet
      assert(indexed == full, s"cap=$cap")
    }
    // the one-token-suffix edits must surface at the default threshold
    val hits = NearDup.winnowPairsAgainstIndex(newDf, "doc_id", "text", dir)
      .collect().map(_.getLong(0)).toSet
    assert(hits.exists(_ >= 200L), "planted near-dups must surface")
  }

  test("index after append equals an index rebuilt from the union, and serves") {
    val dir1 = Files.createTempDirectory("winnow_app1").toString
    val dir2 = Files.createTempDirectory("winnow_app2").toString
    NearDup.buildWinnowIndex(corpusDf, "doc_id", "text", dir1)
    NearDup.appendToWinnowIndex(newDf, "doc_id", "text", dir1)
    NearDup.buildWinnowIndex(corpusDf.unionByName(newDf), "doc_id", "text", dir2)
    def fpsOf(d: String) = spark.read.parquet(s"$d/fps.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fpsOf(dir1) == fpsOf(dir2))
    // an exact copy of an appended doc hits at containment 1.0
    val probe = Seq((900L, doc(101, 30))).toDF("doc_id", "text")
    val hit = NearDup.winnowPairsAgainstIndex(probe, "doc_id", "text", dir1)
      .filter(col("id_corpus") === 101L).collect()
    assert(hit.length == 1 && hit.head.getDouble(3) == 1.0)
  }

  test("the index layout is the documented narrow shape") {
    val dir = Files.createTempDirectory("winnow_index2").toString
    NearDup.buildWinnowIndex(corpusDf, "doc_id", "text", dir)
    val fps = spark.read.parquet(s"$dir/fps.parquet")
    assert(fps.columns.toSeq == Seq("id", "fp"))
    assert(fps.select("id").distinct().count() == 40)
  }
}
