package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Incremental dedup against a persisted minhash index must equal the
  * cross-pair slice of a fresh minhashPairs over the union — same
  * band keys, same bucket-cap universe, same exact Jaccard.
  */
class NearDupIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def doc(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
  }

  // corpus: 40 docs; new batch: 10 fresh docs + near-dups of corpus docs
  private def corpusDf = (0 until 40).map(i => (i.toLong, doc(i, 30))).toDF("doc_id", "text")
  private def newDf = ((100 until 110).map(i => (i.toLong, doc(i, 30))) ++
    (0 until 8).map(i => ((200 + i).toLong, doc(i, 30) + " kappa")))
    .toDF("doc_id", "text")

  test("pairs against a persisted index equal the cross-pair slice of the union run") {
    val dir = Files.createTempDirectory("minhash_index").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir)
    for (cap <- Seq(0L, 100L)) {
      val indexed = NearDup.minhashPairsAgainstIndex(
        newDf, "doc_id", "text", dir, threshold = 0.5, maxBucketSize = cap)
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
      val newIds = (100 until 110).map(_.toLong).toSet ++ (200 until 208).map(_.toLong)
      val full = NearDup.minhashPairs(
        corpusDf.unionByName(newDf), "doc_id", "text",
        threshold = 0.5, maxBucketSize = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter { case (a, b, _) => newIds.contains(a) ^ newIds.contains(b) }
        .toSet
      assert(indexed == full, s"cap=$cap")
      assert(indexed.nonEmpty, s"cap=$cap: planted near-dups must surface")
    }
  }

  test("index after append equals an index rebuilt from the union") {
    val dir1 = Files.createTempDirectory("minhash_app1").toString
    val dir2 = Files.createTempDirectory("minhash_app2").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir1)
    NearDup.appendToMinhashIndex(newDf, "doc_id", "text", dir1)
    NearDup.buildMinhashIndex(corpusDf.unionByName(newDf), "doc_id", "text", dir2)
    def bandsOf(d: String) = spark.read.parquet(s"$d/bands.parquet")
      .collect().map(_.toSeq).toSet
    def shinglesOf(d: String) = spark.read.parquet(s"$d/shingles.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(bandsOf(dir1) == bandsOf(dir2))
    assert(shinglesOf(dir1) == shinglesOf(dir2))
    // and the appended index actually serves: a copy of an appended doc
    // dedups against it
    val probe = Seq((900L, doc(101, 30))).toDF("doc_id", "text")
    val hits = NearDup.minhashPairsAgainstIndex(probe, "doc_id", "text", dir1)
      .collect().map(_.getLong(1)).toSet
    assert(hits.contains(101L))
  }

  test("the index layout is the documented narrow shape") {
    val dir = Files.createTempDirectory("minhash_index2").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir)
    val bands = spark.read.parquet(s"$dir/bands.parquet")
    val sh = spark.read.parquet(s"$dir/shingles.parquet")
    assert(bands.columns.toSeq == Seq("id", "band_idx", "band_hash"))
    assert(bands.count() == 40 * 8) // 8 band keys per doc
    assert(sh.columns.toSeq == Seq("id", "sh") && sh.count() == 40)
  }

  test("short docs enter the ledger: a replayed batch is a no-op for them too") {
    val dir = Files.createTempDirectory("minhash_ledger").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir)
    // one normal doc + one doc too short to shingle (2 tokens < 3)
    val batch = Seq((300L, doc(300, 30)), (301L, "alpha beta")).toDF("doc_id", "text")
    val first = NearDup.dedupNewBatch(batch, "doc_id", "text", dir)
      .collect().map(_.getLong(0)).toSet
    assert(first == Set(300L, 301L))
    NearDup.appendToMinhashIndex(
      spark.createDataFrame(spark.sparkContext.parallelize(
        batch.collect().toSeq), batch.schema), "doc_id", "text", dir)
    // the short doc is in shingles.parquet (the ledger) with no band rows
    val sh = spark.read.parquet(s"$dir/shingles.parquet")
    assert(sh.filter(col("id") === 301L).count() == 1)
    assert(spark.read.parquet(s"$dir/bands.parquet")
      .filter(col("id") === 301L).count() == 0)
    // replay: BOTH ids dropped by the ledger anti-join
    val replay = NearDup.dedupNewBatch(batch, "doc_id", "text", dir)
    assert(replay.count() == 0, "replayed batch must be a no-op")
  }

  test("ledger-only index (crash before the first band write) probes as empty, not an error") {
    val dir = Files.createTempDirectory("minhash_ledger_only").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir)
    // simulate a crash between the FIRST batch's ledger write and its
    // band write: shingles.parquet present, bands.parquet missing
    val p = new org.apache.hadoop.fs.Path(s"$dir/bands.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val probed = NearDup.minhashPairsAgainstIndex(newDf, "doc_id", "text", dir)
    assert(probed.columns.toSeq == Seq("id_new", "id_corpus", "jaccard"))
    assert(probed.count() == 0)
    // and the replay path runs end-to-end instead of wedging: known ids
    // are still dropped by the ledger, fresh ids survive (no candidates)
    val replay = corpusDf.limit(2).unionByName(
      Seq((500L, doc(500, 30))).toDF("doc_id", "text"))
    val survivors = NearDup.dedupNewBatch(replay, "doc_id", "text", dir)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(500L))
  }
}
