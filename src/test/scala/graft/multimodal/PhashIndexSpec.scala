package graft.multimodal

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.textops.NearDup

/** Persisted perceptual-hash index: the generic fingerprint index
  * (simhash layout) carrying dHashes — probe equals the cross-pair
  * slice of fingerprintPairs over the union, append equals rebuild,
  * tombstone delete honored. Completes the image near-dup lifecycle.
  */
class PhashIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def withHash(ids: Seq[Long]): DataFrame =
    Multimodal.patternImages(ids.toDF("doc_id"), "doc_id")
      .select(col("media_id"),
        PerceptualHash.dhash64(col("bytes")).as("fp"))

  // corpus: images 0..29; batch: fresh 200..204 + twins of 0..4
  private def corpusFp = withHash(0L until 30L)
  private def batchFp = withHash((200L until 205L) ++ (100000L until 100005L))

  test("probe against a persisted index equals the cross slice of the union run") {
    val dir = Files.createTempDirectory("phash_idx").toString
    NearDup.buildFingerprintIndex(corpusFp, "media_id", "fp", dir)
    val probed = NearDup.fingerprintPairsAgainstIndex(
      batchFp, "media_id", "fp", dir, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batchIds = ((200L until 205L) ++ (100000L until 100005L)).toSet
    val full = NearDup.fingerprintPairs(
      corpusFp.unionByName(batchFp), "media_id", "fp", maxHamming = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => batchIds.contains(a) ^ batchIds.contains(b) }
      .map { case (a, b, h) => // probe emits (new, corpus); normalize
        if (batchIds.contains(a)) (a, b, h) else (b, a, h)
      }.toSet
    assert(probed == full)
    // the five twins must be found at hamming 0
    assert((0L until 5L).forall(i => probed.contains((100000L + i, i, 0))))
  }

  test("append equals rebuild from the union; tombstoned ids stop pairing") {
    val dir1 = Files.createTempDirectory("phash_app1").toString
    val dir2 = Files.createTempDirectory("phash_app2").toString
    val extra = withHash(300L until 310L)
    NearDup.buildFingerprintIndex(corpusFp, "media_id", "fp", dir1)
    NearDup.appendToFingerprintIndex(extra, "media_id", "fp", dir1)
    NearDup.buildFingerprintIndex(corpusFp.unionByName(extra), "media_id", "fp", dir2)
    def fpOf(d: String) = spark.read.parquet(s"$d/fp.parquet")
      .collect().map(_.toSeq).toSet
    assert(fpOf(dir1) == fpOf(dir2))
    // tombstone the twin targets: probing their twins finds nothing
    NearDup.removeFromSimhashIndex(
      (0L until 5L).toDF("media_id"), "media_id", dir1)
    val probed = NearDup.fingerprintPairsAgainstIndex(
      withHash(100000L until 100005L), "media_id", "fp", dir1, maxHamming = 4)
    assert(probed.count() == 0)
  }
}
