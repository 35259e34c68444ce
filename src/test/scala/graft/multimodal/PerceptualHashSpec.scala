package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** dHash semantics and the perceptual near-dup path: brightness-shift
  * invariance (the planted-twin construction q62/q63 rely on),
  * sensitivity to distinct content, null on undecodable bytes, and the
  * fingerprint chunk join finding planted twins.
  */
class PerceptualHashSpec extends GraftSparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, f(x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hashOf(bytes: Array[Byte]): Option[Long] = {
    val r = Seq(Tuple1(bytes)).toDF("bytes")
      .select(PerceptualHash.dhash64(col("bytes")).as("fp")).collect().head
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("uniform brightness shift leaves the hash unchanged; content changes it") {
    def pattern(x: Int, y: Int): Int = 5 + (x * 31 + y * 17) % 200
    val base = hashOf(png(40, 30, pattern))
    val brighter = hashOf(png(40, 30, (x, y) => pattern(x, y) + 40))
    val other = hashOf(png(40, 30, (x, y) => 5 + (x * 13 + y * 41) % 200))
    assert(base.isDefined && base == brighter)
    assert(base != other)
  }

  test("re-encode of the same pixels hashes identically; garbage bytes hash to null") {
    def pattern(x: Int, y: Int): Int = (x * 7 + y * 29) % 256
    // encode the same raster twice independently (fresh objects)
    assert(hashOf(png(33, 27, pattern)) == hashOf(png(33, 27, pattern)))
    assert(hashOf("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(hashOf(Array.emptyByteArray).isEmpty)
  }

  test("indexed-color (GIF) encodes hash through the palette, near the grayscale hash") {
    def pattern(x: Int, y: Int): Int = 5 + (x * 29 + y * 13) % 230
    val gray = png(40, 32, pattern)
    // same pixels encoded as GIF: ImageIO round-trips it with an
    // IndexColorModel, where raw raster samples are palette INDICES
    val img = ImageIO.read(new java.io.ByteArrayInputStream(gray))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", bos)
    val gif = bos.toByteArray
    val hGray = hashOf(gray).get
    val hGif = hashOf(gif).get
    val hamming = java.lang.Long.bitCount(hGray ^ hGif)
    // resolved through the color model the hashes agree up to gray
    // round-trip error; comparing raw palette indices instead would
    // put them ~32 bits apart (random)
    assert(hamming <= 8, s"gif vs png hamming $hamming — palette indices leaked into the hash")
  }

  test("patternImages twins are byte-distinct but dHash-identical; distinct seeds differ") {
    val imgs = Seq(1L, 2L, 100001L).toDF("doc_id")
    val rows = Multimodal.patternImages(imgs, "doc_id")
      .select(col("media_id"), md5(col("bytes")).as("m"),
        PerceptualHash.dhash64(col("bytes")).as("fp"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows(1L)._1 != rows(100001L)._1, "twin bytes must differ (md5)")
    assert(rows(1L)._2 == rows(100001L)._2, "twin dHash must be identical")
    assert(rows(1L)._2 != rows(2L)._2, "distinct patterns must differ")
  }

  test("audioHash64: gain-invariant, content-sensitive, null on non-audio") {
    val rows = Multimodal.patternWavs(
      Seq(1L, 2L, 100001L).toDF("doc_id"), "doc_id")
      .select(col("media_id"), md5(col("bytes")).as("m"),
        PerceptualHash.audio_hash64(col("bytes")).as("fp"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows(1L)._1 != rows(100001L)._1, "half-gain twin bytes must differ")
    assert(rows(1L)._2 == rows(100001L)._2, "half-gain twin hash must be identical")
    assert(rows(1L)._2 != rows(2L)._2, "distinct profiles must differ")
    val broken = Seq(Tuple1("not audio".getBytes("UTF-8"))).toDF("bytes")
      .select(PerceptualHash.audio_hash64(col("bytes")).as("fp")).collect().head
    assert(broken.isNullAt(0))
  }

  test("videoFrameHashes: re-edit twins share every sampled frame hash; containment pairs them") {
    val rows = Multimodal.patternAvis(
      Seq(1L, 2L, 100001L).toDF("doc_id"), "doc_id")
    val md5s = rows.select(col("media_id"), md5(col("bytes")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(md5s(1L) != md5s(100001L), "twin container bytes must differ (odd frames)")
    val hashes = Multimodal.videoFrameHashes(rows, stride = 2, maxFrames = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val bySet = hashes.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(bySet(1L) == bySet(100001L), "sampled frame-hash sets must be identical")
    assert(bySet(1L) != bySet(2L), "distinct videos must differ")
    val pairs = graft.textops.NearDup.fingerprintSetPairs(
      Multimodal.videoFrameHashes(rows, stride = 2, maxFrames = 4)
        .select(col("media_id").as("id"), col("fhash").as("fp")).distinct(),
      minSharedRatio = 0.6, maxBucketSize = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.toSeq == Seq((1L, 100001L, 1.0)))
  }

  test("fingerprintPairs finds planted twins and drops null fingerprints") {
    val imgs = Multimodal.patternImages(
      (0L until 20L).union((100000L until 100020L)).toDF("doc_id"), "doc_id")
    val withBroken = imgs.unionByName(
      Seq((555L, "broken".getBytes("UTF-8"))).toDF("media_id", "bytes"))
    val fps = withBroken.select(col("media_id"),
      PerceptualHash.dhash64(col("bytes")).as("fp"))
    val pairs = graft.textops.NearDup.fingerprintPairs(
      fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val twinPairs = pairs.filter { case (a, b, _) => b == a + 100000 }
    assert(twinPairs.length == 20, s"all 20 twins found, got ${twinPairs.length}")
    assert(twinPairs.forall(_._3 == 0), "twin hamming must be 0")
    assert(!pairs.exists { case (a, b, _) => a == 555L || b == 555L },
      "null-fingerprint rows must not pair")
  }
}
