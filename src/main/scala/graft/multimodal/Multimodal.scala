package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped decode / feature-extract /
  * resize / frame-sample operators over `mapPartitions`.
  *
  * The IMAGE decode path is REAL: `kind='image'` payloads go through
  * `javax.imageio` (PNG/JPEG/GIF/BMP ship with the JDK), with
  * width/height/features read from the actual decoded raster. The
  * AUDIO decode path is REAL too: `javax.sound.sampled` parses
  * WAV/AIFF/AU containers (also JDK-shipped), yielding the true sample
  * rate / frame count / amplitude features. VIDEO decode REMAINS A
  * STUB — no video codec ships with the JDK and this container has no
  * external ones — producing deterministic fake properties from the
  * raw bytes; payloads the real codecs cannot parse fall back to the
  * same stub (documented, not silent: `decoded_real` in the output
  * says which path ran). Everything around the codec — schema, binary
  * column handling, partition-batched iteration, typed output shape —
  * is identical for all paths.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata (the 100 TB layout —
    * content-addressed binary with pushdown-friendly scalar metadata
    * beside it; filters on kind/n_bytes prune parquet row groups without
    * touching the payload).
    */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      bytes: Array[Byte],
      n_bytes: Long,
      content_md5: String)

  /** Typed decode output. `decoded_real` = true when an actual codec
    * (ImageIO) produced the properties, false for the stubbed paths.
    */
  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      feature: Array[Float],
      decoded_real: Boolean)

  /** Synthesize a media table from documents (text bytes stand in for
    * encoded payloads; kind cycles deterministically).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"))
      .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
      .withColumn("content_md5", md5(col("bytes")))

  /** Replace image-kind payloads with REAL (deterministically sized and
    * shaded) PNG bytes, encoded per partition with ImageIO — the input
    * generator for exercising the real decode path end-to-end. Image
    * `media_id` m gets a (16 + m%32) × (16 + (7m)%32) solid-gray PNG of
    * level m%256, so a downstream oracle can predict the decoded
    * properties without seeing the bytes. Metadata columns are
    * recomputed over the new payloads.
    */
  def withSyntheticImagePayloads(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val replaced = media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false) // in-memory encode, no temp-file churn
        it.map { case (id, kind, bytes) =>
          if (kind == "image")
            (id, kind, encodePng(
              16 + (id % 32).toInt, 16 + ((id * 7) % 32).toInt, (id % 256).toInt))
          else (id, kind, bytes)
        }
      }.toDF("media_id", "kind", "bytes")
    replaced
      .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
      .withColumn("content_md5", md5(col("bytes")))
  }

  /** Replace audio-kind payloads with REAL PCM WAV bytes (16-bit mono,
    * hand-rolled RIFF container for byte determinism). Audio `media_id`
    * m gets sample rate `8000 + (m%4)*4000` and `100 + m%900` frames,
    * so a downstream oracle predicts the decoded properties without
    * seeing the bytes. Metadata columns recomputed over new payloads.
    */
  def withSyntheticAudioPayloads(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val replaced = media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, bytes) =>
        if (kind == "audio")
          (id, kind, encodeWav(
            8000 + (id % 4).toInt * 4000, 100 + (id % 900).toInt, (1 + id % 7).toInt))
        else (id, kind, bytes)
      }.toDF("media_id", "kind", "bytes")
    replaced
      .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
      .withColumn("content_md5", md5(col("bytes")))
  }

  /** Minimal PCM WAV writer: RIFF/fmt/data chunks, 16-bit mono LE; the
    * sample wave is a deterministic sawtooth seeded by `step`.
    */
  private def encodeWav(sampleRate: Int, nSamples: Int, step: Int): Array[Byte] = {
    val dataSize = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      buf.putShort((((i * step) % 256 - 128) * 64).toShort)
      i += 1
    }
    buf.array()
  }

  private def encodePng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val row = Array.fill(w)(gray)
    var y = 0
    while (y < h) { img.getRaster.setSamples(0, y, w, 1, 0, row); y += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val FeatureDim = 8

  /** Decode: real ImageIO for images, deterministic stub for the
    * codec-less kinds. Batch shape (one iterator per partition, codec
    * state initialized once) mirrors a production binding.
    */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes")).as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, kind, bytes) =>
          (kind match {
            case "image" => decodeImage(id, bytes)
            case "audio" => decodeAudio(id, bytes)
            case _ => None
          }).getOrElse(stubDecode(id, kind, bytes))
        }
      }
  }

  /** Real audio decode: container properties via `javax.sound.sampled`
    * (WAV/AIFF/AU ship with the JDK — no external codecs). width/height
    * are 0 (not meaningful), n_frames is the PCM frame count, feature =
    * per-band mean |amplitude| (FeatureDim bands, 0..1 scale, 16-bit
    * mono assumed for the feature pass — the synthetic payload shape).
    */
  private def decodeAudio(id: Long, bytes: Array[Byte]): Option[DecodedMedia] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val pcm = in.readAllBytes()
        // getFrameLength is NOT_SPECIFIED (-1) for containers without a
        // length header (streamed AU/AIFC); the PCM is fully read
        // anyway, so fall back to counting it
        val nFrames =
          if (in.getFrameLength >= 0) in.getFrameLength.toInt
          else if (fmt.getFrameSize > 0) pcm.length / fmt.getFrameSize
          else 0
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = pcm.length / 2
        val feature = Array.tabulate(FeatureDim) { band =>
          val i0 = (n.toLong * band / FeatureDim).toInt
          val i1 = math.max(i0 + 1, (n.toLong * (band + 1) / FeatureDim).toInt)
          var acc = 0.0
          var cnt = 0
          var i = i0
          while (i < math.min(i1, n)) {
            acc += math.abs(bb.getShort(i * 2).toDouble) / 32768.0
            cnt += 1
            i += 1
          }
          if (cnt == 0) 0f else (acc / cnt).toFloat
        }
        Some(DecodedMedia(id, "audio", 0, 0, nFrames,
          fmt.getSampleRate.toInt, feature, decoded_real = true))
      } finally in.close()
    } catch { case _: Exception => None } // not a decodable container -> stub

  /** Real image decode: dimensions from the codec; feature = per-band
    * mean luminance (FeatureDim horizontal bands, 0..255 scale).
    */
  private def decodeImage(id: Long, bytes: Array[Byte]): Option[DecodedMedia] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        // raw raster samples, NOT getRGB: getRGB converts a grayscale
        // raster through gray->sRGB gamma, turning stored level 3 into 28.
        // Bands beyond the first three (alpha) are excluded.
        val raster = img.getRaster
        val nb = math.min(raster.getNumBands, 3)
        val feature = Array.tabulate(FeatureDim) { band =>
          val y0 = (h.toLong * band / FeatureDim).toInt
          val y1 = math.max(y0 + 1, (h.toLong * (band + 1) / FeatureDim).toInt)
          var acc = 0.0
          var cnt = 0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = 0
            while (x < w) {
              var b = 0
              var px = 0.0
              while (b < nb) { px += raster.getSample(x, y, b); b += 1 }
              acc += px / nb
              cnt += 1
              x += 1
            }
            y += 1
          }
          if (cnt == 0) 0f else (acc / cnt).toFloat
        }
        DecodedMedia(id, "image", w, h, 1, 0, feature, decoded_real = true)
      }
    } catch { case _: Exception => None } // not a decodable image -> stub

  /** The deterministic fake (audio/video, and undecodable image bytes). */
  private def stubDecode(id: Long, kind: String, bytes: Array[Byte]): DecodedMedia = {
    val n = bytes.length
    val width = 64 + (n % 512)
    val height = 64 + ((n * 7) % 512)
    val frames = if (kind == "video") 1 + (n % 240) else 1
    val rate = if (kind == "audio") 16000 else 0
    val feature = Array.tabulate(FeatureDim) { i =>
      if (n == 0) 0f
      else (bytes(i * Math.max(1, n / FeatureDim) % n) & 0xff) / 255f
    }
    DecodedMedia(id, kind, width, height, frames, rate, feature, decoded_real = false)
  }

  /** Binary-level stats — pure Column ops, no decode needed. */
  def stats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"), col("n_bytes"), col("content_md5"))

  /** STUB resize: recompute target dimensions preserving aspect ratio;
    * a real implementation re-encodes the payload per batch. The typed
    * in/out shape and partition-batched iteration are the real contract.
    */
  def resizeStub(decoded: Dataset[DecodedMedia], maxSide: Int): Dataset[DecodedMedia] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.mapPartitions { it =>
      it.map { d =>
        val side = math.max(d.width, d.height)
        if (side <= maxSide) d
        else {
          val scale = maxSide.toDouble / side
          d.copy(
            width = math.max(1, (d.width * scale).toInt),
            height = math.max(1, (d.height * scale).toInt))
        }
      }
    }
  }

  /** Frame sampling for video rows: keep every `stride`-th frame index
    * up to `maxFrames` — emitted as (media_id, frame_idx) rows a real
    * decoder would attach frame features to. Non-video rows pass through
    * with a single frame 0.
    */
  def frameSample(decoded: Dataset[DecodedMedia], stride: Int, maxFrames: Int): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.flatMap { d =>
      if (d.kind != "video") Seq((d.media_id, 0))
      else (0 until d.n_frames by stride).take(maxFrames).map(f => (d.media_id, f))
    }.toDF("media_id", "frame_idx")
  }
}
