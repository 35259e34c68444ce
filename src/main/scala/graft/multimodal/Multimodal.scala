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
  * rate / frame count / amplitude features. The VIDEO path is a REAL
  * CONTAINER PROBE: no video *codec* ships with the JDK, but the MP4
  * box structure (moov/trak/tkhd geometry, stbl/stsz sample counts)
  * and the WebM EBML tree (TrackEntry/Video PixelWidth/PixelHeight)
  * are plain binary headers — [[decodeVideo]] parses them directly,
  * yielding true width/height/frame-count with `decoded_real = true`.
  * Pixel-level features for MP4/WebM would need an actual codec, so
  * those probed rows keep an all-zero feature vector (documented, not
  * faked) — but MJPEG-in-AVI needs no external codec: each `00dc`
  * movi chunk is a plain JPEG that `javax.imageio` decodes, so AVI
  * rows get REAL per-frame pixel features (per-band mean luminance
  * across sampled frames, same 0..255 scale as the image path).
  * Payloads no parser recognizes fall back to the deterministic stub
  * (`decoded_real = false` says which path ran). Everything around the
  * codec — schema, binary column handling, partition-batched
  * iteration, typed output shape — is identical for all paths.
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

  /** Replace video-kind payloads with REAL minimal MP4 containers
    * (ftyp + moov/mvhd/trak/tkhd/mdia/minf/stbl/stsz — a valid box tree
    * with no media data, which is all a metadata probe reads). Video
    * `media_id` m gets width `128 + m%64`, height `72 + (3m)%64`, and
    * `24 + m%240` samples, so a downstream oracle predicts the probed
    * properties without seeing the bytes.
    */
  def withSyntheticVideoPayloads(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val replaced = media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, bytes) =>
        if (kind == "video")
          (id, kind, encodeMp4(
            128 + (id % 64).toInt, 72 + ((id * 3) % 64).toInt, 24 + (id % 240).toInt))
        else (id, kind, bytes)
      }.toDF("media_id", "kind", "bytes")
    replaced
      .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
      .withColumn("content_md5", md5(col("bytes")))
  }

  /** Replace video-kind payloads with REAL MJPEG-in-AVI containers:
    * a RIFF `AVI ` tree (hdrl/avih/strl + movi) whose `00dc` chunks are
    * genuine ImageIO-encoded JPEG frames — the one video format the JDK
    * can decode pixels for. Video `media_id` m gets width `32 + m%16`,
    * height `24 + (5m)%16`, `3 + m%6` frames, and frame f is solid gray
    * `16 + (37m + 11f) % 224`, so a downstream check predicts both the
    * probed geometry and (within JPEG quantization error, <1 level for
    * a solid-gray frame) the decoded pixel values without the bytes.
    */
  def withSyntheticAviVideoPayloads(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val replaced = media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, kind, bytes) =>
          if (kind == "video") {
            val grays = Array.tabulate(3 + (id % 6).toInt)(f => 16 + ((id * 37 + f * 11) % 224).toInt)
            (id, kind, encodeAviMjpeg(
              32 + (id % 16).toInt, 24 + ((id * 5) % 16).toInt, grays))
          } else (id, kind, bytes)
        }
      }.toDF("media_id", "kind", "bytes")
    replaced
      .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
      .withColumn("content_md5", md5(col("bytes")))
  }

  private def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val size = 8 + payload.map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(size) // MP4 is big-endian
    buf.putInt(size).put(typ.getBytes("US-ASCII"))
    payload.foreach(buf.put)
    buf.array()
  }

  /** Minimal MP4: the box tree a metadata probe walks, nothing else.
    * tkhd carries width/height as 16.16 fixed point; stsz uses a fixed
    * sample size so `sample_count` needs no per-sample table.
    */
  private def encodeMp4(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val timescale = 600
    val duration = nFrames * 25 // 24 fps at timescale 600
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII"),
      java.nio.ByteBuffer.allocate(4).putInt(512).array(),
      "isomiso2".getBytes("US-ASCII"))
    val unityMatrix = {
      val b = java.nio.ByteBuffer.allocate(36)
      b.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      b.array()
    }
    val mvhd = mp4Box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(timescale).putInt(duration)
        .putInt(0x00010000) // rate 1.0
        .putShort(0x0100.toShort).putShort(0) // volume, reserved
        .putLong(0L) // reserved
        .put(unityMatrix)
      b.position(b.position() + 24) // pre_defined[6]
      b.putInt(2) // next track id
      b.array()
    })
    val tkhd = mp4Box("tkhd", {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(7) // version 0, flags: enabled|in_movie|in_preview
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(1).putInt(0) // track id, reserved
        .putInt(duration)
        .putLong(0L) // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
        .put(unityMatrix)
        .putInt(width << 16).putInt(height << 16) // 16.16 fixed
      b.array()
    })
    val stsz = mp4Box("stsz", {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(0) // version + flags
        .putInt(256) // fixed sample size (no table follows)
        .putInt(nFrames)
      b.array()
    })
    val stbl = mp4Box("stbl", stsz)
    val minf = mp4Box("minf", stbl)
    val mdia = mp4Box("mdia", minf)
    val trak = mp4Box("trak", tkhd, mdia)
    val moov = mp4Box("moov", mvhd, trak)
    ftyp ++ moov
  }

  /** Minimal PCM WAV writer: RIFF/fmt/data chunks, 16-bit mono LE; the
    * sample wave is a deterministic sawtooth seeded by `step`.
    */
  private def encodeWav(sampleRate: Int, nSamples: Int, step: Int): Array[Byte] =
    wavPcmContainer(sampleRate,
      Array.tabulate(nSamples)(i => (((i * step) % 256 - 128) * 64).toShort))

  /** The one 44-byte RIFF/WAVE/fmt/data header assembly (16-bit mono
    * PCM) — shared by every WAV generator so the header constants
    * cannot drift between corpora.
    */
  private def wavPcmContainer(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Synthesize a STRUCTURED (non-solid) grayscale PNG corpus for the
    * perceptual-hash family: id -> (media_id, bytes) where the pixel
    * pattern derives from `id % twinOffset`, so ids m and
    * m + twinOffset render the SAME pattern and the twin additionally
    * gets a uniform `+brightnessStep` level shift — a byte-distinct
    * near-duplicate (different md5, identical dHash: gradient
    * comparisons are shift-invariant) with everything else pairwise
    * dissimilar. Pattern: 9x8-ish cells of hash-derived levels in
    * [5, 240], dims 24+seed%16 x 24+(5*seed)%16.
    */
  def patternImages(
      ids: DataFrame, idCol: String,
      twinOffset: Long = 100000L, brightnessStep: Int = 4): DataFrame = {
    require(twinOffset > 0, s"patternImages: twinOffset must be positive")
    require(brightnessStep >= 0 && brightnessStep <= 10,
      s"patternImages: brightnessStep must be in [0, 10] (values stay below 255)")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          val seed = id % twinOffset
          val bright = if (id >= twinOffset) brightnessStep else 0
          (id, encodePatternPng(seed, bright))
        }
      }.toDF("media_id", "bytes")
  }

  /** Synthesize a structured PCM WAV corpus for the audio
    * perceptual-hash family — [[patternImages]]'s audio analogue:
    * ids m and m + twinOffset render the SAME slice-energy profile,
    * the twin at exactly HALF gain (every sample value is even, so
    * the halving is exact and [[PerceptualHash.audioHash64]]'s
    * energy-gradient comparisons are bit-identical) — a byte-distinct,
    * hash-identical near-duplicate; distinct seeds get distinct
    * profiles.
    */
  def patternWavs(
      ids: DataFrame, idCol: String, twinOffset: Long = 100000L): DataFrame = {
    require(twinOffset > 0, "patternWavs: twinOffset must be positive")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .map { id =>
        val seed = id % twinOffset
        (id, encodePatternWav(seed, halve = id >= twinOffset))
      }.toDF("media_id", "bytes")
  }

  private def encodePatternWav(seed: Long, halve: Boolean): Array[Byte] = {
    val n = 2000 + (seed % 500).toInt
    wavPcmContainer(8000, Array.tabulate(n) { j =>
      // 64 piecewise-constant amplitude segments; even values so the
      // twin's /2 is exact; alternating sign keeps a zero-mean wave
      val amp = 2 * (50 + patternLevel(seed, (j.toLong * 64 / n).toInt, 0) * 3)
      val v = (if (j % 2 == 0) amp else -amp)
      (if (halve) v / 2 else v).toShort
    })
  }

  /** Synthesize a structured MJPEG-in-AVI corpus for the VIDEO
    * perceptual-hash family: ids m and m + twinOffset share
    * byte-identical EVEN frames (the ones a stride-2 sampler hashes)
    * while their ODD frames differ — a re-edited near-duplicate whose
    * sampled-frame dHash set matches the original exactly, with the
    * container bytes distinct. Frame content is the [[patternImages]]
    * cell pattern, JPEG-encoded (deterministic encoder: same input,
    * same bytes). 4 + seed%3 frames of 32x24.
    */
  def patternAvis(
      ids: DataFrame, idCol: String, twinOffset: Long = 100000L): DataFrame = {
    require(twinOffset > 0, "patternAvis: twinOffset must be positive")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          val seed = id % twinOffset
          val frames = Array.tabulate(4 + (seed % 3).toInt) { f =>
            // even frames keyed by the SHARED seed, odd by the full id:
            // twins agree exactly on what stride-2 sampling sees
            val frameSeed = if (f % 2 == 0) seed * 31 + f else id * 31 + f
            encodePatternJpeg(32, 24, frameSeed)
          }
          (id, encodeAviMjpegFrames(32, 24, frames))
        }
      }.toDF("media_id", "bytes")
  }

  private def encodePatternJpeg(w: Int, h: Int, seed: Long): Array[Byte] =
    encodePatternImage(w, h, seed, brightness = 0, "jpg")

  /** Per-sampled-frame perceptual hashes of AVI payloads:
    * (media_id, frame_idx, fhash) for every `stride`-th movi frame up
    * to `maxFrames`, hashing ONLY the sampled frames' (offset, len)
    * JPEG slices — the q54 decode shape with
    * [[PerceptualHash.dhash64]] instead of mean luminance. Videos then
    * near-dup via shared frame hashes
    * ([[graft.textops.NearDup.fingerprintSetPairs]] — the winnow
    * containment machinery over frame fingerprints). Undecodable
    * frames are skipped; non-AVI payloads produce no rows.
    */
  def videoFrameHashes(media: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    require(stride > 0, s"videoFrameHashes: stride must be positive, got $stride")
    require(maxFrames > 0, s"videoFrameHashes: maxFrames must be positive, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          parseAvi(bytes).iterator.flatMap { case (_, _, _, chunks) =>
            (0 until chunks.length by stride).take(maxFrames).iterator.flatMap { fi =>
              val (off, len) = chunks(fi)
              Option(PerceptualHash.dhash64Slice(bytes, off, len))
                .map(h => (id, fi, h.longValue()))
            }
          }
        }
      }.toDF("media_id", "frame_idx", "fhash")
  }

  /** Deterministic avalanche for the pattern cells (splitmix64-style
    * finalizer over public constants).
    */
  private def patternLevel(seed: Long, cx: Int, cy: Int): Int = {
    var z = seed * 0x9E3779B97F4A7C15L + cx * 0xBF58476D1CE4E5B9L +
      cy * 0x94D049BB133111EBL
    z ^= z >>> 31; z *= 0x7FB5D329728EA185L; z ^= z >>> 27
    (((z & 0x7FFFFFFFFFFFFFFFL) % 236L).toInt)
  }

  private def encodePatternPng(seed: Long, brightness: Int): Array[Byte] =
    encodePatternImage(
      24 + (seed % 16).toInt, 24 + ((seed * 5) % 16).toInt, seed, brightness, "png")

  /** The one pattern-raster encode (9x8-ish hash-level cells over a
    * TYPE_BYTE_GRAY raster) behind every pattern corpus — image twins
    * (PNG, brightness-shifted) and video frames (JPEG) must share the
    * cell formula or the corpora drift apart. Cell alignment with
    * dHash's grid is NOT required (the twin constructions rely on
    * brightness/gain invariance, not cell alignment) — x*9/w is just a
    * convenient piecewise-constant structure.
    */
  private def encodePatternImage(
      w: Int, h: Int, seed: Long, brightness: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          5 + patternLevel(seed, x * 9 / w, y * 8 / h) + brightness)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
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

  private def encodeJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val row = Array.fill(w)(gray)
    var y = 0
    while (y < h) { img.getRaster.setSamples(0, y, w, 1, 0, row); y += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** RIFF chunk: fourcc + LE size (unpadded) + data padded to even. */
  private def riffChunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = payload.length & 1
    val buf = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(fourcc.getBytes("US-ASCII")).putInt(payload.length).put(payload)
    buf.array() // trailing pad byte is the allocate() zero
  }

  private def riffList(listType: String, children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ children.flatten)

  /** Minimal MJPEG-in-AVI: RIFF(`AVI ` LIST(hdrl avih LIST(strl strh
    * strf)) LIST(movi 00dc...)) with each `00dc` chunk a real JPEG of a
    * solid-gray frame. All fields little-endian (RIFF), geometry in both
    * avih and the BITMAPINFOHEADER, fourcc/compression `MJPG`.
    */
  private def encodeAviMjpeg(width: Int, height: Int, frameGrays: Array[Int]): Array[Byte] =
    encodeAviMjpegFrames(width, height,
      frameGrays.map(g => encodeJpeg(width, height, g)))

  /** The container assembly over PRE-ENCODED JPEG frames — opened up so
    * the video near-dup corpus ([[patternAvis]]) can carry patterned
    * (non-solid) frames through the identical RIFF tree.
    */
  private def encodeAviMjpegFrames(
      width: Int, height: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(41667) // usec/frame (24 fps)
        .putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
        .putInt(frames.length) // dwTotalFrames
        .putInt(0).putInt(1).putInt(0) // initialFrames, streams, suggestedBufSize
        .putInt(width).putInt(height)
      b.array() // reserved[4] = zeros
    }
    val strh = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0) // flags, priority, language
        .putInt(0) // initialFrames
        .putInt(1).putInt(24) // scale, rate -> 24 fps
        .putInt(0).putInt(frames.length) // start, length
        .putInt(0).putInt(-1).putInt(0) // suggestedBufSize, quality, sampleSize
        .putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort) // rcFrame
      b.array()
    }
    val strf = {
      val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24) // planes, bit count
        .put("MJPG".getBytes("US-ASCII"))
        .putInt(width * height * 3)
      b.array() // resolution/clr fields = zeros
    }
    val hdrl = riffList("hdrl",
      riffChunk("avih", avih),
      riffList("strl", riffChunk("strh", strh), riffChunk("strf", strf)))
    val movi = riffList("movi",
      frames.map(f => riffChunk("00dc", f)).toSeq: _*)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val buf = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    buf.array()
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
            case "video" => decodeVideo(id, bytes)
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

  /** Real video decode/probe. MJPEG-in-AVI is a FULL decode: the movi
    * `00dc` chunks are plain JPEGs, so geometry comes from the avih
    * header and the feature vector carries REAL pixel data — band b is
    * the mean luminance of the b-th of up to FeatureDim evenly-spaced
    * sampled frames (0..255 scale, matching the image path; unused
    * bands stay 0 when the clip has fewer frames). MP4/WebM remain a
    * CONTAINER PROBE: true geometry/sample count from the box/EBML
    * headers, but pixel features would need a codec the JDK lacks, so
    * their feature vector is all-zero and `sample_rate` is 0.
    * Unrecognized containers return None (stub fallback).
    */
  private def decodeVideo(id: Long, bytes: Array[Byte]): Option[DecodedMedia] =
    parseAvi(bytes).map { case (w, h, declaredFrames, chunks) =>
      val n = chunks.length
      val take = math.min(FeatureDim, n)
      val feature = new Array[Float](FeatureDim)
      var b = 0
      while (b < take) {
        val (off, len) = chunks((n.toLong * b / take).toInt)
        feature(b) = jpegFrame(bytes, off, len).map(_._3).getOrElse(0f)
        b += 1
      }
      DecodedMedia(id, "video", w, h, math.max(declaredFrames, n), 0,
        feature, decoded_real = true)
    } orElse (parseMp4(bytes) orElse parseWebm(bytes)).map { case (w, h, frames) =>
      DecodedMedia(id, "video", w, h, frames, 0,
        new Array[Float](FeatureDim), decoded_real = true)
    }

  /** Decode one embedded JPEG frame -> (width, height, mean luminance
    * over all bands, 0..255). None when the slice isn't decodable.
    */
  private def jpegFrame(bytes: Array[Byte], off: Int, len: Int): Option[(Int, Int, Float)] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes, off, len))).map { img =>
        val raster = img.getRaster
        val nb = math.min(raster.getNumBands, 3)
        var acc = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            var b = 0
            var px = 0.0
            while (b < nb) { px += raster.getSample(x, y, b); b += 1 }
            acc += px / nb
            x += 1
          }
          y += 1
        }
        (img.getWidth, img.getHeight,
          (acc / (img.getWidth.toLong * img.getHeight)).toFloat)
      }
    } catch { case _: Exception => None }

  private def be32(bytes: Array[Byte], off: Int): Int =
    ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
      ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)

  /** MP4/ISO-BMFF box walk: width/height from `tkhd` (16.16 fixed,
    * version 0 and 1 layouts), sample count from `stsz`. Only accepts
    * payloads that actually lead with an `ftyp` or `moov` box.
    */
  private def parseMp4(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 16) return None
    val lead = new String(bytes, 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (lead != "ftyp" && lead != "moov") return None
    var width = -1
    var height = -1
    var frames = 0
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = be32(bytes, off)
        if (size < 8 || off + size > end) return // malformed box: stop
        val typ = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val p = off + 8 // payload start
        typ match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" => walk(p, off + size)
          case "tkhd" if p < end =>
            val version = bytes(p) & 0xff
            // v0: width at payload+76; v1 widens ctime/mtime/duration
            // from 4 to 8 bytes each (+12)
            val wOff = p + (if (version == 1) 88 else 76)
            if (wOff + 8 <= off + size) {
              width = be32(bytes, wOff) >>> 16
              height = be32(bytes, wOff + 4) >>> 16
            }
          case "stsz" if p + 12 <= off + size =>
            frames = be32(bytes, p + 8)
          case _ => ()
        }
        off += size
      }
    }
    walk(0, bytes.length)
    if (width > 0 && height > 0) Some((width, height, frames)) else None
  }

  /** WebM/Matroska EBML walk: PixelWidth/PixelHeight from
    * Segment > Tracks > TrackEntry > Video. Frame count is not in the
    * headers (it would need a cluster scan), so it reports 0.
    */
  private def parseWebm(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 4 || be32(bytes, 0) != 0x1a45dfa3) return None
    // vint: leading zeros of the first byte give the length; ids keep
    // the marker bit, sizes strip it
    def vintLen(b: Int): Int = {
      var mask = 0x80
      var len = 1
      while (len <= 8 && (b & mask) == 0) { mask >>= 1; len += 1 }
      len
    }
    def readId(off: Int): (Long, Int) = {
      val len = vintLen(bytes(off) & 0xff)
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
      (v, len)
    }
    def readSize(off: Int): (Long, Int) = {
      val first = bytes(off) & 0xff
      val len = vintLen(first)
      var v = (first & (0xff >> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
      (v, len)
    }
    var width = -1
    var height = -1
    val containers = Set(0x18538067L, 0x1654ae6bL, 0xaeL, 0xe0L) // Segment, Tracks, TrackEntry, Video
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off < end && (width < 0 || height < 0)) {
        if (off + 2 > end) return
        val (id, idLen) = readId(off)
        if (idLen > 8 || off + idLen >= end) return
        val (size, szLen) = readSize(off + idLen)
        if (szLen > 8) return
        val p = off + idLen + szLen
        if (size < 0 || p + size > end) return
        if (containers.contains(id)) walk(p, p + size.toInt)
        else if (id == 0xb0L || id == 0xbaL) {
          var v = 0L
          var i = 0
          while (i < size) { v = (v << 8) | (bytes(p + i) & 0xff); i += 1 }
          if (id == 0xb0L) width = v.toInt else height = v.toInt
        }
        off = p + size.toInt
      }
    }
    try {
      // skip the EBML header element, then walk the rest (Segment...)
      val (_, hIdLen) = readId(0)
      val (hSize, hSzLen) = readSize(hIdLen)
      val segStart = hIdLen + hSzLen + hSize.toInt
      if (segStart < bytes.length) walk(segStart, bytes.length)
    } catch { case _: ArrayIndexOutOfBoundsException => return None }
    if (width > 0 && height > 0) Some((width, height, 0)) else None
  }

  private def le32(bytes: Array[Byte], off: Int): Int =
    (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
      ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)

  /** RIFF/AVI walk: geometry + declared frame count from `avih`, and the
    * (offset, length) slice of every `00dc`/`00db` movi chunk — the
    * embedded MJPEG frames, returned as slices so callers decode only
    * the frames they sample. Chunks are even-aligned (RIFF padding).
    * Hardened against adversarial payloads (this runs inside tasks over
    * crawled bytes): size arithmetic in Long so a 0x7FFFFFFF chunk size
    * can't overflow into a negative offset, LIST recursion depth
    * bounded, and any residual index error degrades to None (stub
    * fallback) instead of killing the task.
    */
  private def parseAvi(bytes: Array[Byte]): Option[(Int, Int, Int, Vector[(Int, Int)])] =
    try {
      if (bytes.length < 12) return None
      def fourcc(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      var width = -1
      var height = -1
      var declared = 0
      val frames = Vector.newBuilder[(Int, Int)]
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 16) return // nested-LIST bomb: stop descending
        var off = start
        while (off >= 0 && off + 8 <= end) {
          val typ = fourcc(off)
          val size = le32(bytes, off + 4)
          val p = off + 8
          if (size < 0 || p.toLong + size > end) return // malformed chunk: stop
          typ match {
            case "LIST" if size >= 4 =>
              val listType = fourcc(p)
              if (listType == "hdrl" || listType == "strl" || listType == "movi" ||
                listType == "rec ") walk(p + 4, p + size, depth + 1)
            case "avih" if size >= 40 =>
              declared = le32(bytes, p + 16)
              width = le32(bytes, p + 32)
              height = le32(bytes, p + 36)
            case "00dc" | "00db" if size > 0 =>
              frames += ((p, size))
            case _ => ()
          }
          off = p + size + (size & 1)
        }
      }
      walk(12, bytes.length, 0)
      if (width > 0 && height > 0) Some((width, height, declared, frames.result()))
      else None
    } catch { case _: RuntimeException => None } // corrupt container -> stub

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

  /** REAL image resize: decode (ImageIO) -> aspect-preserving bilinear
    * Graphics2D redraw -> PNG re-encode, per partition. Image rows whose
    * longest side exceeds `maxSide` get a re-encoded payload and
    * `resized = true`; everything else (non-image kinds, already-small
    * images, undecodable bytes) passes through untouched with
    * `resized = false`. Metadata columns are recomputed over the new
    * payloads. Replaces the former dimension-only `resizeStub`.
    */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide > 0, s"resizeImages: maxSide must be positive, got $maxSide")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, kind, bytes) =>
          val out = if (kind == "image") resizeOne(bytes, maxSide) else None
          out match {
            case Some(nb) => (id, kind, nb, true)
            case None => (id, kind, bytes, false)
          }
        }
      }.toDF("media_id", "kind", "bytes", "resized")
      .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
      .withColumn("content_md5", md5(col("bytes")))
  }

  /** None = no re-encode needed (small enough / not decodable). */
  private def resizeOne(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).flatMap { img =>
        val side = math.max(img.getWidth, img.getHeight)
        if (side <= maxSide) None
        else {
          val scale = maxSide.toDouble / side
          val nw = math.max(1, (img.getWidth * scale).toInt)
          val nh = math.max(1, (img.getHeight * scale).toInt)
          val imgType =
            if (img.getType == BufferedImage.TYPE_CUSTOM) BufferedImage.TYPE_INT_RGB
            else img.getType
          val dst = new BufferedImage(nw, nh, imgType)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, nw, nh, null)
          } finally g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", bos)
          Some(bos.toByteArray)
        }
      }
    } catch { case _: Exception => None }

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

  /** REAL per-frame pixel features for MJPEG-in-AVI video rows: every
    * `stride`-th movi frame (up to `maxFrames`) is decoded with ImageIO
    * and emitted as (media_id, frame_idx, frame_w, frame_h, mean_luma)
    * — the codec-backed companion to [[frameSample]]'s index-only rows.
    * Non-video rows, non-AVI containers (MP4/WebM need a codec the JDK
    * lacks), and undecodable frame chunks emit nothing. Narrow
    * partition-batched map — no shuffle; at 100 TB the cost is the
    * decode itself, linear in sampled-frame bytes.
    */
  def frameFeatures(media: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    require(stride > 0, s"frameFeatures: stride must be positive, got $stride")
    require(maxFrames > 0, s"frameFeatures: maxFrames must be positive, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (id, kind, bytes) =>
          if (kind != "video") Iterator.empty
          else parseAvi(bytes).iterator.flatMap { case (_, _, _, chunks) =>
            (0 until chunks.length by stride).take(maxFrames).iterator.flatMap { fi =>
              val (off, len) = chunks(fi)
              jpegFrame(bytes, off, len).map { case (w, h, luma) =>
                (id, fi, w, h, luma)
              }
            }
          }
        }
      }.toDF("media_id", "frame_idx", "frame_w", "frame_h", "mean_luma")
  }
}
