package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped decode / feature-extract /
  * resize / frame-sample operators over `mapPartitions`.
  *
  * The DECODE STEP IS A STUB — this container ships no image/audio
  * codecs, so [[decodeStub]] produces deterministic fake media
  * properties from the raw bytes. Everything around it — the schema, the
  * binary column handling, partition-batched iteration, the typed output
  * shape a real decoder would fill — is real and tested. A production
  * deployment replaces the body of `decodeStub` with e.g. a JNI codec
  * call per batch.
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

  /** Typed decode output a real codec would produce. */
  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      feature: Array[Float])

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

  /** STUB decode: deterministic fake media properties derived from the
    * payload bytes. Batch shape (one iterator per partition, reusable
    * scratch state across rows) mirrors what a real codec binding needs.
    */
  def decodeStub(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes")).as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition scratch a real decoder would allocate once
        val featureDim = 8
        it.map { case (id, kind, bytes) =>
          val n = bytes.length
          // ??? real codec call goes here; deterministic fake below
          val width = 64 + (n % 512)
          val height = 64 + ((n * 7) % 512)
          val frames = if (kind == "video") 1 + (n % 240) else 1
          val rate = if (kind == "audio") 16000 else 0
          val feature = Array.tabulate(featureDim) { i =>
            if (n == 0) 0f
            else (bytes(i * Math.max(1, n / featureDim) % n) & 0xff) / 255f
          }
          DecodedMedia(id, kind, width, height, frames, rate, feature)
        }
      }
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
