package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Multimodal query registry — image/audio/video decode, perceptual-hash near-dup + recall gates, interleaved docs.
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // multimodal binary-column stats (no decode needed)
    "q29_multimodal_stats" -> ((s, dir) => {
      graft.multimodal.Multimodal.stats(
        graft.multimodal.Multimodal.fromDocuments(table(s, dir, "documents")))
    }),


    // multimodal decode: REAL ImageIO decode for image rows (payloads
    // are deterministically-sized synthetic PNGs, so the oracle predicts
    // the codec's output), deterministic stub for audio/video
    "q30_decode" -> ((s, dir) => {
      graft.multimodal.Multimodal.decode(
        graft.multimodal.Multimodal.withSyntheticVideoPayloads(
          graft.multimodal.Multimodal.withSyntheticAudioPayloads(
            graft.multimodal.Multimodal.withSyntheticImagePayloads(
              graft.multimodal.Multimodal.fromDocuments(table(s, dir, "documents"))))))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"), col("sample_rate"), col("decoded_real"))
    }),


    // REAL video pixel decode: video rows get MJPEG-in-AVI payloads
    // (00dc chunks are genuine ImageIO JPEGs), frameFeatures decodes
    // every 2nd frame; the oracle predicts geometry/frame indices from
    // the synthetic-payload formulas and luma_ok = TRUE pins the decoded
    // mean luminance within ±3 of the encoded gray (solid-gray JPEG DC
    // quantization error is <1 level at the default quality)
    "q54_video_frames" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.withSyntheticAviVideoPayloads(
        graft.multimodal.Multimodal.fromDocuments(table(s, dir, "documents")))
      graft.multimodal.Multimodal.frameFeatures(media, stride = 2, maxFrames = 4)
        .select(col("media_id"), col("frame_idx"), col("frame_w"), col("frame_h"),
          (abs(col("mean_luma") -
            (lit(16) + (col("media_id") * 37 + col("frame_idx") * 11) % 224)) <= 3)
            .as("luma_ok"))
    }),


    // perceptual-hash image near-dup: REAL ImageIO decode -> dHash ->
    // the simhash family's pigeonhole chunk join (fingerprintPairs).
    // Corpus = structured PNGs + byte-distinct brightness-shifted twins
    // (bounded gate corpus, same bound as q39-q44); oracle = generated
    // (engine emits each image's dHash, DuckDB recomputes chunk keys,
    // cap, candidate join, and Hamming verify)
    "q62_image_neardup" -> ((s, dir) => {
      val fps = imageTwinCorpus(s, dir).select(col("media_id"),
        graft.multimodal.PerceptualHash.dhash64(col("bytes")).as("fp"))
      graft.textops.NearDup.fingerprintPairs(
        fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 1000)
    }),


    // planted near-identical-image recall gate: every base image must
    // pair with its brightness-shifted twin (dHash identity under
    // uniform shift => hamming 0 => full recall, uncapped)
    "q63_phash_recall" -> ((s, dir) => {
      val fps = imageTwinCorpus(s, dir).select(col("media_id"),
        graft.multimodal.PerceptualHash.dhash64(col("bytes")).as("fp"))
      val pairs = graft.textops.NearDup.fingerprintPairs(
        fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 0)
      val truth = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("phash", truth, pairs)
    }),


    // audio perceptual near-dup: REAL javax.sound PCM decode ->
    // slice-energy gradient hash -> the same pigeonhole chunk join as
    // q62; corpus = structured WAVs + half-gain twins (byte-distinct,
    // hash-identical); generated oracle recomputes chunk/cap/Hamming
    // from the emitted hashes
    "q66_audio_neardup" -> ((s, dir) => {
      val fps = audioTwinCorpus(s, dir).select(col("media_id"),
        graft.multimodal.PerceptualHash.audio_hash64(col("bytes")).as("fp"))
      graft.textops.NearDup.fingerprintPairs(
        fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 1000)
    }),


    // planted half-gain-twin recall gate (gain invariance => hamming 0
    // => full recall, uncapped)
    "q67_audio_recall" -> ((s, dir) => {
      val fps = audioTwinCorpus(s, dir).select(col("media_id"),
        graft.multimodal.PerceptualHash.audio_hash64(col("bytes")).as("fp"))
      val pairs = graft.textops.NearDup.fingerprintPairs(
        fps, "media_id", "fp", maxHamming = 4, maxBucketSize = 0)
      val truth = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("audiohash", truth, pairs)
    }),


    // video perceptual near-dup: per-sampled-frame dHashes through the
    // REAL MJPEG-in-AVI decode, videos pairing on shared frame hashes
    // via the winnow containment machinery; corpus = structured AVIs +
    // re-edit twins (sampled frames byte-identical, container bytes
    // distinct); generated oracle recomputes cap/denominators/
    // containment from the emitted per-video frame-hash sets
    "q68_video_neardup" -> ((s, dir) => {
      graft.textops.NearDup.fingerprintSetPairs(
        videoFrameHashFrame(s, dir), minSharedRatio = 0.6, maxBucketSize = 200)
    }),


    // planted re-edit-twin recall gate: sampled frame-hash sets are
    // identical -> containment 1.0 -> full recall, uncapped
    "q69_video_recall" -> ((s, dir) => {
      val pairs = graft.textops.NearDup.fingerprintSetPairs(
        videoFrameHashFrame(s, dir), minSharedRatio = 0.6, maxBucketSize = 0)
      val truth = table(s, dir, "documents").filter(col("doc_id") < gateDocs)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
      recallOf("videohash", truth, pairs)
    }),


    // interleaved text+media training documents: 16-token tile chunks
    // at even positions, each doc's media segment (q29's kind formula,
    // plan-constant token costs) anchored at odd position
    // (doc_id%4)*2+1 — the assembled sequence is the multimodal
    // training shape. Oracle rebuilds the interleaving from the q74
    // chunker twin + the media formulas and re-ranks it
    "q114_interleave" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val chunks = graft.textops.Chunker.chunkByTokens(
        docs, col("text"), window = 16, stride = 16, keep = Seq(col("doc_id")))
        .select(col("doc_id").as("id"), (col("chunk_idx") * 2).as("pos"),
          col("chunk_text").as("content"),
          col("chunk_tokens").as("seg_tokens"))
      val kind = element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int"))
      val media = docs.select(col("doc_id").as("id"),
        ((col("doc_id") % 4) * 2 + 1).as("pos"),
        col("doc_id").as("media_id"), kind.as("kind"),
        graft.multimodal.Interleave.mediaTokenCost(kind).as("seg_tokens"))
      graft.multimodal.Interleave.interleave(chunks, media, maxSegments = 64)
        .withColumnRenamed("id", "doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q29_multimodal_stats" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin,


    // image rows: the ORACLE predicts what the real PNG codec must
    // return, because withSyntheticImagePayloads encodes a
    // (16 + id%32) x (16 + 7id%32) PNG; audio/video rows: the stub
    // formulas over the text payload length.
    // every kind now has a real decode/probe path, so the ORACLE
    // predicts all properties from the synthetic-payload formulas:
    // image = PNG codec dims, audio = WAV container rate/frames,
    // video = MP4 box-tree geometry/samples
    "q30_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS kind
        |  FROM documents)
        |SELECT media_id,
        |  CAST(CASE WHEN kind = 'image' THEN 16 + media_id % 32
        |       WHEN kind = 'audio' THEN 0
        |       ELSE 128 + media_id % 64 END AS INT) AS width,
        |  CAST(CASE WHEN kind = 'image' THEN 16 + (media_id * 7) % 32
        |       WHEN kind = 'audio' THEN 0
        |       ELSE 72 + (media_id * 3) % 64 END AS INT) AS height,
        |  CAST(CASE WHEN kind = 'video' THEN 24 + media_id % 240
        |       WHEN kind = 'audio' THEN 100 + media_id % 900
        |       ELSE 1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN kind = 'audio' THEN 8000 + (media_id % 4) * 4000
        |       ELSE 0 END AS INT) AS sample_rate,
        |  TRUE AS decoded_real
        |FROM m""".stripMargin,


    // the ORACLE predicts frame geometry and sampled indices from the
    // withSyntheticAviVideoPayloads formulas (frames = 3 + m%6 <= 8, so
    // stride 2 yields indices {0,2,4,6} below the frame count and the
    // maxFrames=4 cap never truncates); luma_ok = TRUE asserts the real
    // JPEG round-trip stayed within the +-3 tolerance for every frame
    "q54_video_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, CAST(3 + doc_id % 6 AS INT) AS n_frames
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
        |s AS (SELECT unnest([0, 2, 4, 6]) AS fi)
        |SELECT media_id, CAST(s.fi AS INT) AS frame_idx,
        |  CAST(32 + media_id % 16 AS INT) AS frame_w,
        |  CAST(24 + (media_id * 5) % 16 AS INT) AS frame_h,
        |  TRUE AS luma_ok
        |FROM v JOIN s ON s.fi < v.n_frames""".stripMargin,


    // uniform brightness shift leaves every dHash gradient comparison
    // unchanged -> twin hamming 0 -> the uncapped pigeonhole join finds
    // every planted pair (full recall by construction)
    "q63_phash_recall" ->
      """SELECT 'phash' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents WHERE doc_id < 500""".stripMargin,


    // exact half-gain (even samples) leaves every slice-energy gradient
    // comparison unchanged -> twin hamming 0 -> full recall
    "q67_audio_recall" ->
      """SELECT 'audiohash' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents WHERE doc_id < 500""".stripMargin,


    // twins share every sampled (even-index) frame byte-for-byte ->
    // identical frame-hash sets -> containment 1.0 -> full recall
    "q69_video_recall" ->
      """SELECT 'videohash' AS family,
        |  count(*) AS n_truth, count(*) AS n_found,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM documents WHERE doc_id < 500""".stripMargin,


    "q114_interleave" ->
      raw"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')
        |         END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    CASE WHEN len(toks) = 0 THEN 0
        |         WHEN len(toks) <= 16 THEN 1
        |         ELSE CAST(floor((len(toks) - 16 + 15) / 16.0) AS INT) + 1
        |         END AS n_chunks
        |  FROM t),
        |txt AS (
        |  SELECT doc_id, CAST(i * 2 AS BIGINT) AS pos, 'text' AS seg_type,
        |    CAST(NULL AS BIGINT) AS media_id,
        |    array_to_string(list_slice(toks, i * 16 + 1, i * 16 + 16), ' ')
        |      AS content,
        |    CAST(least(16, n - i * 16) AS BIGINT) AS seg_tokens
        |  FROM c, unnest(range(n_chunks)) AS u(i)),
        |med AS (
        |  SELECT doc_id, CAST((doc_id % 4) * 2 + 1 AS BIGINT) AS pos,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS seg_type,
        |    doc_id AS media_id, CAST(NULL AS VARCHAR) AS content,
        |    CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 64
        |         WHEN 1 THEN 128 ELSE 256 END AS BIGINT) AS seg_tokens
        |  FROM documents),
        |u AS (SELECT * FROM txt UNION ALL SELECT * FROM med),
        |g AS (
        |  SELECT doc_id, count(*) AS n_segments,
        |    CAST(sum(seg_tokens) AS BIGINT) AS doc_tokens
        |  FROM u GROUP BY doc_id)
        |SELECT u.doc_id,
        |  CAST(row_number() OVER (PARTITION BY u.doc_id
        |       ORDER BY pos, seg_type, media_id) - 1 AS BIGINT) AS seq_idx,
        |  seg_type, media_id, content, seg_tokens,
        |  CAST(g.n_segments AS BIGINT) AS n_segments, g.doc_tokens
        |FROM u JOIN g ON g.doc_id = u.doc_id
        |WHERE g.n_segments <= 64""".stripMargin
  )
}
