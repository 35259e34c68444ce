package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved text+media training documents — the multimodal training
  * shape: each document becomes an ORDERED sequence of segments, text
  * chunks interleaved with media-feature references at their anchor
  * positions (the layout interleaved-pretraining corpora like
  * OBELICS/MMC4 materialize). Composes the existing pieces: text
  * segments come from [[graft.textops.Chunker]], media segments from
  * the [[Multimodal]] metadata plane; this operator only ASSEMBLES.
  *
  * Contract: both inputs carry a shared doc id and an integer `pos` on
  * ONE axis (the caller maps chunk_idx and media anchors onto it —
  * even/odd is the usual scheme); (pos, seg_type, media_id) must be
  * unique per doc, which makes the assembled order total and
  * engine-exact. Each media segment carries `seg_tokens`, its context
  * cost ([[mediaTokenCost]] plan constants); text segments carry their
  * real token count, so `doc_tokens` is the sequence's context length.
  *
  * Size guard: documents exceeding `maxSegments` drop WHOLE (a
  * million-segment outlier must not materialize a giant row — the
  * collect-side guard the brief's "ordered collect under a size
  * guard" asks for; dropped docs are countable by anti-joining the
  * input).
  *
  * 100 TB shape: one union + one doc-key shuffle (the count window and
  * rank share it); per-partition state bounded by the largest single
  * document. Output stays ROW-oriented (one row per segment,
  * seq_idx-ordered) rather than one array row per doc — downstream
  * packing/sharding consumes rows, and a 100k-segment doc as a single
  * array row is exactly the memory spike the guard exists to prevent.
  */
object Interleave {

  /** Fixed per-kind context cost in tokens (plan constants — a real
    * deployment derives these from its vision/audio tokenizer).
    */
  def mediaTokenCost(kind: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(kind === "image", 64L)
      .when(kind === "audio", 128L)
      .when(kind === "video", 256L)
      .otherwise(0L)

  /** Assemble. `textSegs`: (id, pos, content, seg_tokens);
    * `mediaSegs`: (id, pos, media_id, kind, seg_tokens). Output: one
    * row per segment — (id, seq_idx, seg_type, media_id, content,
    * seg_tokens, n_segments, doc_tokens), seg_type = "text" or the
    * media kind.
    */
  def interleave(
      textSegs: DataFrame, mediaSegs: DataFrame,
      maxSegments: Int = 4096): DataFrame = {
    require(maxSegments >= 1, s"maxSegments must be >= 1, got $maxSegments")
    val t = textSegs.select(
      col("id").cast("long").as("id"), col("pos").cast("long").as("pos"),
      lit("text").as("seg_type"), lit(null).cast("long").as("media_id"),
      col("content").cast("string").as("content"),
      col("seg_tokens").cast("long").as("seg_tokens"))
    val m = mediaSegs.select(
      col("id").cast("long").as("id"), col("pos").cast("long").as("pos"),
      col("kind").cast("string").as("seg_type"),
      col("media_id").cast("long").as("media_id"),
      lit(null).cast("string").as("content"),
      col("seg_tokens").cast("long").as("seg_tokens"))
    val byDoc = Window.partitionBy(col("id"))
    val order = Window.partitionBy(col("id"))
      .orderBy(col("pos"), col("seg_type"), col("media_id"))
    t.unionByName(m)
      .withColumn("n_segments", count(lit(1)).over(byDoc))
      .withColumn("doc_tokens", sum(col("seg_tokens")).over(byDoc))
      .filter(col("n_segments") <= maxSegments)
      .withColumn("seq_idx", (row_number().over(order) - 1).cast("long"))
      .select(col("id"), col("seq_idx"), col("seg_type"), col("media_id"),
        col("content"), col("seg_tokens"), col("n_segments"),
        col("doc_tokens"))
  }
}
