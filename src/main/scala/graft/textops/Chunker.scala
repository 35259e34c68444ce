package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the retrieval/embedding prep step
  * (RAG indexing, long-document embedding, context-window packing):
  * split each document into fixed-size token windows with a configurable
  * stride, so consecutive chunks overlap by `window - stride` tokens.
  *
  * Chunk boundaries are a pure function of the token count:
  *
  *   nChunks(n) = 0                            if n == 0
  *              = 1                            if n <= window
  *              = ceil((n - window)/stride) + 1  otherwise
  *
  * so the LAST chunk is the first one whose window reaches the tail —
  * no degenerate trailing chunk fully contained in its predecessor
  * (the convention the common splitter libraries settled on). Chunk
  * `i` covers tokens `[i*stride, min(i*stride + window, n))`; every
  * token lands in at least one chunk (stride <= window is enforced).
  *
  * Tokens are the family's whitespace tokens ([[TextAnalysis.tokens]]),
  * re-joined with single spaces — chunk text normalizes internal
  * whitespace runs, the same contract as every other token-level
  * operator here.
  *
  * 100 TB shape: one narrow codegen'd pass (split + sequence + explode
  * + slice) — no shuffle, no state, nothing to skew; output size is a
  * bounded multiple of the input (the overlap factor the caller chose).
  * Composes with [[graft.operators.Budget]] sharding downstream (chunk,
  * then shard the chunks).
  */
object Chunker {

  /** Explode `textCol` into overlapping token-window chunks. Keeps
    * `keep` columns (they must be plain named columns resolvable after
    * a select), appends (chunk_idx, chunk_tokens, chunk_text).
    * `chunk_idx` is 0-based; `chunk_tokens` is the actual token count
    * of the (possibly short) tail chunk. Zero-token documents emit no
    * chunks.
    */
  def chunkByTokens(
      df: DataFrame,
      textCol: Column,
      window: Int,
      stride: Int,
      keep: Seq[Column]): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(stride <= window,
      s"stride ($stride) > window ($window) would drop tokens between chunks")
    // widen: tokenize + chunk explode (and whatever per-chunk analysis
    // the caller stacks on top, e.g. q126's per-chunk lang-id) is
    // narrow CPU on the scan's partitioning (byte-guarded; see Widen)
    val base = graft.operators.Widen.widen(df)
      .select((keep :+ TextAnalysis.tokens(textCol).as("_toks")): _*)
    val n = size(col("_toks"))
    // integer ceil((n - window)/stride): token counts are far below
    // 2^52 so the double division is exact
    val nChunks =
      when(n <= window, lit(1)) // n == 0 never reaches explode (empty seq)
        .otherwise(floor((n - window + stride - 1) / lit(stride.toDouble))
          .cast("int") + 1)
    val idxs = when(n === 0, typedLit(Seq.empty[Int]))
      .otherwise(sequence(lit(0), nChunks - 1))
    val start = col("chunk_idx") * stride
    base
      .withColumn("chunk_idx", explode(idxs))
      .select((keep
        :+ col("chunk_idx").cast("long").as("chunk_idx")
        :+ least(lit(window), n - start).cast("long").as("chunk_tokens")
        :+ array_join(slice(col("_toks"), start + 1, lit(window)), " ").as("chunk_text")): _*)
  }

  /** Sentence-aligned chunking — the RAG-quality default: chunk
    * boundaries fall only at sentence ends ([[TextAnalysis.sentences]]'
    * segmentation), so no chunk starts or stops mid-sentence. Sentences
    * are binned by their token prefix sum: a sentence whose
    * cumulative-token count BEFORE it is `c` lands in bin
    * `floor(c / window)`, then bins re-densify to consecutive
    * `chunk_idx` per document. Consequences of the rule (documented,
    * oracle-pinned): a chunk may overrun `window` by up to one
    * sentence (the sentence that crosses the boundary belongs to the
    * bin it started in), and a sentence longer than `window` gets a
    * bin — and therefore a chunk — of its own. No overlap/stride:
    * sentence alignment and overlap are competing goals; a caller
    * wanting both runs [[chunkByTokens]].
    *
    * `keep` must include the document key (it is the window/group
    * partition key). Output: keep ++ (chunk_idx, chunk_sents,
    * chunk_tokens, chunk_text), chunk text = sentences joined with
    * single spaces (terminators already normalized by `sentences`).
    *
    * 100 TB shape: one shuffle on the doc key (the prefix-sum window +
    * the per-(doc, bin) aggregation share it); per-partition state is
    * bounded by the largest single document, never by a hot key — doc
    * keys are unique. The ordered chunk text aggregates via
    * `array_sort(collect_list(struct(idx, sent)))`, the repo's
    * order-insensitive regroup (collect_list order is not guaranteed
    * across retries/partitionings; the sort pins it).
    */
  def chunkBySentences(
      df: DataFrame,
      textCol: Column,
      window: Int,
      keep: Seq[Column]): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(keep.nonEmpty, "chunkBySentences: keep must include the doc key")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keep: _*).orderBy(col("_si"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cumBefore = sum(col("_ntok")).over(w) - col("_ntok")
    // floor(double-div) is exact while per-doc token counts stay below
    // 2^52 — far beyond any single document
    val binned = df
      .select((keep :+ TextAnalysis.sentences(textCol).as("_ss")): _*)
      .select((keep :+ posexplode(col("_ss")).as(Seq("_si", "_sent"))): _*)
      .withColumn("_ntok", size(TextAnalysis.tokens(col("_sent"))).cast("long"))
      .withColumn("_bin", floor(cumBefore / lit(window.toDouble)).cast("long"))
    val wIdx = org.apache.spark.sql.expressions.Window
      .partitionBy(keep: _*).orderBy(col("_bin"))
    binned
      .groupBy((keep :+ col("_bin")): _*)
      .agg(count(lit(1)).as("chunk_sents"),
        sum(col("_ntok")).as("chunk_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("_si"), col("_sent")))),
            x => x.getField("_sent")), " ").as("chunk_text"))
      .withColumn("chunk_idx",
        (row_number().over(wIdx) - 1).cast("long"))
      .select((keep :+ col("chunk_idx") :+ col("chunk_sents")
        :+ col("chunk_tokens") :+ col("chunk_text")): _*)
  }
}
