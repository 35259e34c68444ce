package graft.textops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index keyword search with BM25 ranking (Robertson/Spärck
  * Jones; the Lucene-variant idf `ln(1 + (N - df + 0.5)/(df + 0.5))`,
  * which never goes negative) — the retrieval side of a curation
  * pipeline: "find the docs about X" over a curated corpus, quality
  * auditing ("which kept docs match this spam phrase"), and the
  * classic RAG keyword-recall companion to the ANN family.
  *
  * Terms are the lowered whitespace tokens (the q20/q22 token twin, so
  * the DuckDB oracle can recompute everything). Index layout:
  *
  *  - `postings.parquet` (id, term, tf, dl): one row per distinct
  *    (doc, term); the doc length rides denormalized in every posting
  *    — scoring needs NO doc-side join (the classic posting-list
  *    layout, length-norm inline).
  *  - `doclens.parquet` (id, dl): one row per doc INCLUDING empty docs
  *    — the corpus-stats source (N, avgdl) and the ingestion ledger.
  *
  * 100 TB shape: a probe reads the postings with `term IN (...)`
  * pushed into the parquet scan (query terms are a handful — the scan
  * prunes on the term dictionary), anti-joins tombstones, and
  * aggregates per doc; only rows of docs CONTAINING a query term ever
  * shuffle. Corpus stats are one narrow aggregate over the
  * one-row-per-doc doclens. Top-k lands as TakeOrderedAndProject
  * (per-partition heads + driver merge), never a global sort.
  * Partition postings by a term-hash bucket at write
  * (`bucketedPostings`) and the probe prunes whole files.
  *
  * Delete/compact ride [[graft.operators.IndexOps]]: tombstones drop a
  * doc from BOTH postings and doclens at probe time, so N/avgdl stay
  * exact under deletes (TextIndexSpec pins search-after-delete ≡
  * rebuild-without-ids).
  */
object TextIndex {

  /** Lowered whitespace terms of `text` (empty → empty array). */
  def terms(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TextAnalysis.tokens(lower(text))

  /** Fold a driver-side query/phrase term EXACTLY the way [[terms]]
    * folds tokens: through the same `UTF8String.toLowerCase` that
    * Spark's `lower()` executes. A `Locale.ROOT` driver fold (the
    * previous form) diverges from `lower()`'s non-ASCII slow path
    * under a non-ROOT default JVM locale (Turkish 'I'), silently
    * missing matches — identical folding on both sides is
    * locale-agnostic by construction.
    */
  private def foldTerm(t: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(t).toLowerCase.toString

  /** One-frame BM25 top-k: build the postings on the fly and rank.
    * Output: (id, score, n_terms, rank), score rounded to 4 decimals
    * BEFORE ranking (both engine and oracle rank the rounded value —
    * the q33 convention, so the comparison never hinges on a half-ulp
    * of `ln`).
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (postings, doclens) = postingsOf(docs, idCol, textCol)
    val Array(nDocs, sumDl) = doclens.agg(
      count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    require(nDocs > 0, "bm25TopK: empty corpus")
    score(postings, nDocs, sumDl.toDouble / nDocs, query, k, k1, b)
  }

  /** Build a persisted index (overwrite). */
  def buildTextIndex(
      docs: DataFrame, idCol: String, textCol: String, dir: String): Unit =
    writeTextIndex(docs, idCol, textCol, dir, "overwrite")

  /** Append a batch (caller contract: batch ids are new — dedup the
    * batch against the ledger first, the minhash-family loop). Ledger
    * (doclens) FIRST: a crash between the writes loses the batch's
    * findability, never double-appends it (the minhash write-order
    * argument).
    */
  def appendToTextIndex(
      docs: DataFrame, idCol: String, textCol: String, dir: String): Unit =
    graft.operators.IndexOps.withMutationLock(docs.sparkSession, dir, "append-text") {
      writeTextIndex(docs, idCol, textCol, dir, "append")
    }

  private def writeTextIndex(
      docs: DataFrame, idCol: String, textCol: String,
      dir: String, mode: String): Unit = {
    val (postings, doclens) = postingsOf(docs, idCol, textCol)
    doclens.write.mode(mode).parquet(s"$dir/doclens.parquet")
    postings.write.mode(mode).parquet(s"$dir/postings.parquet")
    // positional postings beside the tf postings: BM25 never reads
    // them, phrase probes never read the tf side — separate files keep
    // each probe's scan narrow
    positions(docs, idCol, textCol).write.mode(mode)
      .parquet(s"$dir/positions.parquet")
  }

  /** BM25 top-k over a persisted index, tombstones honored. */
  def searchTextIndex(
      spark: SparkSession, dir: String, query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.operators.IndexOps.dropTombstoned
    val doclens = dropTombstoned(spark, dir,
      spark.read.parquet(s"$dir/doclens.parquet"), "id")
    val postings = dropTombstoned(spark, dir,
      spark.read.parquet(s"$dir/postings.parquet"), "id")
    val Array(nDocs, sumDl) = doclens.agg(
      count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    require(nDocs > 0, s"searchTextIndex: index at $dir is empty")
    score(postings, nDocs, sumDl.toDouble / nDocs, query, k, k1, b)
  }

  /** Tombstone `ids`: probes drop their postings AND their doclens
    * rows, so df/N/avgdl all exclude them from the next read on.
    */
  def removeFromTextIndex(ids: DataFrame, idCol: String, dir: String): Unit =
    graft.operators.IndexOps.removeFromIndex(ids, idCol, dir)

  /** Physically apply tombstones + bound the file count. */
  def compactTextIndex(
      spark: SparkSession, dir: String, targetFiles: Int = 4): Unit =
    graft.operators.IndexOps.compactIndex(spark, dir,
      Seq("doclens.parquet" -> "id", "postings.parquet" -> "id",
        "positions.parquet" -> "id"), targetFiles)

  /** (postings, doclens) of a doc frame. Docs with no tokens get a
    * dl=0 doclens row (they count in N and avgdl) and no postings.
    */
  /** Positional postings: one row per token occurrence (id, pos, term)
    * — the layout phrase/proximity queries need (tf-only postings
    * cannot distinguish "new york" from "york new").
    */
  def positions(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        posexplode(terms(col(textCol))).as(Seq("pos", "term")))

  /** Exact consecutive-phrase search: docs containing the token
    * sequence `phrase`, with occurrence counts — output (id, n_occ).
    *
    * Standard positional-intersection on aligned bases: a phrase-term
    * occurrence at position p as phrase offset i is a candidate start
    * at base = p - i; a base with ALL `phrase.length` offsets present
    * is a match (each offset can only be contributed by the single
    * token at base+i, so the count test is exact — repeated phrase
    * terms included, since each occurrence explodes into one row per
    * offset the term holds in the phrase).
    *
    * 100 TB shape: ONE narrow scan — the `term IN (...)` filter pushes
    * into the parquet scan, the per-row offsets explode is bounded by
    * the phrase length, and only (id, base, off) triples for MATCHING
    * terms ever shuffle into the two aggregations.
    */
  def phraseSearch(
      docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    val p = phrase.map(foldTerm)
    require(p.nonEmpty, "phraseSearch: empty phrase")
    val offArr = phraseOffsetsArr(p)
    // coarse pre-gate: a token equal to t requires the SUBSTRING t, so
    // docs missing any phrase term as a substring cannot match — the
    // cheap contains conjunction skips the token explode for them
    // (necessary condition only; the positional intersection below is
    // still the decider)
    val preGate = p.distinct
      .map(t => lower(col(textCol)).contains(t))
      .reduce(_ && _)
    phraseOccurrences(positions(docs.filter(preGate), idCol, textCol), p, offArr)
  }

  /** [[phraseSearch]] against a persisted index's positional postings
    * — the probe never touches document text: the `term IN` filter
    * pushes into the positions.parquet scan, tombstoned docs drop, and
    * the same aligned-base intersection decides. (No contains pre-gate
    * here — the pushed-down term filter IS the prune on the index
    * path.)
    */
  def phraseSearchIndex(
      spark: SparkSession, dir: String, phrase: Seq[String]): DataFrame = {
    val p = phrase.map(foldTerm)
    require(p.nonEmpty, "phraseSearchIndex: empty phrase")
    val pos = graft.operators.IndexOps.dropTombstoned(spark, dir,
      spark.read.parquet(s"$dir/positions.parquet"), "id")
    phraseOccurrences(pos, p, phraseOffsetsArr(p))
  }

  private def phraseOffsetsArr(p: Seq[String]): Column = {
    val offsetsByTerm = p.zipWithIndex.groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2) }
    offsetsByTerm.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("array<int>")) { case (acc, (t, offs)) =>
        when(col("term") === t, typedLit(offs)).otherwise(acc)
      }
  }

  /** Shared intersection tail of the frame and index phrase paths. */
  private def phraseOccurrences(
      pos: DataFrame, p: Seq[String], offArr: Column): DataFrame =
    pos.filter(col("term").isin(p.distinct: _*))
      .select(col("id"), col("pos"), explode(offArr).as("off"))
      .select(col("id"), (col("pos") - col("off")).as("base"))
      .groupBy(col("id"), col("base"))
      .agg(count(lit(1)).as("_m"))
      .filter(col("_m") === p.length && col("base") >= 0)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_occ"))

  /** Multi-phrase occurrence counts in ONE scan — the C4-style content
    * filter primitive ("drop documents containing any listed phrase"):
    * output (id, phrase_idx, n_occ) for every document × phrase with at
    * least one exact consecutive occurrence. [[phraseSearch]]'s aligned-
    * base intersection generalized: each matching token explodes into
    * one (phrase_idx, offset) entry per slot it holds across ALL
    * phrases, bases group per (id, phrase_idx), and a base with every
    * offset of its phrase present is one occurrence. Single-token
    * phrases degenerate to plain term counting in the same plan.
    *
    * 100 TB shape unchanged from [[phraseSearch]]: the union of all
    * phrase terms is one pushed-down IN filter, the explode is bounded
    * by the total slot count a term holds, and only matching triples
    * shuffle. The phrase list itself is a plan constant — suitable for
    * the dozens-to-hundreds range of curated blocklists, not millions
    * (that regime wants [[graft.textops.SpanDedup]]'s hash machinery).
    */
  def phraseSetSearch(
      docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[Seq[String]]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "phraseSetSearch: phrases must be non-empty")
    val lowered = phrases.map(_.map(foldTerm))
    // term -> every (phrase_idx, offset) slot it fills
    val slots: Map[String, Seq[(Int, Int)]] = lowered.zipWithIndex
      .flatMap { case (p, pi) => p.zipWithIndex.map { case (t, off) => (t, (pi, off)) } }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val slotArr = slots.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("array<struct<p:int,o:int>>")) {
        case (acc, (t, ss)) =>
          when(col("term") === t,
            array(ss.map { case (pi, off) =>
              struct(lit(pi).as("p"), lit(off).as("o"))
            }: _*)).otherwise(acc)
      }
    val phraseLen = lowered.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (p, pi)) =>
        when(col("p") === pi, lit(p.length)).otherwise(acc)
      }
    // coarse pre-gate ([[phraseSearch]]'s): a doc can hit SOME phrase
    // only if it carries every term of at least one phrase as a
    // substring
    val preGate = lowered
      .map(_.distinct.map(t => lower(col(textCol)).contains(t))
        .reduce(_ && _))
      .reduce(_ || _)
    positions(docs.filter(preGate), idCol, textCol)
      .filter(col("term").isin(slots.keys.toSeq: _*))
      .select(col("id"), col("pos"), explode(slotArr).as("s"))
      .select(col("id"), col("s.p").as("p"), (col("pos") - col("s.o")).as("base"))
      .groupBy(col("id"), col("p"), col("base"))
      .agg(count(lit(1)).as("_m"))
      .filter(col("_m") === phraseLen && col("base") >= 0)
      .groupBy(col("id"), col("p"))
      .agg(count(lit(1)).as("n_occ"))
      .select(col("id"), col("p").as("phrase_idx"), col("n_occ"))
  }

  private def postingsOf(
      docs: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).cast("long").as("id"),
      terms(col(textCol)).as("_ts"))
    val doclens = base.select(col("id"),
      coalesce(size(col("_ts")), lit(0)).cast("long").as("dl"))
    val postings = base
      .select(col("id"), size(col("_ts")).cast("long").as("dl"),
        explode(col("_ts")).as("term"))
      .groupBy(col("id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("id"), col("term"), col("tf"), col("dl"))
    (postings, doclens)
  }

  /** Shared scoring tail — the frame and index paths both land here so
    * they cannot diverge. Every arithmetic step is written in the
    * exact association the DuckDB oracle uses.
    */
  private def score(
      postings: DataFrame, nDocs: Long, avgdl: Double,
      query: Seq[String], k: Int, k1: Double, b: Double): DataFrame = {
    require(k >= 1, s"bm25: k must be >= 1, got $k")
    val q = query.map(foldTerm).distinct
    require(q.nonEmpty, "bm25: empty query")
    val matched = postings.filter(col("term").isin(q: _*))
    val dfs = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") +
      lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / lit(avgdl))
    val contrib = (idf * (col("tf") * lit(k1 + 1.0))) / denom
    val perDoc = matched.join(broadcast(dfs), Seq("term"))
      .withColumn("_c", contrib)
      .groupBy(col("id"))
      .agg(round(sum(col("_c")), 4).as("score"), count(lit(1)).as("n_terms"))
    perDoc
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
  }
}
