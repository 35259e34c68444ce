package graft.textops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftInterop, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) subword tokenizer — the Kudo 2018
  * trainer that BPE ([[Bpe]]) is the merge-based alternative to:
  * pieces carry log-probabilities and a text segments into its
  * maximum-likelihood piece sequence (Viterbi). Training is hard-EM
  * (Viterbi-E-step), the documented deterministic variant: expected
  * counts come from the single best segmentation instead of
  * forward-backward — integer counts, no float accumulation across
  * rows, so engine and the independent oracle trainer agree bitwise.
  *
  * 100 TB shape, exactly [[Bpe.train]]'s:
  *
  *  - the corpus-scale work is ONE distributed word-count aggregation
  *    (map-side partial combine; Heaps-law-bounded result, `maxWords`
  *    caps the driver collect deterministically by (count desc, word
  *    asc));
  *  - seed + EM iterations run driver-side over the WEIGHTED word
  *    table — O(words · len · maxPieceLen) per iteration, independent
  *    of corpus size;
  *  - [[refineCounts]] is the corpus-exact final M-step for when
  *    `maxWords` binds (the q88 quantizer-refinement discipline): one
  *    distributed segment-explode-aggregate pass over the full corpus
  *    with the broadcast model, counts re-collected (vocab-bounded),
  *    scores rebuilt;
  *  - applying the tokenizer ([[unigram_segment]]) is a codegen'd
  *    expression over the broadcast model — one narrow pass, no
  *    shuffle, stateless (drops into Structured Streaming unchanged).
  *
  * Determinism rules (the oracle contract, every one shared with the
  * independent trainer):
  *
  *  - words are whitespace-split (Spark `\s+` set), NOT lowered, each
  *    prefixed with the `▁` word marker (the public SentencePiece
  *    convention — pieces never span words);
  *  - piece boundaries sit on CODE-POINT boundaries; single-code-point
  *    pieces of the corpus are always in the vocabulary (coverage:
  *    every word segments);
  *  - seed = all pieces of 1..maxPieceLen code points ranked by
  *    weighted substring count, ties by piece string ascending;
  *  - Viterbi tie-break: higher score wins; on EXACT score equality
  *    the longer last piece wins;
  *  - piece score = Math.log(count / T) with T = the sum of EFFECTIVE
  *    counts over the kept vocabulary, effective count = max(count, 1)
  *    for single-code-point pieces (kept even at zero — coverage) and
  *    the raw count for multi-piece entries (zero-count multis drop);
  *  - prune keeps singles + the top (vocabSize - singles) multis by
  *    (count desc, piece asc).
  */
object Unigram {

  /** Log-score assigned to a single code point absent from the
    * vocabulary (only reachable when segmenting text outside the
    * training corpus): large enough to never beat any in-vocab path,
    * finite so unknown characters still segment.
    */
  val UnkScore: Double = -1e4

  /** A trained model: parallel arrays sorted by piece (deterministic
    * layout), plus the derived lookup map and max piece length.
    */
  final case class Model(pieces: Array[String], scores: Array[Double]) {
    @transient lazy val scoreOf: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), scores(i)); i += 1 }
      m
    }
    @transient lazy val maxLen: Int = {
      var mx = 1
      var i = 0
      while (i < pieces.length) {
        val l = pieces(i).codePointCount(0, pieces(i).length)
        if (l > mx) mx = l
        i += 1
      }
      mx
    }
  }

  /** The word marker (U+2581 LOWER ONE EIGHTH BLOCK). */
  val Marker = "▁"

  @inline private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  /** Code-point boundary offsets of `s`: 0, …, s.length. */
  private def boundaries(s: String): Array[Int] = {
    val b = new Array[Int](s.codePointCount(0, s.length) + 1)
    var off = 0
    var i = 0
    while (off < s.length) {
      b(i) = off
      off += Character.charCount(s.codePointAt(off))
      i += 1
    }
    b(i) = s.length
    b
  }

  /** Viterbi segmentation of ONE marked word under the model map —
    * shared by trainer, refine pass, and the apply expression, so the
    * three can't disagree. Returns pieces in order.
    */
  def segmentWord(
      word: String,
      scoreOf: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[String] = {
    val b = boundaries(word)
    val n = b.length - 1 // positions in code points
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val backLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        if (best(i - l) != Double.NegativeInfinity) {
          val piece = word.substring(b(i - l), b(i))
          val sc = scoreOf.get(piece)
          val pieceScore =
            if (sc != null) sc.doubleValue()
            else if (l == 1) UnkScore
            else Double.NegativeInfinity
          if (pieceScore != Double.NegativeInfinity) {
            val cand = best(i - l) + pieceScore
            if (cand > best(i) || (cand == best(i) && l > backLen(i))) {
              best(i) = cand
              backLen(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    // reconstruct (backLen(i) >= 1 always: single pieces are reachable)
    var count = 0
    var j = n
    while (j > 0) { count += 1; j -= backLen(j) }
    val out = new Array[String](count)
    j = n
    var k = count - 1
    while (j > 0) {
      out(k) = word.substring(b(j - backLen(j)), b(j))
      k -= 1
      j -= backLen(j)
    }
    out
  }

  /** Segment a whole text: whitespace-split, mark, Viterbi per word,
    * concatenate in order.
    */
  def segmentText(
      text: String,
      scoreOf: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWsChar(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsChar(text.charAt(i))) i += 1
      if (i > start)
        out ++= segmentWord(Marker + text.substring(start, i), scoreOf, maxLen)
    }
    out.toArray
  }

  /** Driver-side hard-EM trainer over a weighted word table (the
    * [[Bpe.trainFromVocab]] altitude — corpus-size-independent).
    */
  private[textops] def trainFromVocab(
      words: Array[(String, Long)], vocabSize: Int, maxPieceLen: Int,
      emIters: Int): Model = {
    val marked = words.map { case (w, f) => (Marker + w, f) }
    // ---- seed: weighted substring counts, 1..maxPieceLen code points
    val counts = new java.util.HashMap[String, Long]()
    marked.foreach { case (w, f) =>
      val b = boundaries(w)
      val n = b.length - 1
      var i = 0
      while (i < n) {
        var l = 1
        val lMax = math.min(maxPieceLen, n - i)
        while (l <= lMax) {
          val p = w.substring(b(i), b(i + l))
          counts.put(p, counts.getOrDefault(p, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    val (singles0, multis0) = {
      import scala.jdk.CollectionConverters._
      counts.asScala.toArray.partition {
        case (p, _) => p.codePointCount(0, p.length) == 1
      }
    }
    def prune(singles: Array[(String, Long)],
        multis: Array[(String, Long)]): Model = {
      val keptMultis = multis.filter(_._2 > 0L)
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - singles.length))
      val kept = (singles.map { case (p, c) => (p, math.max(c, 1L)) }
        ++ keptMultis).sortBy(_._1)
      val t = kept.iterator.map(_._2).sum.toDouble
      Model(kept.map(_._1), kept.map(e => Math.log(e._2 / t)))
    }
    var model = prune(singles0, multis0)
    // ---- hard-EM iterations: Viterbi counts -> re-score + prune
    var it = 0
    while (it < emIters) {
      val c2 = new java.util.HashMap[String, Long]()
      marked.foreach { case (w, f) =>
        segmentWord(w, model.scoreOf, model.maxLen).foreach { p =>
          c2.put(p, c2.getOrDefault(p, 0L) + f)
        }
      }
      val singles = singles0.map { case (p, _) =>
        (p, c2.getOrDefault(p, 0L))
      }
      val multis = {
        import scala.jdk.CollectionConverters._
        c2.asScala.toArray.filter {
          case (p, _) => p.codePointCount(0, p.length) > 1
        }
      }
      model = prune(singles, multis)
      it += 1
    }
    model
  }

  /** Distributed word-frequency collect + driver EM — the full
    * trainer. `maxWords` is the deterministic Heaps cap on the driver
    * collect (count desc, word asc).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 400,
      maxPieceLen: Int = 6, emIters: Int = 2,
      maxWords: Int = 1000000): Model = {
    val toks = when(length(trim(col(textCol))) === 0,
      typedLit(Seq.empty[String]))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val words: Array[(String, Long)] = docs
      .select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromVocab(words, vocabSize, maxPieceLen, emIters)
  }

  /** Corpus-exact final M-step: distributed Viterbi counts over the
    * FULL corpus under the broadcast model (one segment-explode-
    * aggregate pass), scores rebuilt with the shared rules. At test
    * scale (maxWords unbound) this equals the word-table M-step; at
    * 100 TB it is the pass that removes the `maxWords` sample bound.
    */
  def refineCounts(spark: SparkSession, docs: DataFrame, textCol: String,
      model: Model, vocabSize: Int): Model = {
    val pieces = docs
      .select(explode(unigram_segment(spark, col(textCol), model)).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .collect() // vocab-bounded: at most |pieces| + unknown singles
      .map(r => (r.getString(0), r.getLong(1)))
    val byPiece = pieces.toMap
    val isSingle = (p: String) => p.codePointCount(0, p.length) == 1
    val singles = model.pieces.filter(isSingle)
      .map(p => (p, byPiece.getOrElse(p, 0L)))
    val keptMultis = model.pieces.filter(!isSingle(_))
      .map(p => (p, byPiece.getOrElse(p, 0L)))
      .filter(_._2 > 0L)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - singles.length))
    val kept = (singles.map { case (p, c) => (p, math.max(c, 1L)) }
      ++ keptMultis).sortBy(_._1)
    val t = kept.iterator.map(_._2).sum.toDouble
    Model(kept.map(_._1), kept.map(e => Math.log(e._2 / t)))
  }

  /** Static entry point for generated code. */
  def segmentUtf8(text: UTF8String, bcast: Broadcast[Model]): ArrayData = {
    val m = bcast.value
    val pieces = segmentText(text.toString, m.scoreOf, m.maxLen)
    new GenericArrayData(pieces.map(UTF8String.fromString(_)))
  }

  case class UnigramSegmentExpr(child: Expression, bcast: Broadcast[Model])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "unigram_segment"
    override def nullSafeEval(input: Any): Any =
      segmentUtf8(input.asInstanceOf[UTF8String], bcast)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramModel", bcast,
        classOf[Broadcast[Model]].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.Unigram.segmentUtf8($input, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** [[Bpe.bcastCache]]'s twin for unigram models, keyed by the model
    * content (piece list + bit-pattern of scores).
    */
  private[textops] val bcastCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, Long, Seq[String], Seq[Long]),
        (java.lang.ref.WeakReference[org.apache.spark.SparkContext], Broadcast[Model])]

  /** Column API: `unigram_segment(spark, col("text"), model)` —
    * broadcasts the model once per (context, model) and reuses it.
    */
  def unigram_segment(spark: SparkSession, text: Column, model: Model): Column = {
    val sc = spark.sparkContext
    bcastCache.foreach { case (k, (ref, _)) =>
      val owner = ref.get()
      if (owner == null || owner.isStopped) bcastCache.remove(k)
    }
    val key = (sc.applicationId, sc.startTime, model.pieces.toVector: Seq[String],
      model.scores.toVector.map(java.lang.Double.doubleToLongBits): Seq[Long])
    val (_, bcast) = bcastCache.getOrElseUpdate(
      key,
      (new java.lang.ref.WeakReference(sc), sc.broadcast(model)))
    GraftInterop.column(UnigramSegmentExpr(GraftInterop.expression(text), bcast))
  }
}
