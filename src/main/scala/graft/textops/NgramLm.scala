package graft.textops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftInterop, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-based bigram language-model perplexity scoring — the
  * CCNet-style quality signal: train token counts on a CLEAN slice of
  * the corpus, then score every document by its per-token negative
  * log-likelihood under the model. Fluent text scores low (familiar
  * token transitions), gibberish/boilerplate/wrong-language text
  * scores high — the standard companion to the rule-based quality
  * verdict ([[TextAnalysis.qualityVerdict]]).
  *
  * The model is interpolated add-alpha: with unigram Laplace backbone
  * `pu(w) = (c(w) + 1) / (total + V + 1)` (V vocab types + unk),
  *
  *   p(w | h) = (c(h, w) + alpha * pu(w)) / (c(h) + alpha)
  *
  * which sums to exactly 1 over the vocab+unk event space for every
  * context h (including unseen ones, where it degrades to pu). Tokens
  * are the family's lowered whitespace tokens; each document scores as
  * a fresh sequence with a `<s>` start context.
  *
  * 100 TB shape: mirrors [[Bpe]] exactly — training runs bounded Spark
  * aggregations over the (small, curated) clean slice; the trained
  * count table ships ONCE PER EXECUTOR as a Broadcast; scoring is one
  * narrow codegen'd scan per document (a tight loop over tokens with
  * array/binary-search lookups, no shuffle, nothing to skew).
  */
object NgramLm {

  /** Trained count table. Ids: vocab tokens 0..V-1, unk = V,
    * start-of-doc context `<s>` = V+1. Bigram counts are packed
    * `(ctxId << 32) | wId` keys sorted for binary search; context
    * totals satisfy `contextCounts(h) = sum_w bigram(h, w)`.
    * The vocab index map is `@transient lazy` (hashed once per
    * executor JVM, the broadcast ships only flat arrays).
    */
  final class Model(
      val vocab: Array[String],
      val unigram: Array[Long],
      val unkCount: Long,
      val total: Long,
      val bigramKeys: Array[Long],
      val bigramVals: Array[Long],
      val contextCounts: Array[Long],
      val alpha: Double) extends Serializable {

    def vocabSize: Int = vocab.length
    def unkId: Int = vocab.length
    def startId: Int = vocab.length + 1

    @transient private lazy val index: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.length * 2)
      var i = 0
      while (i < vocab.length) { m.put(vocab(i), i); i += 1 }
      m
    }

    def idOf(token: String): Int = {
      val r = index.get(token)
      if (r == null) unkId else r.intValue()
    }

    def bigramCount(ctx: Int, w: Int): Long = {
      val key = (ctx.toLong << 32) | w.toLong
      val i = java.util.Arrays.binarySearch(bigramKeys, key)
      if (i >= 0) bigramVals(i) else 0L
    }

    /** Laplace unigram backbone over vocab + unk (sums to 1). */
    def pUnigram(w: Int): Double = {
      val c = if (w < vocab.length) unigram(w) else unkCount
      (c + 1.0) / (total + vocab.length + 1.0)
    }
  }

  private val WsRegex = "[ \\t\\n\\x0B\\f\\r]+"

  /** Train on the clean slice: lowered whitespace tokens, top-`vocabSize`
    * vocabulary by (count desc, token asc), bigram counts with OOV
    * folded to unk and a `<s>` context opening each document. Both
    * training passes are codegen'd scans + hash counts (the bigram
    * pass emits packed keys through [[BigramKeysExpr]] — no
    * object-serde anywhere), so the SLICE can be corpus-scale; the
    * driver bound is the MODEL: distinct (vocab-folded) bigrams must
    * stay under `maxBigrams` (checked BEFORE collect), which vocabSize
    * caps at (V+2)^2 regardless of slice size.
    */
  def train(
      df: DataFrame, textCol: String,
      vocabSize: Int = 4096, maxBigrams: Int = 2000000,
      alpha: Double = 1.0): Model = {
    require(vocabSize > 0, s"train: vocabSize must be positive (got $vocabSize)")
    require(alpha > 0, s"train: alpha must be positive (got $alpha)")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df
      .select(explode(split(lower(col(textCol)), WsRegex)).as("tok"))
      .filter(col("tok") =!= "")
    // cache: two actions read the aggregated counts (the total and the
    // top-vocab collect) — uncached each would recompute the full
    // token explode + shuffle
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("n")).cache()
    val (total, vocabRows) =
      try {
        val t = counts.agg(coalesce(sum(col("n")), lit(0L))).as[Long].head()
        val v = counts.orderBy(col("n").desc, col("tok").asc).limit(vocabSize)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        (t, v)
      } finally { counts.unpersist(); () }
    val vocab = vocabRows.map(_._1)
    val unigram = vocabRows.map(_._2)
    val unkCount = total - unigram.sum
    // packed (ctx, word) id pairs per document, OOV folded to unk,
    // <s> opening each doc — a codegen'd expression + explode + one
    // hash count (the WindowHashesExpr idiom; the earlier typed
    // Dataset.flatMap was the family's one object-serde island and
    // bounded training to small slices for no reason)
    val bVocab = spark.sparkContext.broadcast(new VocabIndex(vocab))
    val bigramCounts = df
      .select(explode(
        bigram_keys(lower(col(textCol)), bVocab)).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
    // bound-and-collect in ONE action (decontaminate's limit pattern):
    // the limit caps driver memory before collect, and the +1 row
    // proves the overflow without a separate count() job re-running
    // the whole flatMap+shuffle
    val probeLimit = math.min(maxBigrams.toLong + 1L, Int.MaxValue.toLong).toInt
    val collected = bigramCounts.limit(probeLimit).collect()
    require(collected.length <= maxBigrams,
      s"train: clean slice has more than maxBigrams=$maxBigrams distinct " +
        "bigrams — train on a smaller slice or raise the bound deliberately")
    val pairs = collected.map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val keys = pairs.map(_._1)
    val vals = pairs.map(_._2)
    val ctxCounts = new Array[Long](vocab.length + 2)
    var i = 0
    while (i < keys.length) {
      ctxCounts((keys(i) >>> 32).toInt) += vals(i)
      i += 1
    }
    new Model(vocab, unigram, unkCount, total, keys, vals, ctxCounts, alpha)
  }

  /** Per-document score under the broadcast model: (n_tokens, avg_nll,
    * ppl) where avg_nll is the mean natural-log negative likelihood per
    * token and ppl = exp(avg_nll). Empty documents score (0, 0.0, 1.0).
    * Lowering happens HERE (not in the caller), so scoring and
    * training tokenization can't diverge.
    */
  def score(text: UTF8String, bcast: Broadcast[Model]): GenericInternalRow = {
    val m = bcast.value
    // Locale.ROOT matches Spark's lower() ASCII fast path used at
    // training time; the default locale would diverge under e.g. tr_TR
    // ('I' -> dotless 'ı'), making every such token OOV at scoring.
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var ctx = m.startId
    var nll = 0.0
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsChar(s.charAt(i))) i += 1
      if (i > start) {
        val w = m.idOf(s.substring(start, i))
        val pu = m.pUnigram(w)
        val p = (m.bigramCount(ctx, w) + m.alpha * pu) /
          (m.contextCounts(ctx) + m.alpha)
        nll -= math.log(p)
        n += 1L
        ctx = w
      }
    }
    val avg = if (n == 0L) 0.0 else nll / n
    val ppl = if (n == 0L) 1.0 else math.exp(avg)
    new GenericInternalRow(Array[Any](n, avg, ppl))
  }

  @inline private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  case class NgramScoreExpr(child: Expression, bcast: Broadcast[Model])
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("avg_nll", DoubleType, nullable = false),
      StructField("ppl", DoubleType, nullable = false)))
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "lm_score"
    override def nullSafeEval(input: Any): Any =
      score(input.asInstanceOf[UTF8String], bcast)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lmModel", bcast,
        classOf[Broadcast[Model]].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.NgramLm.score($input, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: broadcasts the trained model once per call — train
    * once, reuse the returned Column across a query; per-batch loops
    * should hold the model and call this once (the broadcast is per
    * invocation, not cached: models are caller-owned, unlike
    * [[Bpe.defaultMerges]]-style shared constants).
    */
  def lm_score(spark: SparkSession, text: Column, model: Model): Column = {
    val bcast = spark.sparkContext.broadcast(model)
    GraftInterop.column(NgramScoreExpr(GraftInterop.expression(text), bcast))
  }

  /** Broadcast payload of the training pass: the vocab ships as a flat
    * array, the lookup map hashes once per executor JVM (the
    * [[Model.index]] trick).
    */
  final class VocabIndex(val vocab: Array[String]) extends Serializable {
    def unkId: Int = vocab.length
    def startId: Int = vocab.length + 1
    @transient private lazy val index: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.length * 2)
      var i = 0
      while (i < vocab.length) { m.put(vocab(i), i); i += 1 }
      m
    }
    def idOf(token: String): Int = {
      val r = index.get(token)
      if (r == null) unkId else r.intValue()
    }
  }

  /** The packed bigram keys of one LOWERED document: key i =
    * `(ctx << 32) | w` over the token-id stream with `<s>` opening the
    * document and OOV folded to unk — one key per token. Tokenization
    * is the family's whitespace loop (identical token stream to
    * [[score]] and the split-regex the aggregates use).
    */
  def bigramKeys(text: UTF8String, bcast: Broadcast[VocabIndex]):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val v = bcast.value
    val s = text.toString
    // token count first: exact-size output, no buffer growth
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      if (i < len) n += 1
      while (i < len && !isWsChar(s.charAt(i))) i += 1
    }
    val out = new Array[Any](n)
    var ctx = v.startId
    var k = 0
    i = 0
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsChar(s.charAt(i))) i += 1
      if (i > start) {
        val w = v.idOf(s.substring(start, i))
        out(k) = (ctx.toLong << 32) | w.toLong
        ctx = w
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class BigramKeysExpr(child: Expression, bcast: Broadcast[VocabIndex])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "bigram_keys"
    override def nullSafeEval(input: Any): Any =
      bigramKeys(input.asInstanceOf[UTF8String], bcast)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lmVocab", bcast,
        classOf[Broadcast[VocabIndex]].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.NgramLm.bigramKeys($input, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The training pass's key column (null text -> null array, dropped
    * by the explode — same outcome as the old flatMap's empty stream).
    */
  def bigram_keys(loweredText: Column, bcast: Broadcast[VocabIndex]): Column =
    GraftInterop.column(BigramKeysExpr(GraftInterop.expression(loweredText), bcast))

  // ------------------------------------------------------------------
  // Trigram stupid backoff (Brants et al. 2007): the web-scale scoring
  // recipe — no discounting to tune, counts only, each backoff level
  // multiplies a fixed 0.4. Not a probability distribution (scores
  // don't sum to 1), which is exactly why it needs no smoothing state
  // and scales to corpus-sized count tables.
  // ------------------------------------------------------------------

  /** Id packing width for trigram keys: 3 ids per long. */
  private val TriBits = 21
  private val TriMask = (1L << TriBits) - 1

  /** Trained trigram count table. Trigram keys pack `(u << 42) |
    * (v << 21) | w`; `ctx2Keys` pack `(u << 21) | v` with
    * `ctx2Vals(i) = sum_w c3(u, v, w)`. Bigram arrays reuse the
    * [[Model]] packing (`(v << 32) | w`); `contextCounts` are the
    * bigram-context totals. Terminal unigram level is the Laplace
    * backbone (so unk and unseen tokens never hit -log 0).
    */
  final class TrigramModel(
      val vocab: Array[String],
      val unigram: Array[Long],
      val unkCount: Long,
      val total: Long,
      val bigramKeys: Array[Long],
      val bigramVals: Array[Long],
      val contextCounts: Array[Long],
      val trigramKeys: Array[Long],
      val trigramVals: Array[Long],
      val ctx2Keys: Array[Long],
      val ctx2Vals: Array[Long],
      val backoff: Double) extends Serializable {

    def unkId: Int = vocab.length
    def startId: Int = vocab.length + 1

    @transient private lazy val index: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.length * 2)
      var i = 0
      while (i < vocab.length) { m.put(vocab(i), i); i += 1 }
      m
    }
    def idOf(token: String): Int = {
      val r = index.get(token)
      if (r == null) unkId else r.intValue()
    }
    def c3(u: Int, v: Int, w: Int): Long = {
      val key = (u.toLong << (2 * TriBits)) | (v.toLong << TriBits) | w.toLong
      val i = java.util.Arrays.binarySearch(trigramKeys, key)
      if (i >= 0) trigramVals(i) else 0L
    }
    def c2ctx(u: Int, v: Int): Long = {
      val key = (u.toLong << TriBits) | v.toLong
      val i = java.util.Arrays.binarySearch(ctx2Keys, key)
      if (i >= 0) ctx2Vals(i) else 0L
    }
    def c2(v: Int, w: Int): Long = {
      val key = (v.toLong << 32) | w.toLong
      val i = java.util.Arrays.binarySearch(bigramKeys, key)
      if (i >= 0) bigramVals(i) else 0L
    }
    /** Laplace unigram terminal (identical form to [[Model.pUnigram]]). */
    def pUnigram(w: Int): Double = {
      val c = if (w < vocab.length) unigram(w) else unkCount
      (c + 1.0) / (total + vocab.length + 1.0)
    }
  }

  /** Train the trigram table on the clean slice — the [[train]] shape
    * with one extra codegen'd key pass: unigram/bigram passes are
    * shared machinery, the trigram pass emits 21-bit-packed keys with a
    * double-`<s>` opening context. The driver bound stays the MODEL
    * (distinct folded trigrams under `maxNgrams`, checked before
    * collect); vocabSize caps it at (V+2)^3 regardless of slice size.
    */
  def trainTrigram(
      df: DataFrame, textCol: String,
      vocabSize: Int = 4096, maxNgrams: Int = 4000000,
      backoff: Double = 0.4): TrigramModel = {
    require(vocabSize > 0 && vocabSize + 2 < (1 << TriBits),
      s"trainTrigram: vocabSize must be in [1, ${(1 << TriBits) - 3}] (got $vocabSize)")
    require(backoff > 0 && backoff <= 1, s"trainTrigram: backoff in (0,1] (got $backoff)")
    val spark = df.sparkSession
    import spark.implicits._
    // widen: THREE tokenize/key-explode passes (unigram, bigram,
    // trigram counts) run over this frame's partitioning — one task
    // each on a single-file bench scan; the three passes reuse one
    // widen exchange (byte-guarded identity at corpus scale)
    val wdf = graft.operators.Widen.widen(df.select(col(textCol)))
    val toks = wdf
      .select(explode(split(lower(col(textCol)), WsRegex)).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("n")).cache()
    val (total, vocabRows) =
      try {
        val t = counts.agg(coalesce(sum(col("n")), lit(0L))).as[Long].head()
        val v = counts.orderBy(col("n").desc, col("tok").asc).limit(vocabSize)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        (t, v)
      } finally { counts.unpersist(); () }
    val vocab = vocabRows.map(_._1)
    val unigram = vocabRows.map(_._2)
    val unkCount = total - unigram.sum
    val bVocab = spark.sparkContext.broadcast(new VocabIndex(vocab))

    def packedCounts(keyCol: Column, cap: Int, what: String): Array[(Long, Long)] = {
      val grouped = wdf.select(explode(keyCol).as("key"))
        .groupBy("key").agg(count(lit(1)).as("n"))
      val probeLimit = math.min(cap.toLong + 1L, Int.MaxValue.toLong).toInt
      val collected = grouped.limit(probeLimit).collect()
      require(collected.length <= cap,
        s"trainTrigram: clean slice has more than $cap distinct $what — " +
          "train on a smaller slice or raise the bound deliberately")
      collected.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    }
    val bi = packedCounts(bigram_keys(lower(col(textCol)), bVocab), maxNgrams, "bigrams")
    val tri = packedCounts(trigram_keys(lower(col(textCol)), bVocab), maxNgrams, "trigrams")

    val ctxCounts = new Array[Long](vocab.length + 2)
    bi.foreach { case (k, n) => ctxCounts((k >>> 32).toInt) += n }
    // ctx2 totals aggregate trigram counts by their (u, v) prefix; the
    // trigram array is already prefix-sorted, so one linear merge pass
    val ctx2K = Array.newBuilder[Long]
    val ctx2V = Array.newBuilder[Long]
    var i = 0
    while (i < tri.length) {
      val prefix = tri(i)._1 >>> TriBits
      var s = 0L
      while (i < tri.length && (tri(i)._1 >>> TriBits) == prefix) {
        s += tri(i)._2; i += 1
      }
      ctx2K += prefix; ctx2V += s
    }
    new TrigramModel(vocab, unigram, unkCount, total,
      bi.map(_._1), bi.map(_._2), ctxCounts,
      tri.map(_._1), tri.map(_._2), ctx2K.result(), ctx2V.result(), backoff)
  }

  /** Per-document stupid-backoff score: (n_tokens, avg_nll, ppl) over
    * `-log S(w | u, v)` with the fixed-multiplier backoff chain
    * trigram -> bigram -> Laplace unigram. Same tokenization loop and
    * empty-doc convention as [[score]].
    */
  def scoreTrigram(text: UTF8String, bcast: Broadcast[TrigramModel]): GenericInternalRow = {
    val m = bcast.value
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var u = m.startId
    var v = m.startId
    var nll = 0.0
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsChar(s.charAt(i))) i += 1
      if (i > start) {
        val w = m.idOf(s.substring(start, i))
        val t3 = m.c3(u, v, w)
        val sc =
          if (t3 > 0L) t3.toDouble / m.c2ctx(u, v)
          else {
            val t2 = m.c2(v, w)
            val s2 =
              if (t2 > 0L) t2.toDouble / m.contextCounts(v)
              else m.backoff * m.pUnigram(w)
            m.backoff * s2
          }
        nll -= math.log(sc)
        n += 1L
        u = v
        v = w
      }
    }
    val avg = if (n == 0L) 0.0 else nll / n
    val ppl = if (n == 0L) 1.0 else math.exp(avg)
    new GenericInternalRow(Array[Any](n, avg, ppl))
  }

  case class TrigramScoreExpr(child: Expression, bcast: Broadcast[TrigramModel])
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("avg_nll", DoubleType, nullable = false),
      StructField("ppl", DoubleType, nullable = false)))
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "lm_score3"
    override def nullSafeEval(input: Any): Any =
      scoreTrigram(input.asInstanceOf[UTF8String], bcast)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lm3Model", bcast,
        classOf[Broadcast[TrigramModel]].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.NgramLm.scoreTrigram($input, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API for the trigram scorer ([[lm_score]]'s broadcast
    * contract: one broadcast per call, model caller-owned).
    */
  def lm_score3(spark: SparkSession, text: Column, model: TrigramModel): Column = {
    val bcast = spark.sparkContext.broadcast(model)
    GraftInterop.column(TrigramScoreExpr(GraftInterop.expression(text), bcast))
  }

  /** Packed trigram keys of one LOWERED document: key i =
    * `(u << 42) | (v << 21) | w` over the id stream with a
    * double-`<s>` opening context — one key per token.
    */
  def trigramKeys(text: UTF8String, bcast: Broadcast[VocabIndex]):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val vi = bcast.value
    val s = text.toString
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      if (i < len) n += 1
      while (i < len && !isWsChar(s.charAt(i))) i += 1
    }
    val out = new Array[Any](n)
    var u = vi.startId
    var v = vi.startId
    var k = 0
    i = 0
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsChar(s.charAt(i))) i += 1
      if (i > start) {
        val w = vi.idOf(s.substring(start, i))
        out(k) = (u.toLong << (2 * TriBits)) | (v.toLong << TriBits) | w.toLong
        u = v
        v = w
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class TrigramKeysExpr(child: Expression, bcast: Broadcast[VocabIndex])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "trigram_keys"
    override def nullSafeEval(input: Any): Any =
      trigramKeys(input.asInstanceOf[UTF8String], bcast)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lm3Vocab", bcast,
        classOf[Broadcast[VocabIndex]].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.NgramLm.trigramKeys($input, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def trigram_keys(loweredText: Column, bcast: Broadcast[VocabIndex]): Column =
    GraftInterop.column(TrigramKeysExpr(GraftInterop.expression(loweredText), bcast))
}
