package graft.textops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftInterop, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Merges-table-driven byte-pair-encoding token counting.
  *
  * Training-data budgets are set in BPE tokens, not whitespace tokens —
  * [[graft.textops.TextAnalysis]]'s `nTokens` (q22) counts the latter.
  * [[bpe_token_count]] counts the former: whitespace pre-tokenization,
  * then per word the classic BPE merge loop (repeatedly merge ALL
  * occurrences of the lowest-rank adjacent symbol pair present in the
  * merges table, left-to-right with overlap skipping, until no pair
  * ranks), summing the final symbol counts. This is the
  * Sennrich-et-al. greedy apply step over a fixed merges list — the
  * part a counting pipeline runs; learning the merges is corpus
  * training, out of scope.
  *
  * Scale shape: the merges table ships ONCE PER EXECUTOR as a Spark
  * `Broadcast` (a production vocab is ~50k merges ≈ 1 MB — riding the
  * serialized expression would re-ship it with every task), and the
  * rank map is built lazily once per JVM, not per row. The expression
  * itself stays inside whole-stage codegen via the static-call pattern
  * the other textops expressions use.
  */
object Bpe {

  /** A compiled merges table. `pairs` is the merge list in priority
    * order (index = rank, lower merges first). The rank map is
    * `@transient lazy`: the broadcast ships only the flat pairs array,
    * each executor hashes it once on first use.
    */
  final class Table(val pairs: Array[(String, String)]) extends Serializable {
    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pairs.length * 2)
      var i = 0
      while (i < pairs.length) {
        // symbols never contain whitespace (words are whitespace-split),
        // so "a b" keys are unambiguous; first occurrence of a duplicate
        // pair keeps the better rank
        val k = pairs(i)._1 + " " + pairs(i)._2
        if (!m.containsKey(k)) m.put(k, i)
        i += 1
      }
      m
    }

    /** Rank of (a, b), or Int.MaxValue when the pair never merges. */
    def rankOf(a: String, b: String): Int = {
      val r = rank.get(a + " " + b)
      if (r == null) Int.MaxValue else r.intValue()
    }
  }

  def table(merges: Seq[(String, String)]): Table = new Table(merges.toArray)

  /** A merges table plus a symbol->id vocabulary — the encode half's
    * broadcast unit. Id assignment is the Sennrich convention: base
    * symbols take ids `0..B-1` in the given order, merge `i`'s output
    * symbol takes id `B+i` (first occurrence wins when two merges
    * produce the same string, e.g. (a,bc) and (ab,c) -> "abc" —
    * matching [[Table]]'s first-wins rank). Symbols outside the
    * vocabulary encode as [[Coder.UnkId]] (-1): an explicit sentinel,
    * never a silent drop — token COUNTS must agree with
    * [[countTokens]] exactly.
    */
  final class Coder(val table: Table, val baseSymbols: Array[String])
      extends Serializable {
    @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](
        (baseSymbols.length + table.pairs.length) * 2)
      var i = 0
      while (i < baseSymbols.length) {
        if (!m.containsKey(baseSymbols(i))) m.put(baseSymbols(i), i)
        i += 1
      }
      var j = 0
      while (j < table.pairs.length) {
        val sym = table.pairs(j)._1 + table.pairs(j)._2
        if (!m.containsKey(sym)) m.put(sym, baseSymbols.length + j)
        j += 1
      }
      m
    }
    def id(sym: String): Int = {
      val r = idOf.get(sym)
      if (r == null) Coder.UnkId else r.intValue()
    }
  }

  object Coder { val UnkId: Int = -1 }

  def coder(merges: Seq[(String, String)], baseSymbols: Seq[String]): Coder =
    new Coder(table(merges), baseSymbols.toArray)

  /** Printable-ASCII base vocabulary (codepoints 33..126 — whitespace
    * never appears in a word by construction).
    */
  val asciiBase: Seq[String] = (33 to 126).map(_.toChar.toString)

  /** A small deterministic English-leaning merges list (common digraphs,
    * then compounds built from them) — a stand-in for a trained merges
    * file, in the exact format a real one loads into: ordered pairs.
    */
  val defaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("an", "d"), ("in", "g"), ("t", "o"), ("e", "s"), ("o", "u"),
    ("a", "l"), ("i", "t"), ("a", "r"), ("s", "t"), ("e", "d"),
    ("i", "s"), ("o", "f"), ("h", "e"), ("c", "o"), ("l", "e"),
    ("h", "a"), ("s", "e"), ("m", "e"), ("n", "t"), ("w", "h"),
    ("th", "at"), ("f", "or"), ("co", "n"), ("b", "e"), ("w", "as"),
    ("a", "s"), ("y", "ou"), ("wh", "i"), ("u", "s"), ("l", "i"),
    ("the", "re"), ("w", "it"), ("wit", "h"), ("er", "s"), ("p", "ro"),
    ("re", "s"), ("c", "h"), ("s", "h"), ("d", "e"), ("p", "a"),
    ("n", "o"), ("m", "a"), ("l", "o"), ("d", "i"), ("r", "a"),
    ("t", "i"), ("en", "t"), ("ing", "s"), ("at", "i"), ("es", "s"),
    ("ati", "on"), ("m", "ent"), ("1", "0"), ("2", "0"), ("0", "0"),
    ("in", "t"), ("p", "er"), ("f", "ro"), ("fro", "m"), ("s", "u"),
    ("b", "u"), ("n", "e"), ("g", "e"), ("v", "e"), ("t", "er"),
    ("st", "r"), ("a", "b"), ("p", "l"), ("e", "x"), ("c", "a"),
    ("o", "w"), ("u", "n"), ("q", "u"), ("qu", "e"), ("e", "l"),
    ("o", "m"), ("i", "c"), ("u", "r"), ("l", "y"), ("i", "d"),
    ("ha", "ve"), ("no", "t"), ("ar", "e"), ("on", "e"), ("al", "l"))

  /** BPE token count of `text` under the broadcast merges table.
    * Whitespace bytes (the `\s` set, single-byte in UTF-8) delimit
    * words; each word starts as its code-point symbols.
    */
  def countTokens(text: UTF8String, bcast: Broadcast[Table]): Int = {
    val t = bcast.value
    val s = text.toString
    var total = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsChar(s.charAt(i))) i += 1
      if (i > start) total += bpeWordCount(s.substring(start, i), t)
    }
    total
  }

  @inline private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The merge loop for one word. Symbols start as code points; each
    * round finds the lowest-rank adjacent pair and merges all its
    * occurrences left-to-right (a merged symbol can't immediately
    * re-merge with its own tail: "aaa" under (a,a) -> ["aa","a"]).
    */
  private def bpeWordCount(word: String, t: Table): Int = {
    val nCp = word.codePointCount(0, word.length)
    if (nCp <= 1) return nCp
    bpeWordSymbols(word, t).length
  }

  /** [[bpeWordCount]]'s merge loop, returning the final symbol
    * sequence — the encode path's core ([[countTokens]] keeps its
    * zero-allocation short-word fast path and delegates here
    * otherwise).
    */
  private def bpeWordSymbols(word: String, t: Table): Array[String] = {
    val nCp = word.codePointCount(0, word.length)
    var syms = new Array[String](nCp)
    var ci = 0
    var off = 0
    while (off < word.length) {
      val cp = word.codePointAt(off)
      val n = Character.charCount(cp)
      syms(ci) = word.substring(off, off + n)
      ci += 1
      off += n
    }
    var nSyms = nCp
    var done = false
    while (!done && nSyms > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < nSyms - 1) {
        val r = t.rankOf(syms(i), syms(i + 1))
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val a = syms(bestIdx)
        val b = syms(bestIdx + 1)
        val out = new Array[String](nSyms)
        var w = 0
        var rIdx = 0
        while (rIdx < nSyms) {
          if (rIdx < nSyms - 1 && syms(rIdx) == a && syms(rIdx + 1) == b) {
            out(w) = a + b
            w += 1
            rIdx += 2
          } else {
            out(w) = syms(rIdx)
            w += 1
            rIdx += 1
          }
        }
        syms = out
        nSyms = w
      }
    }
    if (nSyms == syms.length) syms else java.util.Arrays.copyOf(syms, nSyms)
  }

  case class BpeCountExpr(child: Expression, bcast: Broadcast[Table])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "bpe_token_count"
    override def nullSafeEval(input: Any): Any =
      countTokens(input.asInstanceOf[UTF8String], bcast)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeMerges", bcast,
        classOf[Broadcast[Table]].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.Bpe.countTokens($input, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** BPE-encode `text` to token ids under the broadcast coder — the
    * materialization step [[countTokens]] only counts: the id arrays
    * are what a training job actually reads. Same pre-tokenization
    * and merge loop, so `size(ids) == bpe_token_count` always.
    */
  def encodeIds(text: UTF8String, bcast: Broadcast[Coder]): ArrayData = {
    val c = bcast.value
    val t = c.table
    val s = text.toString
    val out = new java.util.ArrayList[Integer](s.length / 4 + 4)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsChar(s.charAt(i))) i += 1
      if (i > start) {
        val syms = bpeWordSymbols(s.substring(start, i), t)
        var j = 0
        while (j < syms.length) { out.add(c.id(syms(j))); j += 1 }
      }
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k).intValue(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  case class BpeEncodeExpr(child: Expression, bcast: Broadcast[Coder])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "bpe_encode"
    override def nullSafeEval(input: Any): Any =
      encodeIds(input.asInstanceOf[UTF8String], bcast)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeCoder", bcast,
        classOf[Broadcast[Coder]].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.Bpe.encodeIds($input, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One broadcast per (SparkContext, merges) — NOT per call: a
    * streaming foreachBatch loop or interactive session calling this
    * per batch would otherwise leak a fresh (production-vocab ~1 MB)
    * broadcast every time, and none is ever destroyed. Bounded by the
    * number of distinct merge tables a driver uses (in practice: one).
    *
    * Keyed on `(applicationId, startTime)` — a stable identity unique
    * per context lifetime. `sc.hashCode` (identity hash) can be reused
    * by a successor context object in the same JVM, which would hand
    * back a Broadcast owned by a DEAD context; and entries for stopped
    * contexts would accumulate across restarts. Entries whose context
    * has stopped are dropped on the next lookup (BpeCacheSpec pins the
    * two-sequential-contexts shape).
    */
  private[textops] val bcastCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, Long, Seq[(String, String)]),
        (java.lang.ref.WeakReference[org.apache.spark.SparkContext], Broadcast[Table])]

  /** Learn a merges table from a corpus — the training half of the
    * Sennrich et al. 2016 recipe ([[bpe_token_count]] is the apply
    * half; a table from [[train]] feeds it directly).
    *
    * 100 TB shape — how real BPE trainers run: the corpus-scale work
    * is ONE distributed word-count aggregation (map-side partial
    * combine collapses a word to one row per input partition before
    * the shuffle), because merge learning needs only the word
    * FREQUENCY TABLE, never the corpus. The table is Heaps-law
    * bounded; `maxVocab` caps the driver collect deterministically
    * (top by count, ties by word — rare words beyond the cap
    * contribute negligible pair mass). The merge loop then runs
    * driver-side over the weighted vocabulary: numMerges iterations
    * of count-adjacent-pairs → merge-best, at O(vocab · avgWordLen)
    * per iteration — independent of corpus size.
    *
    * Determinism (the oracle contract): pair counting weights every
    * adjacent position by word frequency (overlapping repeats count
    * each position, the reference implementation's `get_stats`);
    * best-pair ties break lexicographically on (left, right); merging
    * rewrites occurrences left-to-right without overlap (exactly
    * [[countTokens]]'s apply step). Training stops early when no pair
    * occurs at least `minPairFreq` times — merging noise pairs would
    * make the tail of the table partition-count-sensitive through the
    * maxVocab cap.
    *
    * Words are whitespace-split, NOT lowered — the same
    * pre-tokenization [[countTokens]] applies, so train and apply
    * cannot disagree about word boundaries.
    */
  def train(docs: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, maxVocab: Int = 1000000,
      minPairFreq: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0, s"train: numMerges must be >= 0, got $numMerges")
    require(maxVocab >= 1, s"train: maxVocab must be >= 1, got $maxVocab")
    import org.apache.spark.sql.functions._
    val toks = when(length(trim(col(textCol))) === 0,
      typedLit(Seq.empty[String]))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val vocab: Array[(String, Long)] = docs
      .select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromVocab(vocab, numMerges, minPairFreq)
  }

  /** The driver-side merge learner over a (word, freq) table. */
  private[textops] def trainFromVocab(
      vocab: Array[(String, Long)], numMerges: Int,
      minPairFreq: Long): Seq[(String, String)] = {
    // each word as its code-point symbols, carrying its corpus freq
    var words: Array[(Array[String], Long)] = vocab.map { case (w, f) =>
      val nCp = w.codePointCount(0, w.length)
      val syms = new Array[String](nCp)
      var ci = 0
      var off = 0
      while (off < w.length) {
        val cp = w.codePointAt(off)
        val n = Character.charCount(cp)
        syms(ci) = w.substring(off, off + n)
        ci += 1
        off += n
      }
      (syms, f)
    }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      var best: (String, String) = null
      var bestN = minPairFreq - 1
      counts.foreach { case (pair, n) =>
        if (n > bestN ||
          (n == bestN && best != null &&
            (pair._1 < best._1 || (pair._1 == best._1 && pair._2 < best._2)))) {
          best = pair
          bestN = n
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
        words = words.map { case (syms, f) =>
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            if (syms(i) == a && syms(i + 1) == b) has = true
            i += 1
          }
          if (!has) (syms, f)
          else {
            // left-to-right non-overlapping rewrite — countTokens' rule
            val out = new Array[String](syms.length)
            var w = 0
            var r = 0
            while (r < syms.length) {
              if (r < syms.length - 1 && syms(r) == a && syms(r + 1) == b) {
                out(w) = a + b; w += 1; r += 2
              } else { out(w) = syms(r); w += 1; r += 1 }
            }
            (java.util.Arrays.copyOf(out, w), f)
          }
        }
      }
      m += 1
    }
    merges.result()
  }

  /** Column API: broadcasts the compiled table once per (context,
    * merges), then reuses it across calls and batches.
    */
  def bpe_token_count(spark: SparkSession, text: Column,
      merges: Seq[(String, String)]): Column = {
    val sc = spark.sparkContext
    // evict entries belonging to stopped (or collected) contexts so the
    // cache stays bounded across sequential contexts in one JVM
    bcastCache.foreach { case (k, (ref, _)) =>
      val owner = ref.get()
      if (owner == null || owner.isStopped) bcastCache.remove(k)
    }
    val key = (sc.applicationId, sc.startTime, merges.toVector)
    val (_, bcast) = bcastCache.getOrElseUpdate(
      key,
      (new java.lang.ref.WeakReference(sc), sc.broadcast(table(merges))))
    GraftInterop.column(BpeCountExpr(GraftInterop.expression(text), bcast))
  }

  /** [[bcastCache]]'s twin for compiled coders (merges + base vocab). */
  private[textops] val coderCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, Long, Seq[(String, String)], Seq[String]),
        (java.lang.ref.WeakReference[org.apache.spark.SparkContext], Broadcast[Coder])]

  /** Column API for encode-to-ids: broadcasts the compiled coder once
    * per (context, merges, base vocab), then reuses it across calls
    * and batches — the [[bpe_token_count]] discipline.
    */
  def bpe_encode(spark: SparkSession, text: Column,
      merges: Seq[(String, String)],
      baseSymbols: Seq[String] = asciiBase): Column = {
    val sc = spark.sparkContext
    coderCache.foreach { case (k, (ref, _)) =>
      val owner = ref.get()
      if (owner == null || owner.isStopped) coderCache.remove(k)
    }
    val key = (sc.applicationId, sc.startTime, merges.toVector, baseSymbols.toVector)
    val (_, bcast) = coderCache.getOrElseUpdate(
      key,
      (new java.lang.ref.WeakReference(sc),
        sc.broadcast(coder(merges, baseSymbols))))
    GraftInterop.column(BpeEncodeExpr(GraftInterop.expression(text), bcast))
  }
}
