package graft.textops

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle hashing for the near-dup family.
  *
  * The Column formulation (`transform(sequence(...), i ->
  * array_join(slice(tokens, i, n), " "))` followed by `xxhash64` per
  * shingle) allocates one string per shingle per pass — profiling at
  * sf0.1 put shingle GENERATION at ~4 s of q25's 9.7 s, with the band
  * keys' `array_join` strings adding ~3 s more. These expressions do the
  * same work in one scan over the text bytes with zero intermediate
  * strings:
  *
  * - [[HashedShinglesExpr]]: lowered text -> sorted distinct
  *   `array<long>` of n-gram token-hash shingles (FNV-1a per token,
  *   order-sensitive FNV fold across the n window).
  * - [[MinHashSigLongExpr]]: MinHash signature over those long shingles
  *   (same permutation family as [[MinHashSig]], input hash differs).
  * - [[BandKeysExpr]]: LSH band keys as an FNV fold of each signature
  *   slice — replaces `hash(array_join(slice(sig, ...)))`.
  * - [[SortedIntersectSizeExpr]]: merge-scan `|A ∩ B|` of two sorted
  *   distinct long arrays — with set sizes carried alongside,
  *   `|A ∪ B| = |A| + |B| - |A ∩ B|`, so exact Jaccard needs no
  *   `array_intersect`/`array_union` hash-set builds per pair.
  *
  * Jaccard over hashed shingles equals Jaccard over string shingles
  * unless two distinct shingles collide in 64 bits (see
  * [[NearDup.ngramJaccardPairs]]'s collision-odds note).
  */
object TokenShingles {

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** Is `b` a UTF-8 byte that Java's regex `\s` would split on?
    * (space, \t, \n, \x0B, \f, \r — all single-byte in UTF-8, so a
    * byte-level scan tokenizes identically to `split(text, "\\s+")`
    * for any UTF-8 input: multi-byte sequences never contain these.)
    * Shared with [[SimHash.evalText]] — the two scanners' tokenization
    * must stay byte-for-byte in lockstep (PropertySpec pins both
    * against the split() reference).
    */
  @inline private[textops] def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Sorted distinct n-gram shingle hashes of a (pre-lowered) text.
    * Returns an empty array when the text has fewer than n tokens —
    * same contract as [[NearDup.shingles]] + distinct + hash.
    */
  def hashedShingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // pass 1 within the same scan: hash each whitespace-delimited token
    var tokenHashes = new Array[Long](16)
    var nTokens = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        var h = FnvOffset
        while (i < len && !isWs(bytes(i))) {
          h ^= (bytes(i) & 0xffL)
          h *= FnvPrime
          i += 1
        }
        if (nTokens == tokenHashes.length) {
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTokens * 2)
        }
        tokenHashes(nTokens) = h
        nTokens += 1
      }
    }
    if (nTokens < n) return new GenericArrayData(Array.empty[Any])
    // order-sensitive FNV fold across each n-token window
    val m = nTokens - n + 1
    val sh = new Array[Long](m)
    var s = 0
    while (s < m) {
      var h = FnvOffset
      var j = 0
      while (j < n) {
        val t = tokenHashes(s + j)
        h = (h ^ t) * FnvPrime
        j += 1
      }
      sh(s) = h
      s += 1
    }
    java.util.Arrays.sort(sh)
    // compact unique in place
    var out = 1
    var k = 1
    while (k < m) {
      if (sh(k) != sh(k - 1)) { sh(out) = sh(k); out += 1 }
      k += 1
    }
    val res = new Array[Any](out)
    var r = 0
    while (r < out) { res(r) = sh(r); r += 1 }
    new GenericArrayData(res)
  }

  /** MinHash over long shingles: fold each to 31 bits, update all k
    * permutation minima (perm_i(h) = ((2i+1)h + 17i + 7) mod P) in one
    * pass — the long-input twin of [[MinHashSig.eval]].
    */
  def minhashSigLong(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val P = MinHashSig.P
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var si = 0
    while (si < n) {
      val raw = shingles.getLong(si) % P
      val h = if (raw < 0) raw + P else raw
      var i = 0
      while (i < k) {
        val v = ((2L * i + 1L) * h + 17L * i + 7L) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      si += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  /** LSH band keys: FNV fold of each r-element signature slice. */
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = FnvOffset
      var j = 0
      while (j < rowsPerBand) {
        h = (h ^ sig.getLong(b * rowsPerBand + j)) * FnvPrime
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Merge-scan intersection size of two SORTED DISTINCT long arrays. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  case class HashedShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "hashed_shingles"
    override def nullSafeEval(input: Any): Any =
      hashedShingles(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.TokenShingles.hashedShingles($input, $n);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class MinHashSigLongExpr(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_sig_long"
    override def nullSafeEval(input: Any): Any =
      minhashSigLong(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"""
           |${ev.value} = graft.textops.TokenShingles.minhashSigLong($input, $k);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class BandKeysExpr(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "lsh_band_keys"
    override def nullSafeEval(input: Any): Any =
      bandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.TokenShingles.bandKeys($input, $bands, $rowsPerBand);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class SortedIntersectSizeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "sorted_intersect_size"
    override def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.textops.TokenShingles.sortedIntersectSize($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def hashed_shingles(loweredText: Column, n: Int): Column =
    GraftInterop.column(HashedShinglesExpr(GraftInterop.expression(loweredText), n))

  def minhash_sig_long(shingles: Column, k: Int): Column =
    GraftInterop.column(MinHashSigLongExpr(GraftInterop.expression(shingles), k))

  def lsh_band_keys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    GraftInterop.column(BandKeysExpr(GraftInterop.expression(sig), bands, rowsPerBand))

  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftInterop.column(SortedIntersectSizeExpr(
      GraftInterop.expression(a), GraftInterop.expression(b)))
}
