package graft.textops

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): rolling Rabin-Karp hashes of character k-grams, then one
  * selected (minimum) hash per window of w consecutive k-gram hashes —
  * rightmost minimum, deduplicated. Two documents sharing a run of
  * >= w+k-1 characters are guaranteed to share a fingerprint, so a
  * fingerprint-overlap join finds copied passages at any offset.
  *
  * One pass over the text in a custom expression: the rolling hash
  * reuses the previous k-gram's value (remove the leading char, append
  * the next), the window minimum uses a ring buffer.
  */
case class WinnowingExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    Winnowing.eval(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"""
         |${ev.value} = graft.textops.Winnowing.eval($input, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnowing {

  private val B = 1000003L          // polynomial base
  private val M = (1L << 61) - 1    // Mersenne modulus keeps products in range

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit Mersenne multiplication via 128-bit split
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 2^64*hi + lo mod 2^61-1: 2^64 = 8 mod M
    val part = ((hi << 3) | (lo >>> 61)) + (lo & M)
    val r = if (part >= M) part - M else part
    r
  }

  /** Rolling-hash winnowing fingerprints of the lowered text. Null when
    * shorter than one k-gram.
    */
  def eval(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString.toLowerCase
    val n = s.length
    if (n < k) return null
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // precompute B^(k-1) mod M
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = mulmod(pow, B); i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (mulmod(h, B) + s.charAt(i)) % M; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      val drop = mulmod(s.charAt(i - 1), pow)
      h = (h - drop % M + M) % M
      h = (mulmod(h, B) + s.charAt(i + k - 1)) % M
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each window of w hashes, dedup runs
    val out = new java.util.ArrayList[Long]()
    if (nGrams <= w) {
      var min = hashes(0); var mi = 0
      i = 1
      while (i < nGrams) { if (hashes(i) <= min) { min = hashes(i); mi = i }; i += 1 }
      out.add(min)
    } else {
      var lastPicked = -1
      var start = 0
      while (start + w <= nGrams) {
        var min = hashes(start); var mi = start
        i = start + 1
        while (i < start + w) { if (hashes(i) <= min) { min = hashes(i); mi = i }; i += 1 }
        if (mi != lastPicked) { out.add(hashes(mi)); lastPicked = mi }
        start += 1
      }
    }
    val arr = new Array[Any](out.size)
    i = 0
    while (i < out.size) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  def winnow_fingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    GraftInterop.column(WinnowingExpr(GraftInterop.expression(text), k, w))
}
