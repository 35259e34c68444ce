package graft.textops

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar's similarity-preserving
  * fingerprint): hash each token (FNV-1a 64, stable across JVMs), sum
  * ±1 per bit position weighted by occurrence, take the sign vector.
  * Near-duplicate texts land within small Hamming distance.
  *
  * A Catalyst expression (not a UDF) so the fingerprint stage stays in
  * whole-stage codegen; the 64-lane accumulation is a tight loop in the
  * static helper, not 64 Column expressions.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.textops.SimHash.eval($input);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {

  /** FNV-1a 64-bit over UTF-8 bytes — stable, dependency-free. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def eval(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** SimHash of a (pre-lowered) TEXT in one scan — tokenizes on the
    * same whitespace class as `split(text, "\\s+")` byte-wise and feeds
    * each token's FNV hash straight into the 64-lane accumulator, with
    * no intermediate token array. Identical to
    * `eval(split-tokens)` for any text without leading non-space
    * whitespace (see [[TokenShingles]] on the `trim` artifact).
    */
  def evalText(text: UTF8String): Long = {
    import TokenShingles.isWs // one shared whitespace class for both scanners
    val bytes = text.getBytes
    val acc = new Array[Int](64)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L
        while (i < len && !isWs(bytes(i))) {
          h ^= (bytes(i) & 0xffL)
          h *= 0x100000001b3L
          i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }


  def simhash64(tokens: Column): Column =
    GraftInterop.column(SimHash64(GraftInterop.expression(tokens)))

  def simhash64_text(loweredText: Column): Column =
    GraftInterop.column(SimHash64Text(GraftInterop.expression(loweredText)))
}

/** [[SimHash.evalText]] as an expression — the no-token-array twin of
  * [[SimHash64]].
  */
case class SimHash64Text(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64_text"

  override def nullSafeEval(input: Any): Any =
    SimHash.evalText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.textops.SimHash.evalText($input);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
