package graft.textops

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest internal repeat — the intra-document duplication signal
  * token-level repetition ratios miss: a document that pastes the
  * same paragraph twice has a LONG repeated substring even when its
  * token histogram looks normal (the classic copy-paste/spam shape;
  * Gopher's "duplicate line fraction" family measures the same thing
  * line-wise, [[LineDedup]] cross-doc — this is the within-doc
  * substring version).
  *
  * Definition: the length (UTF-16 units, documented) of the longest
  * substring occurring at least TWICE in the text, overlaps allowed
  * ("aaaa" → 3, "banana" → 3 for "ana"). Computed by binary search
  * over the answer length (repeat existence is monotone in length)
  * with a rolling-hash window index per probe; hash hits verify by
  * EXACT comparison, so collisions cannot produce a wrong answer —
  * O(n log n) expected per document, one codegen'd narrow pass,
  * stateless (streams unchanged).
  */
object Repeats {

  private val B = 1000003L // polynomial rolling-hash base (odd, > char)

  /** True iff some length-`len` substring occurs twice (exact —
    * bucket hits verify with regionMatches).
    */
  private def hasRepeat(s: String, len: Int): Boolean = {
    val n = s.length
    if (len <= 0) return true
    if (len > n - 1) return false
    var pow = 1L
    var i = 1
    while (i < len) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < len) { h = h * B + s.charAt(i); i += 1 }
    val buckets = new java.util.HashMap[java.lang.Long, java.util.ArrayList[Integer]]()
    var start = 0
    while (start <= n - len) {
      val key = java.lang.Long.valueOf(h)
      var list = buckets.get(key)
      if (list != null) {
        var j = 0
        while (j < list.size()) {
          if (s.regionMatches(list.get(j), s, start, len)) return true
          j += 1
        }
      } else {
        list = new java.util.ArrayList[Integer](1)
        buckets.put(key, list)
      }
      list.add(start)
      if (start + len < n)
        h = (h - s.charAt(start) * pow) * B + s.charAt(start + len)
      start += 1
    }
    false
  }

  /** The longest-repeat length of `s` (0 when nothing repeats). */
  def longestRepeat(s: String): Int = {
    val n = s.length
    if (n < 2) return 0
    var lo = 0
    var hi = n - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (hasRepeat(s, mid)) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Static entry point for generated code. */
  def evalRepeat(input: UTF8String): Int = longestRepeat(input.toString)

  case class LongestRepeatExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "longest_repeat"
    override def nullSafeEval(input: Any): Any =
      evalRepeat(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.Repeats.evalRepeat($input);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: `longest_repeat(col("text"))`. */
  def longest_repeat(text: Column): Column =
    GraftInterop.column(LongestRepeatExpr(GraftInterop.expression(text)))
}
