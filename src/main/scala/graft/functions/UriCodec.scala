package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Percent-decoding with Python `urllib.parse.unquote` semantics.
  *
  * The reference decodes URIs with `unquote` (risk.py:230-242, 328-332).
  * Spark's builtin `url_decode` follows `java.net.URLDecoder`
  * (application/x-www-form-urlencoded): it turns '+' into a space and
  * errors on stray '%' — both WRONG for reproducing the reference.
  * Python's unquote leaves '+' and any invalid %-sequence untouched and
  * decodes valid %XX byte runs as UTF-8 with U+FFFD replacement.
  */
object UriCodec {

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Python-unquote: decode %XX byte runs (UTF-8, replacement on
    * malformed), leave '+' and invalid sequences as-is.
    */
  def unquote(s: String): String = {
    if (s == null || s.indexOf('%') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    val bytes = new ByteArrayOutputStream()
    def flush(): Unit = if (bytes.size() > 0) {
      out.append(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      bytes.reset()
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      val ok = c == '%' && i + 2 < n &&
        hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0
      if (ok) {
        bytes.write((hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2)))
        i += 3
      } else {
        flush(); out.append(c); i += 1
      }
    }
    flush()
    out.toString
  }

  /** Iterated unquote with depth counter (reference risk.py:230-242):
    * decode up to `maxDepth` times, stopping at the fixpoint; returns
    * (final string, number of successful decode steps).
    */
  def unquoteNested(s: String, maxDepth: Int): (String, Int) = {
    var url = s
    var depth = 0
    var i = 0
    var done = false
    while (i < maxDepth && !done) {
      val decoded = unquote(url)
      if (decoded == url) done = true
      else { depth += 1; url = decoded }
      i += 1
    }
    (url, depth)
  }

  // ---- Catalyst expressions ------------------------------------------------

  /** `nested_unquote(uri)` -> struct<uri: string, depth: int>. */
  case class NestedUnquote(child: Expression, maxDepth: Int = 3)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("uri", StringType), StructField("depth", IntegerType)))
    override def nullable: Boolean = true
    override def prettyName: String = "nested_unquote"

    override def nullSafeEval(input: Any): Any =
      UriCodec.evalNested(input.asInstanceOf[UTF8String], maxDepth)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = "graft.functions.UriCodec"
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = $cls.evalNested($input, $maxDepth);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `py_unquote(uri)` -> string (single decode step). */
  case class PyUnquote(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "py_unquote"

    override def nullSafeEval(input: Any): Any =
      UriCodec.evalUnquote(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = "graft.functions.UriCodec"
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = $cls.evalUnquote($input);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // Static entry points for generated code (must be Java-callable).
  def evalNested(input: UTF8String, maxDepth: Int): InternalRow = {
    val (s, d) = unquoteNested(input.toString, maxDepth)
    new GenericInternalRow(Array[Any](UTF8String.fromString(s), d))
  }

  def evalUnquote(input: UTF8String): UTF8String = {
    val s = input.toString
    val u = unquote(s)
    if (u eq s) input else UTF8String.fromString(u)
  }

  // Column API
  def nested_unquote(c: Column, maxDepth: Int = 3): Column =
    GraftInterop.column(NestedUnquote(GraftInterop.expression(c), maxDepth))
  def py_unquote(c: Column): Column =
    GraftInterop.column(PyUnquote(GraftInterop.expression(c)))
}
