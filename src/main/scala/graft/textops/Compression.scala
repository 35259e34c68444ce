package graft.textops

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal — the one cheap gate that catches
  * what the rule/LM/classifier stack misses for free: binary-as-text,
  * base64 runs, and hex dumps are nearly INCOMPRESSIBLE (ratio ~1),
  * while template spam and keyword stuffing are pathologically
  * COMPRESSIBLE (ratio ~0). Both CCNet and Gopher-style curation
  * stacks ship exactly this deflate gate.
  *
  * Determinism: DEFLATE at a FIXED level with no preset dictionary
  * (raw stream, no zlib/gzip wrapper) is a deterministic function of
  * the input bytes for a given deflate implementation; engine and the
  * q112 oracle's independent driver-side scorer share only the level
  * constant (manual `Deflater.deflate` loop vs `DeflaterOutputStream`
  * — two code paths over the same codec, the q64 discipline). The
  * ratio is integerized (`deflate_bytes * 10000 DIV max(raw_bytes,
  * 1)`) so every downstream threshold is engine-exact.
  *
  * 100 TB shape: one codegen'd pass, no shuffle; the per-thread
  * `Deflater` is reused via ThreadLocal (native allocation per row
  * would dominate).
  */
object Compression {

  val DefaultLevel = 6

  private val localDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(DefaultLevel, true)
  }

  /** Deflated byte count of the UTF-8 bytes of `s` at `level` (raw
    * deflate, no wrapper, no dictionary).
    */
  def deflatedLen(s: UTF8String, level: Int): Long = {
    val bytes = s.getBytes
    val reuse = level == DefaultLevel
    val d = if (reuse) { val t = localDeflater.get(); t.reset(); t }
      else new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally if (!reuse) d.end()
  }

  case class DeflateLenExpr(child: Expression, level: Int)
      extends UnaryExpression {
    require(level >= 1 && level <= 9, s"deflate level must be 1..9, got $level")
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "deflate_len"
    override def nullSafeEval(input: Any): Any =
      deflatedLen(input.asInstanceOf[UTF8String], level)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.Compression.deflatedLen($input, $level);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form: deflated byte count of `text`. */
  def deflate_len(text: Column, level: Int = DefaultLevel): Column =
    GraftInterop.column(DeflateLenExpr(GraftInterop.expression(text), level))

  /** The full signal:
    * `struct<raw_bytes long, deflate_bytes long, ratio_x10000 long>`
    * — raw = UTF-8 octet length, ratio floor'd x10000 (0 for empty
    * text: nothing to judge).
    */
  def compressionSignal(text: Column, level: Int = DefaultLevel): Column = {
    val t = coalesce(text, lit(""))
    val raw = length(t.cast("binary")).cast("long")
    val dl = deflate_len(t, level)
    struct(
      raw.as("raw_bytes"),
      dl.as("deflate_bytes"),
      when(raw === 0, 0L)
        .otherwise(floor(dl * 10000 / raw).cast("long")).as("ratio_x10000"))
  }
}
