package graft.textops

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the ftfy-core case a crawl corpus hits
  * constantly: UTF-8 bytes mis-decoded as Latin-1/Windows-1252
  * ("café" → "cafÃ©", "it’s" → "itâ€™s"). The repair REVERSES the
  * mis-decode: map each char back to the byte it came from, then
  * strictly re-decode the bytes as UTF-8.
  *
  * Rules (deterministic, precision-first — when in doubt, do
  * nothing):
  *
  *  1. ASCII-only strings return unchanged (zero-copy fast path);
  *  2. every char must map to ONE byte: code points < U+0100 map to
  *     their Latin-1 byte; the 27 Windows-1252-specific code points
  *     (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ” • – — ˜ ™ š › œ ž Ÿ) map to
  *     their CP1252 byte; ANY other char (≥ U+0100 outside that
  *     table) means the string is not a pure mis-decode → unchanged;
  *  3. the byte sequence must decode as STRICT UTF-8 (malformed or
  *     unmappable anywhere → unchanged) — genuine Latin-1 text like
  *     "café" survives because 0xE9 followed by ASCII is not valid
  *     UTF-8;
  *  4. one pass only: doubly-encoded mojibake repairs one layer per
  *     application (composable; documented).
  *
  * Known, documented hazard: text that LITERALLY contains a valid
  * mojibake signature (a human actually typed "Ã©") is
  * indistinguishable from the mis-decode and gets "repaired" — the
  * standard ftfy precision tradeoff.
  *
  * One codegen'd narrow pass, stateless (streams unchanged).
  */
object Mojibake {

  /** Windows-1252 byte for each CP1252-specific code point (the 0x80–
    * 0x9F range positions that are NOT the C1 controls Latin-1 puts
    * there; undefined positions 0x81/0x8D/0x8F/0x90/0x9D decode to
    * the C1 chars U+0081… and return via the < U+0100 rule).
    */
  val cp1252Byte: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** The repair on a JVM string (rule set above). */
  def fix(s: String): String = {
    var hasHigh = false
    var i = 0
    while (i < s.length && !hasHigh) {
      if (s.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x100) bytes(i) = c.toByte
      else {
        val b = cp1252Byte.getOrElse(c, -1)
        if (b < 0) return s
        bytes(i) = b.toByte
      }
      i += 1
    }
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => s }
  }

  /** Static entry point for generated code. */
  def evalFix(input: UTF8String): UTF8String = {
    val s = input.toString
    val f = fix(s)
    if (f eq s) input else UTF8String.fromString(f)
  }

  case class FixMojibake(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "fix_mojibake"
    override def nullSafeEval(input: Any): Any =
      evalFix(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.Mojibake.evalFix($input);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: `fix_mojibake(col("text"))`. */
  def fix_mojibake(text: Column): Column =
    GraftInterop.column(FixMojibake(GraftInterop.expression(text)))
}
