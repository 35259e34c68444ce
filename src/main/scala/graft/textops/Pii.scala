package graft.textops

import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PII detection and redaction over a text column — the scrubbing pass
  * every large-scale training-data pipeline runs before anything else
  * touches the corpus (emails / IP addresses / US SSNs / phone numbers
  * / credit cards here; the pattern set is a config surface, not a
  * closed list).
  *
  * Pure `regexp_count` / `regexp_replace` Column work where a regex is
  * the whole check: codegen'd, narrow (no shuffle),
  * pushdown-transparent — at 100 TB this is a map-only pass whose cost
  * is the regex engine itself. Patterns stay inside the common
  * Java-regex/RE2 subset (character classes, bounded repetition, `\b`;
  * no lookaround) so the DuckDB oracle runs the SAME pattern strings
  * (q45's SQL twin). Credit cards add the one check a regex cannot
  * express — the Luhn checksum — as a codegen'd expression
  * ([[CardLuhnCountExpr]] / [[CardLuhnRedactExpr]]); the oracle twin
  * embeds the checksum as an arithmetic CASE over the 16 digits.
  */
object Pii {

  /** local-part@domain.tld — deliberately permissive on the local part
    * (training corpora contain obfuscated variants; over-redacting an
    * address-shaped token is the safe direction for a scrubbing pass).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Four dotted octet-shaped runs. Permissive (matches 999.0.0.1):
    * octet range-checking triples the pattern for no scrubbing value.
    */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** US social security number, dashed form only. */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Phone numbers: E.164 (`+` then 8-15 digits) or the separated US
    * national forms `555-123-4567` / `555.123.4567` / `(555) 123-4567`.
    * Separators are REQUIRED in the national form — a bare 10-digit
    * run is far more often an id than a phone number, and over-eager
    * digit-run redaction destroys training data (ids, quantities,
    * years). The leading `\b` sits INSIDE the optional `\(` (between
    * two non-word chars a boundary never holds, so `\b\(?` would
    * reject `(555) ...`).
    */
  val PhoneRe =
    "(\\+[1-9][0-9]{7,14}|\\(?\\b[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4})\\b"

  /** Credit-card CANDIDATES: 16 digits, plain or in `-`/space-separated
    * groups of four. A candidate only counts as (and is only redacted
    * as) a card when the Luhn checksum holds — see [[luhnValid]].
    */
  val CardRe = "\\b[0-9]{4}([- ]?[0-9]{4}){3}\\b"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
  def countIpv4(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def countSsn(text: Column): Column = regexp_count(text, lit(SsnRe))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def countCardCandidates(text: Column): Column = regexp_count(text, lit(CardRe))

  /** Candidates that PASS the Luhn checksum (the ones redaction will
    * scrub).
    */
  def countValidCards(text: Column): Column =
    GraftInterop.column(CardLuhnCountExpr(GraftInterop.expression(text)))

  /** `text` with every Luhn-VALID card candidate replaced by `<CARD>`;
    * Luhn-failing candidates (order ids, arbitrary digit groups) are
    * left untouched.
    */
  def redactValidCards(text: Column): Column =
    GraftInterop.column(CardLuhnRedactExpr(GraftInterop.expression(text)))

  /** All five classes replaced with typed placeholder tags. Email runs
    * first: the other patterns cannot match inside an already-redacted
    * `<EMAIL>` tag, and neither dotted-quad, dashed-SSN, separated-
    * phone nor 16-digit-card shapes occur inside a matched email.
    * Phone runs before card: the 3-3-4 phone groups cannot match
    * inside a 4-4-4-4 card run (`\b`/separator positions exclude it),
    * and vice versa.
    */
  def redact(text: Column): Column =
    redactValidCards(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          SsnRe, "<SSN>"),
        PhoneRe, "<PHONE>"))

  /** Per-document counts + redacted text. */
  def withPiiStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", countEmails(col(textCol)))
      .withColumn("n_ipv4", countIpv4(col(textCol)))
      .withColumn("n_ssn", countSsn(col(textCol)))
      .withColumn("n_phones", countPhones(col(textCol)))
      .withColumn("n_card_candidates", countCardCandidates(col(textCol)))
      .withColumn("n_cards", countValidCards(col(textCol)))
      .withColumn("redacted", redact(col(textCol)))

  /** Luhn checksum over a separator-free digit string: doubling every
    * second digit from the RIGHT (subtracting 9 past 9), the total
    * must be divisible by 10.
    */
  def luhnValid(digits: String): Boolean = {
    var sum = 0
    var alt = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  private lazy val CardPattern = java.util.regex.Pattern.compile(CardRe)

  private def stripSeps(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '-' && c != ' ') b.append(c)
      i += 1
    }
    b.toString
  }

  /** Static entry points for generated code (Java-callable). */
  def cardCountEval(text: UTF8String): Int = {
    val m = CardPattern.matcher(text.toString)
    var n = 0
    while (m.find()) if (luhnValid(stripSeps(m.group()))) n += 1
    n
  }

  def cardRedactEval(text: UTF8String): UTF8String = {
    val s = text.toString
    val m = CardPattern.matcher(s)
    val out = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      if (luhnValid(stripSeps(m.group()))) {
        out.append(s, last, m.start()).append("<CARD>")
        last = m.end()
      }
    }
    out.append(s, last, s.length)
    UTF8String.fromString(out.toString)
  }

  case class CardLuhnCountExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "card_luhn_count"
    override def nullSafeEval(input: Any): Any =
      cardCountEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.Pii.cardCountEval($input);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class CardLuhnRedactExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "card_luhn_redact"
    override def nullSafeEval(input: Any): Any =
      cardRedactEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.Pii.cardRedactEval($input);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
