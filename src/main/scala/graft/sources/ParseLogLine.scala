package graft.sources

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** S6 as ONE Catalyst expression: first-match dispatch over the 8 ordered
  * log formats with early exit, single regex execution per tried format,
  * and the reference's post-capture fixups applied in place
  * (parser.py:127-163). Returns NULL when no format matches (S7 error
  * channel feed).
  *
  * This shape matters for codegen: building the same dispatch from
  * per-format struct Columns + `coalesce` duplicates the (large)
  * expression tree once per projected field and blows the generated
  * `processNext()` past Janino's 64 KB method limit; a single expression
  * is one call site, stays inside whole-stage codegen, and preserves the
  * reference's early-exit cost model.
  */
case class ParseLogLine(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ParseLogLine.schema
  override def nullable: Boolean = true
  override def prettyName: String = "parse_log_line"

  override def nullSafeEval(input: Any): Any =
    ParseLogLine.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |${ev.value} = graft.sources.ParseLogLine.parse($input);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParseLogLine {

  val fieldNames: Seq[String] = Seq(
    "ip", "timestamp", "method", "request_uri", "status", "resp_size",
    "referrer", "user_agent", "extra", "time_taken", "format")

  val schema: StructType = StructType(Seq(
    StructField("ip", StringType),
    StructField("timestamp", StringType),
    StructField("method", StringType),
    StructField("request_uri", StringType),
    StructField("status", IntegerType),
    StructField("resp_size", LongType),
    StructField("referrer", StringType),
    StructField("user_agent", StringType),
    StructField("extra", StringType),
    StructField("time_taken", StringType),
    StructField("format", StringType)))

  private val compiled: Array[(String, Pattern, Array[String])] =
    LineParser.formats.map { case (name, pattern, groups) =>
      (name, Pattern.compile(pattern), groups.toArray)
    }.toArray

  private def isDigits(s: String): Boolean =
    s != null && s.nonEmpty && s.forall(_.isDigit)

  /** Match + fixups (parser.py:142-153): user_agent/referrer missing or
    * empty -> "-", status/resp_size digits-or-0, method missing/empty ->
    * "INVALID".
    */
  def parse(line: UTF8String): InternalRow = {
    val s = line.toString
    var fi = 0
    while (fi < compiled.length) {
      val (name, pattern, groups) = compiled(fi)
      val m = pattern.matcher(s)
      if (m.lookingAt()) {
        var ip: String = null; var timestamp: String = null
        var method: String = null; var uri: String = null
        var status: String = null; var respSize: String = null
        var referrer: String = null; var userAgent: String = null
        var extra: String = null; var timeTaken: String = null
        var gi = 0
        while (gi < groups.length) {
          val v = m.group(gi + 1)
          groups(gi) match {
            case "ip" => ip = v
            case "timestamp" => timestamp = v
            case "method" => method = v
            case "request_uri" => uri = v
            case "status" => status = v
            case "resp_size" => respSize = v
            case "referrer" => referrer = v
            case "user_agent" => userAgent = v
            case "extra" => extra = v
            case "time_taken" => timeTaken = v
          }
          gi += 1
        }
        def u(x: String): UTF8String = if (x == null) null else UTF8String.fromString(x)
        def orDash(x: String): UTF8String =
          if (x == null || x.isEmpty) UTF8String.fromString("-") else UTF8String.fromString(x)
        return new GenericInternalRow(Array[Any](
          u(ip),
          u(timestamp),
          if (method == null || method.isEmpty) UTF8String.fromString("INVALID") else u(method),
          u(uri),
          if (isDigits(status)) status.toInt else 0,
          if (isDigits(respSize)) respSize.toLong else 0L,
          orDash(referrer),
          orDash(userAgent),
          u(extra),
          u(timeTaken),
          UTF8String.fromString(name)))
      }
      fi += 1
    }
    null
  }

  def parse_log_line(line: Column): Column =
    GraftInterop.column(ParseLogLine(GraftInterop.expression(line)))
}
