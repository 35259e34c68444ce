package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-group regex extraction.
  *
  * `RegexpGroups(line, pattern)` anchors the pattern at the start of the
  * input (Python `re.match` semantics — the reference dispatch loop at
  * parser.py:139 uses `re.match`) and returns `array<string>` of all
  * capture groups (null elements for unmatched optional groups), or NULL
  * when the pattern does not match at all.
  *
  * Spark's builtin `regexp_extract` re-executes the regex once per group;
  * a log format with 8 capture groups would pay 8 full matches per line
  * plus one for the `rlike` dispatch test. This expression pays exactly
  * one, and stays inside whole-stage codegen via a static helper call.
  */
case class RegexpGroups(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_groups"

  override def nullSafeEval(input: Any): Any =
    RegexpGroups.extract(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef =
      ctx.addReferenceObj("graftPattern", compiled, classOf[Pattern].getName)
    val cls = RegexpGroups.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |${ev.value} = $cls.extract($input, $patternRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexpGroups {

  /** Java-side worker shared by interpreted eval and generated code. */
  def extract(input: UTF8String, pattern: Pattern): ArrayData = {
    val m: Matcher = pattern.matcher(input.toString)
    if (!m.lookingAt()) return null
    val n = m.groupCount()
    val out = new Array[Any](n)
    var i = 1
    while (i <= n) {
      val g = m.group(i)
      out(i - 1) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: extract all capture groups of `pattern` in one pass. */
  def regexp_groups(line: Column, pattern: String): Column =
    GraftInterop.column(RegexpGroups(GraftInterop.expression(line), pattern))
}
