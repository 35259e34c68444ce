package graft.vector

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot_product(a, b)` as one tight-loop expression.
  *
  * The Column-combinator formulation
  * (`aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)`) materializes a
  * zipped intermediate array per pair — fine for top-k over a few
  * thousand candidate pairs, ruinous for the pairwise near-dup shapes
  * (millions of pairs). This expression accumulates in index order with
  * double precision, so its result is bit-identical to the combinator
  * version (and to DuckDB's `list_dot_product`, which the q27 oracle
  * already pinned).
  *
  * Length mismatch yields null — the same poisoning `zip_with`'s
  * null-padding + `acc + null` produced.
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  @transient private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh local name: two dot_products in one codegen scope would
      // otherwise redeclare the same variable (Janino error -> silent
      // interpreted fallback)
      val dp = ctx.freshName("dp")
      s"""
         |Double $dp = graft.vector.DotProductExpr.dot($a, $b, $leftFloat, $rightFloat);
         |${ev.isNull} = $dp == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : $dp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Boxed so codegen can express the null (length-mismatch) case.
    *
    * Named `dot`, NOT `eval`: the companion class inherits
    * `eval(InternalRow)` from Expression, and a same-name object method
    * suppresses the Java static forwarder — generated code then fails to
    * compile ("no applicable method") and the whole stage silently falls
    * back to interpreted eval.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def dot_product(a: Column, b: Column): Column =
    GraftInterop.column(DotProductExpr(
      GraftInterop.expression(a), GraftInterop.expression(b)))
}
