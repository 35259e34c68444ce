package graft.vector

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, FloatType, LongType}

/** Random-hyperplane sign signature as one Catalyst expression: for up
  * to 64 planes, bit i of the result is the sign of `v · plane_i`. The
  * plane matrix rides along as a reference object (broadcast with the
  * serialized plan), and evaluation is a flat double loop — no
  * per-plane Column folds, no giant literal arrays in codegen.
  */
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.length <= 64, "at most 64 sign bits fit a long")

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.eval(input.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.vector.HyperplaneSig.eval($input, $ref, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {

  /** Works for array<float> and array<double> inputs. */
  def eval(v: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    val n = v.numElements()
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i))
        vec(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var acc = 0.0
      var j = 0
      val m = math.min(n, plane.length)
      while (j < m) { acc += vec(j) * plane(j); j += 1 }
      if (acc >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  def signature(v: Column, planes: Array[Array[Double]]): Column =
    GraftInterop.column(HyperplaneSigExpr(GraftInterop.expression(v), planes))
}
