package graft.textops

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE Catalyst expression: hash each shingle once
  * (FNV-1a 64 folded to 31 bits) and update all k permutation minima in
  * a tight loop.
  *
  * The Column-combinator formulation
  * (`transform(0..k, i -> array_min(transform(shingles, s -> perm_i(xxhash64(s)))))`)
  * re-hashes every shingle k times and allocates k intermediate arrays
  * per row — at sf0.1 (10k docs × ~300 shingles × k=32) that alone was
  * ~100 s; this expression does one pass.
  */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.eval(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"""
         |${ev.value} = graft.textops.MinHashSig.eval($input, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  val P = 2147483647L // 2^31 - 1

  /** Same permutation family as the Column version kept in NearDup's
    * scaladoc: perm_i(h) = ((2i+1)·h + 17i + 7) mod P over h = fnv mod P.
    */
  def eval(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var si = 0
    while (si < n) {
      if (!shingles.isNullAt(si)) {
        val h = {
          val raw = SimHash.fnv1a64(shingles.getUTF8String(si)) % P
          if (raw < 0) raw + P else raw
        }
        var i = 0
        while (i < k) {
          val v = ((2L * i + 1L) * h + 17L * i + 7L) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      si += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  def minhash_sig(shingles: Column, k: Int): Column =
    GraftInterop.column(MinHashSigExpr(GraftInterop.expression(shingles), k))
}
