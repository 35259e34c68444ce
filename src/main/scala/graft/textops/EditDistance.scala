package graft.textops

import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded edit-distance similarity join for SHORT strings (titles,
  * names, product labels) — the near-dup family member the
  * set/fingerprint operators can't cover: a single-character typo
  * changes every shingle that crosses it, so shingle-set buckets never
  * see "repost 17 summary" next to "report 17 summary"; edit distance
  * does.
  *
  * Candidate generation is the FastSS deletion-neighborhood scheme
  * (Bocek et al. 2007): each string emits itself plus every
  * single-deletion variant; two strings within Levenshtein distance 1
  * ALWAYS share a variant (substitution at i → both delete i;
  * insertion/deletion → the longer one's deletion IS the shorter
  * string), so the equi-join on variants is a COMPLETE candidate set —
  * a hash-bucket join, never all-pairs (the family's
  * bucketed-not-all-pairs discipline, with the standard bucket cap).
  * Signature count per string is length+1 — the operator is for short
  * strings by construction ([[MaxLen]] enforced).
  *
  * Verification is an exact BANDED Levenshtein expression
  * ([[bounded_levenshtein]]): classic Ukkonen band of width 2d+1 with
  * an early exit when a row's band minimum exceeds `maxD` — O(d·len)
  * per pair instead of O(len²), returning the exact distance when it
  * is <= maxD and maxD+1 otherwise. The q113 oracle recomputes BOTH
  * stages in DuckDB: the deletion variants via substr algebra and the
  * distances via its native `levenshtein`.
  *
  * Unicode note: distances count UTF-16 code units on the engine and
  * codepoints in DuckDB — identical on BMP text; the fixture (and the
  * intended domain: titles) is ASCII.
  */
object EditDistance {

  /** Join guard: deletion signatures are O(len) per string. */
  val MaxLen = 256

  /** Exact Levenshtein distance when <= maxD, else maxD+1. */
  def boundedLev(a: UTF8String, b: UTF8String, maxD: Int): Long = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    val inf = maxD + 1
    if (math.abs(n - m) > maxD) return inf.toLong
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= maxD) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - maxD)
      val hi = math.min(m, i + maxD)
      cur(0) = if (i <= maxD) i else inf
      if (lo > 1) cur(lo - 1) = inf
      var rowMin = cur(if (lo > 1) lo - 1 else 0)
      j = lo
      while (j <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        val del = if (j <= i + maxD - 1) prev(j) + 1 else inf // prev row, same col
        val ins = cur(j - 1) + 1
        val sub = prev(j - 1) + cost
        var v = math.min(math.min(del, ins), sub)
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return inf.toLong // band exhausted — early exit
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), inf).toLong
  }

  case class BoundedLevExpr(left: Expression, right: Expression, maxD: Int)
      extends BinaryExpression {
    require(maxD >= 0, s"bounded_levenshtein: maxD must be >= 0, got $maxD")
    override def dataType: DataType = LongType
    override def prettyName: String = "bounded_levenshtein"
    override def nullSafeEval(l: Any, r: Any): Any =
      boundedLev(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], maxD)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.textops.EditDistance.boundedLev($l, $r, $maxD);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column form: exact distance when <= maxD, else maxD+1. */
  def bounded_levenshtein(a: Column, b: Column, maxD: Int): Column =
    GraftInterop.column(BoundedLevExpr(
      GraftInterop.expression(a), GraftInterop.expression(b), maxD))

  /** The string plus its single-deletion variants
    * (`array<string>`, the FastSS d=1 neighborhood).
    */
  def deletionSigs(s: Column): Column =
    when(length(s) === 0, array(s)) // sequence(0,-1) would run DESCENDING
      .otherwise(concat(array(s),
        transform(sequence(lit(0), length(s) - 1),
          i => concat(s.substr(lit(1), i), s.substr(i + 2, length(s))))))

  /** Self-join: pairs of rows within Levenshtein distance 1, as
    * (id_a, id_b, dist) with id_a < id_b. Buckets larger than
    * `bucketCap` drop whole (the family's cap discipline — a
    * degenerate signature, e.g. every empty string, must not go
    * quadratic; at the default cap nothing organic drops).
    */
  def editSimilarityJoin(
      df: DataFrame, idCol: Column, strCol: Column,
      bucketCap: Int = 512): DataFrame = {
    val base = df.select(idCol.cast("long").as("_id"), strCol.as("_s"))
      .filter(length(col("_s")) <= MaxLen)
    val sigs = base
      .select(col("_id"), col("_s"), explode(deletionSigs(col("_s"))).as("_sig"))
      .distinct() // a string can generate the same variant twice (aa -> a)
    val capped = sigs
      .withColumn("_bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_sig"))))
      .filter(col("_bn") <= bucketCap)
      .drop("_bn")
    val a = capped.select(col("_id").as("id_a"), col("_s").as("_sa"),
      col("_sig"))
    val b = capped.select(col("_id").as("id_b"), col("_s").as("_sb"),
      col("_sig"))
    val dist = bounded_levenshtein(col("_sa"), col("_sb"), 1)
    a.join(b, Seq("_sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_sa"), col("_sb"))
      .distinct()
      .withColumn("dist", dist)
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
