package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007), the
  * register-merge companion of [[DistinctSketch]]'s KMV bottom-k:
  * KMV keeps k minima (exact below k, ~1/sqrt(k) error above), HLL
  * keeps `m` 6-bit registers — constant 64·`m`-bit state per group
  * whose MERGE is a pointwise max, the property that makes it the
  * standard sketch for pre-aggregated rollup cubes (per-day sketches
  * max-merge into per-month cardinalities without re-reading data).
  *
  * Register discipline over the family's engine-agnostic
  * [[DistinctSketch.hash60]] (md5-derived 60-bit): register = `h mod
  * 64` (6 bits), remainder r = `h div 64` (54 bits), rank rho(r) =
  * leading zeros of r in its 54-bit lane + 1 (r = 0 → 55). The
  * estimator is the raw HLL formula with alpha_64 = 0.709 (the
  * paper's constant for m = 64), evaluated in INTEGER arithmetic so
  * DuckDB recomputes it bit-for-bit: with T = Σ_j 2^(55 − M_j)
  * (empty registers contribute 2^55, M_j = 0),
  *
  *   est_x1000 = (709·4096 · 2^55) DIV T     — alpha·m²·1000 · 2^55
  *
  * T ≤ 64·2^55 = 2^61 fits a signed 64-bit lane; the numerator
  * (~1.05e23) runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the
  * [[DistinctSketch.overlapByKey]] wide-integer discipline. No
  * small-range linear-counting correction (it needs a float ln):
  * below ~2.5·m distinct values prefer KMV, which is EXACT there —
  * the two sketches are complements, not substitutes.
  *
  * 100 TB shape: one narrow hash pass, then ONE hash aggregation on
  * (group, register) with map-side partial max — ≤ 64 rows per
  * (task, group) shuffle, the same bound as KMV's k longs — and a
  * second already-tiny 64→1 reduce per group. No distinct, no
  * windows, nothing skews: a hot register still reduces per-task.
  */
object Hll {

  /** Registers (m). Fixed — alpha below is m-specific. */
  val m: Int = 64

  /** Bits in the post-register remainder lane: 60 − log2(m). */
  val restBits: Int = 54

  /** alpha_64 · m² · 1000 = 0.709 · 4096 · 1000, exact. */
  val alphaM2x1000: Long = 709L * 4096L

  /** The estimator's integer numerator, alpha_64·m²·1000 · 2^55 —
    * shared verbatim with the DuckDB oracle literal.
    */
  val estNumerator: String = (BigInt(alphaM2x1000) << (restBits + 1)).toString

  /** Per-group register table: (groupCols..., _hll_reg, _hll_m,
    * _hll_c) — one row per hit register with its max rank and element
    * count. The MERGEABLE intermediate: registers of a coarser group
    * are the pointwise `max(_hll_m)` (and `sum(_hll_c)`) over its
    * fine groups — the rollup-cube path [[estimateFromRegisters]]
    * turns back into estimates (q154 gates it against the direct
    * computation through the oracle).
    */
  def registersByKey(
      df: DataFrame, groupCols: Seq[Column], value: Column): DataFrame = {
    val keyNames = df.select(groupCols: _*).columns.toSeq
    val base = df.select((groupCols :+
      DistinctSketch.hash60(value).as("_hll_h")): _*)
    base
      .withColumn("_hll_reg", pmod(col("_hll_h"), lit(m.toLong)))
      .withColumn("_hll_rest", expr(s"_hll_h DIV $m"))
      .withColumn("_hll_rho",
        when(col("_hll_rest") === 0L, lit(restBits + 1L))
          .otherwise(lit(restBits + 1L) - length(bin(col("_hll_rest"))).cast("long")))
      .groupBy((keyNames.map(col) :+ col("_hll_reg")): _*)
      .agg(max(col("_hll_rho")).as("_hll_m"), count(lit(1)).as("_hll_c"))
  }

  /** The estimator over a register table keyed by `keyNames` —
    * shared by [[estimateByKey]] (fresh registers) and the rollup
    * path (max-merged registers), so the two cannot drift.
    */
  def estimateFromRegisters(regs: DataFrame, keyNames: Seq[String]): DataFrame =
    regs
      .groupBy(keyNames.map(col): _*)
      .agg(
        sum(col("_hll_c")).as("n_values"),
        count(lit(1)).as("n_regs_hit"),
        max(col("_hll_m")).as("max_rho"),
        sum(expr(s"shiftleft(1L, CAST(${restBits + 1} - _hll_m AS INT))"))
          .as("_hll_t_hit"))
      .withColumn("_hll_t",
        col("_hll_t_hit") +
          (lit(m.toLong) - col("n_regs_hit")) * lit(1L << (restBits + 1)))
      .withColumn("est_x1000", expr(
        s"CAST(CAST('$estNumerator' AS DECIMAL(38,0))" +
          " DIV CAST(_hll_t AS DECIMAL(38,0)) AS BIGINT)"))
      .select((keyNames.map(col) ++ Seq(col("n_values"), col("n_regs_hit"),
        col("max_rho"), col("est_x1000"))): _*)

  /** Per-group HLL distinct estimate:
    * (groupCols..., n_values, n_regs_hit, max_rho, est_x1000).
    * `n_regs_hit` (registers with ≥ 1 element) and `max_rho` ride
    * along as sketch-health diagnostics — and make the oracle check
    * the register table itself, not just the final quotient.
    */
  def estimateByKey(
      df: DataFrame, groupCols: Seq[Column], value: Column): DataFrame = {
    val keyNames = df.select(groupCols: _*).columns.toSeq
    estimateFromRegisters(registersByKey(df, groupCols, value), keyNames)
  }

  /** Register rank of one hash60 value: (register index, rho). */
  private[operators] def rankOf(h: Long): (Int, Int) = {
    require(h >= 0 && h < DistinctSketch.HashDomain,
      s"hll: hash $h outside [0, 2^60) — feed hash60() values")
    val reg = (h % m).toInt
    val rest = h / m
    val rho =
      if (rest == 0) restBits + 1
      else restBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    (reg, rho)
  }

  /** The estimator over a full register array (0 = empty register) —
    * shared by [[estimateByKey]]'s semantics doc, [[HllAgg.eval]] and
    * HllSpec's reference recomputation.
    */
  private[operators] def estimateOf(regs: Array[Byte]): Long = {
    var t = BigInt(0)
    var i = 0
    while (i < regs.length) {
      t += BigInt(1) << (restBits + 1 - regs(i))
      i += 1
    }
    (BigInt(estNumerator) / t).toLong
  }

  /** Aggregate Column form of the sketch — the MERGEABLE shape rollup
    * cubes and streaming aggregations consume (per-day registers
    * max-merge into per-month cardinalities; a streaming aggregation
    * carries the 64-byte buffer in the state store between
    * micro-batches). Evaluates to the [[estimateByKey]] columns
    * (n_regs_hit, max_rho, est_x1000) — HllSpec pins the two forms
    * equal on every prefix/partitioning, which is exactly the
    * mergeability contract.
    */
  def hll(hash: Column): Column =
    GraftInterop.column(
      HllAgg(GraftInterop.expression(hash)).toAggregateExpression())

  case class HllAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = StructType(Seq(
      StructField("n_regs_hit", LongType, nullable = false),
      StructField("max_rho", LongType, nullable = false),
      StructField("est_x1000", LongType, nullable = false)))
    override def prettyName: String = "hll"

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val (reg, rho) = rankOf(v.asInstanceOf[Long])
        if (rho > buf(reg)) buf(reg) = rho.toByte
      }
      buf
    }

    override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) {
        if (other(i) > buf(i)) buf(i) = other(i)
        i += 1
      }
      buf
    }

    override def eval(buf: Array[Byte]): Any = {
      var hit = 0L
      var maxR = 0L
      var i = 0
      while (i < m) {
        if (buf(i) > 0) hit += 1
        if (buf(i) > maxR) maxR = buf(i).toLong
        i += 1
      }
      new GenericInternalRow(Array[Any](hit, maxR, estimateOf(buf)))
    }

    // defensive copies: the byte array crosses the row-buffer boundary
    // in both directions and UnsafeRow regions are reused
    override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

    override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }
}
