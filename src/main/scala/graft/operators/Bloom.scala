package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter (Bloom 1970) — one-pass approximate MEMBERSHIP over an
  * unbounded key domain with FIXED memory: the sketch family's third
  * question. [[HeavyHitters]] answers "which keys are frequent",
  * [[CountMin]] "how frequent is THIS key", [[DistinctSketch]] "how
  * many distinct keys"; Bloom answers "was THIS key present at all",
  * with one-sided error — `might_contain` is NEVER false for an
  * inserted key, and false positives are bounded by the standard
  * (1 - e^{-kn/m})^k load curve. The corpus-scale use is the
  * membership PREFILTER: before an expensive anti-join against a huge
  * seen-set (decontamination, incremental-crawl "have we fetched this
  * URL"), probe a broadcast Bloom of the seen-set — definite-negatives
  * (the overwhelming majority at low load) skip the join entirely.
  *
  * 100 TB shape: the aggregation shuffles exactly `m/64` longs per
  * (task, group) — a fixed-size summary like the other three; partials
  * merge by elementwise OR (set-bits are idempotent), so the sketch is
  * independent of partitioning, merge order, AND duplication — the
  * only sketch here where re-inserting a row is a true no-op.
  *
  * Engine-agnostic by the repo's md5 discipline, via Kirsch &
  * Mitzenmacher (2006) double hashing: `h1` = hex digits [1,8] and
  * `h2` = hex digits [9,16] of ONE `md5(value)` (two unsigned 32-bit
  * slices), `h2' = h2 - h2%2 + 1` (forced odd with pure arithmetic —
  * no bitwise ops, so any SQL engine writes it the same way), and bit
  * `i` of `k` is `(h1 + i*h2') mod m`. An odd stride is coprime to the
  * power-of-two `m`, so the k probes never collapse onto one bit; the
  * DuckDB oracle rebuilds the exact SET-BIT SET from raw data and
  * answers every probe — the ESTIMATOR is oracle-checked, false
  * positives included, not just a lucky exact regime.
  */
object Bloom {

  /** Bit `i` of `value`: `(h1 + i*h2') mod m` on the md5 slices.
    * MUST stay in lockstep with [[bitCols]] and the DuckDB twin
    * `(h1 + i*(h2 - h2%2 + 1)) % m`.
    */
  def bit(i: Int, value: UTF8String, m: Int): Int = {
    val md = tlMd5.get()
    md.reset()
    bitOfDigest(md.digest(value.getBytes), i, m)
  }

  private def bitOfDigest(dig: Array[Byte], i: Int, m: Int): Int = {
    val h1 = slice32(dig, 0)
    val h2 = slice32(dig, 4)
    val h2p = h2 - h2 % 2 + 1
    ((h1 + i.toLong * h2p) % m).toInt
  }

  /** Bytes [off, off+4) as an unsigned 32-bit value. */
  private def slice32(dig: Array[Byte], off: Int): Long = {
    var h = 0L
    var j = off
    while (j < off + 4) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
    h
  }

  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column twins of the k bit positions of `value` (k is a plan-time
    * constant; the md5 substring positions fold into literals).
    */
  def bitCols(value: Column, m: Int, k: Int): Seq[Column] = {
    val d = md5(value.cast("string"))
    val h1 = conv(substring(d, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(d, 9, 8), 16, 10).cast("long")
    val h2p = h2 - pmod(h2, lit(2L)) + lit(1L)
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2p, lit(m.toLong)))
  }

  /** Aggregate Column: the packed bitset — `m/64` longs (bit `b` is
    * bit `b%64` of word `b/64`).
    */
  def bloom(value: Column, m: Int, k: Int): Column =
    GraftInterop.column(
      BloomAgg(GraftInterop.expression(value), m, k).toAggregateExpression())

  /** Membership probe against a sketch column — pure Column arithmetic
    * (AND over the k probed bits; `shiftright` keeps it codegen'd —
    * an arithmetic shift of a negative word still leaves the probed
    * bit in position 0, so `& 1` is exact).
    */
  def mightContain(sketch: Column, probe: Column, m: Int, k: Int): Column =
    bitCols(probe, m, k).map { b =>
      val word = element_at(sketch,
        ((b - pmod(b, lit(64L))) / lit(64L) + lit(1)).cast("int"))
      call_function("shiftright", word, pmod(b, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduceLeft(_ && _)

  /** The q-series convenience: build ONE sketch over `value`, answer
    * each distinct probe — `(probeCol, might_contain)` rows. The
    * sketch frame is a single row; the explicit broadcast is bounded
    * by construction (m/64 longs).
    */
  def mightContainProbes(
      df: DataFrame, value: Column, probes: DataFrame, probeCol: String,
      m: Int, k: Int): DataFrame = {
    val sk = df.agg(bloom(value, m, k).as("_sk"))
    probes.select(col(probeCol)).distinct()
      .crossJoin(broadcast(sk))
      .select(col(probeCol),
        mightContain(col("_sk"), col(probeCol), m, k).as("might_contain"))
  }

  case class BloomAgg(
      child: Expression, m: Int, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {

    require(m >= 64 && m <= (1 << 27) && m % 64 == 0,
      s"bloom: m must be a multiple of 64 in [64, 2^27], got $m")
    require(k >= 1 && k <= 16, s"bloom: k must be in [1,16], got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bloom"

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](m / 64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val md = tlMd5.get()
        md.reset()
        val dig = md.digest(v.asInstanceOf[UTF8String].getBytes)
        var i = 0
        while (i < k) {
          val b = bitOfDigest(dig, i, m)
          buf(b >>> 6) |= 1L << (b & 63)
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any =
      new GenericArrayData(buf.map(_.asInstanceOf[Any]))

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(buf.length * 8)
      val out = new DataOutputStream(bos)
      var i = 0
      while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = new Array[Long](m / 64)
      var i = 0
      while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }
}
