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

/** Count-min sketch (Cormode & Muthukrishnan 2005) — point frequency
  * estimates over an unbounded key domain in ONE pass with FIXED
  * memory: the [[HeavyHitters]] family's companion (Misra-Gries
  * answers "which keys are frequent", count-min answers "how frequent
  * is THIS key" for any key, with one-sided error: est >= true count,
  * est <= true count + excess bounded by n/width per row with high
  * probability across the depth rows).
  *
  * 100 TB shape: the aggregation shuffles exactly `depth*width` longs
  * per (task, group) — like [[DistinctSketch]], a fixed-size summary
  * instead of one row per distinct key; partials merge by elementwise
  * add (the counters are linear), so the sketch is independent of
  * partitioning and merge order.
  *
  * Engine-agnostic by the repo's md5 discipline: depth row d's bucket
  * is hex digits `[8d, 8d+8)` of ONE `md5(value)` (an unsigned 32-bit
  * slice) mod width — any engine with md5 (the DuckDB oracle, a
  * Python consumer) rebuilds the exact same sketch and estimates from
  * raw data, so the ESTIMATOR is oracle-checkable, not just a lucky
  * exact regime; and a row costs one digest regardless of depth.
  */
object CountMin {

  /** The bucket of `value` in depth row `d`: bytes `4d..4d+3` of ONE
    * md5 of the value, as an unsigned 32-bit integer mod width — the
    * 128 md5 bits slice into four independent-enough row hashes, so a
    * row costs ONE digest regardless of depth (the naive
    * per-depth-salted form pays depth digests per row — measured 4x
    * on the update path). MUST stay in lockstep with [[bucket_col]]
    * and the DuckDB twin
    * `('0x' || substr(md5(v), 1 + 8*d, 8))::BIGINT % width`.
    */
  def bucket(d: Int, value: UTF8String, width: Int): Int = {
    val md = tlMd5.get()
    md.reset()
    bucketOfDigest(md.digest(value.getBytes), d, width)
  }

  private def bucketOfDigest(dig: Array[Byte], d: Int, width: Int): Int = {
    var h = 0L
    var i = 4 * d
    val end = i + 4
    while (i < end) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    (h % width).toInt
  }

  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column twin of [[bucket]] for the probe side (`d` is a plan-time
    * constant — positions fold into the substring literal).
    */
  def bucket_col(d: Int, value: Column, width: Int): Column =
    pmod(conv(substring(md5(value.cast("string")), 1 + 8 * d, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Aggregate Column: the `depth*width` counter array (row-major:
    * counter(d, b) at index d*width + b).
    */
  def cms(value: Column, depth: Int, width: Int): Column =
    GraftInterop.column(
      CmsAgg(GraftInterop.expression(value), depth, width).toAggregateExpression())

  /** Point estimate from a sketch column: min over depth rows of the
    * probed counter — pure Column arithmetic (the sketch frame is one
    * row per group; broadcast it against the probe frame).
    */
  def estimate(sketch: Column, probe: Column, depth: Int, width: Int): Column =
    (0 until depth)
      .map(d => element_at(sketch,
        (lit(d * width) + bucket_col(d, probe, width) + 1).cast("int")))
      .reduceLeft((a, b) => least(a, b))

  /** The q-series convenience: build ONE sketch over `value`, estimate
    * each distinct probe — `(probeCol, est)` rows. The sketch frame is
    * a single row; the explicit broadcast is bounded by construction
    * (depth*width longs).
    */
  def estimateProbes(
      df: DataFrame, value: Column, probes: DataFrame, probeCol: String,
      depth: Int, width: Int): DataFrame = {
    val sk = df.agg(cms(value, depth, width).as("_sk"))
    probes.select(col(probeCol)).distinct()
      .crossJoin(broadcast(sk))
      .select(col(probeCol),
        estimate(col("_sk"), col(probeCol), depth, width).as("est"))
  }

  case class CmsAgg(
      child: Expression, depth: Int, width: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {

    require(depth >= 1 && depth <= 4,
      s"cms: depth must be in [1,4] (md5 yields four 32-bit slices), got $depth")
    require(width >= 2 && width <= (1 << 30),
      s"cms: width must be in [2, 2^30], got $width")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "cms"

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val md = tlMd5.get()
        md.reset()
        val dig = md.digest(v.asInstanceOf[UTF8String].getBytes)
        var d = 0
        while (d < depth) {
          buf(d * width + bucketOfDigest(dig, d, width)) += 1L
          d += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
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
      val buf = new Array[Long](depth * width)
      var i = 0
      while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }
}
