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
  * Engine-agnostic by the repo's md5 discipline: row r increments
  * bucket `md5("d:" || value)[0..15 hex] % width` in each depth row d
  * — any engine with md5 (the DuckDB oracle, a Python consumer)
  * rebuilds the exact same sketch and estimates from raw data, so the
  * ESTIMATOR is oracle-checkable, not just a lucky exact regime.
  */
object CountMin {

  /** The bucket of `value` in depth row `d` — Scala side (aggregate
    * update). MUST stay in lockstep with [[bucket_col]] and the DuckDB
    * twin `('0x' || substr(md5(d || ':' || v), 1, 15))::BIGINT % width`.
    */
  def bucket(d: Int, value: UTF8String, width: Int): Int = {
    val md = tlMd5.get()
    md.reset()
    md.update(String.valueOf(d).getBytes("UTF-8"))
    md.update(':'.toByte)
    md.update(value.getBytes)
    val hex = md.digest()
    // first 15 hex digits = high 60 bits of the first 8 bytes, minus
    // the low nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (hex(i) & 0xffL); i += 1 }
    (((h >>> 4) % width).toInt)
  }

  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column twin of [[bucket]] for the probe side. */
  def bucket_col(d: Column, value: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(d.cast("string"), lit(":"),
      value.cast("string"))), 1, 15), 16, 10).cast("long"), lit(width.toLong))

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
    array_min(transform(sequence(lit(0), lit(depth - 1)),
      d => element_at(sketch, (d * width + bucket_col(d, probe, width) + 1).cast("int"))))

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

    require(depth >= 1 && depth <= 16, s"cms: depth must be in [1,16], got $depth")
    require(width >= 2, s"cms: width must be >= 2, got $width")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "cms"

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val u = v.asInstanceOf[UTF8String]
        var d = 0
        while (d < depth) {
          buf(d * width + bucket(d, u, width)) += 1L
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
