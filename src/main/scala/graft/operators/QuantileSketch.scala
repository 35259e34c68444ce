package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable streaming quantiles with bounded per-group state — the
  * sketch-family member ([[HeavyHitters]]/[[DistinctSketch]]/
  * [[CountMin]]/[[Bloom]]) that answers "p99 doc length so far"
  * without a full sort (exact `percentile` is sort-based: it cannot
  * stream and cannot pre-aggregate).
  *
  * Design: a coordinated bottom-k VALUE-COUNT sketch (the bottom-k
  * sampling of Cohen & Kaplan 2007 applied to the distinct-value
  * histogram), NOT KLL/GK. Reason, and it is the family's load-bearing
  * discipline: KLL's compactions and GK's merges depend on stream and
  * merge ORDER, so their outputs are irreproducible outside the engine
  * — only their error bound could be checked. This sketch is a pure
  * function of the input MULTISET: keep the k smallest (hash(value),
  * value) pairs with EXACT occurrence counts. Merge = union + re-trim.
  * A pair in the global bottom-k has fewer than k smaller pairs in ANY
  * partial, so no partial ever evicts it and its count is never
  * clipped — bit-identical results under every partitioning and merge
  * tree, which DuckDB recomputes exactly in BOTH regimes (`ORDER BY
  * hash, value LIMIT k` + a cumulative sum), not just the exact one.
  *
  * Regimes:
  *  - distinct values <= k: the sketch IS the value histogram —
  *    quantiles exact.
  *  - distinct values > k: quantiles of the SAMPLED mass (the counts
  *    of a uniform-by-hash distinct-value sample). Rank error decays
  *    as O(1/sqrt(k)) for bounded count skew (spec-pinned
  *    empirically); a single heavy value, once sampled, carries its
  *    exact count. The right tool for count-heavy metric domains (doc
  *    lengths, token counts, scores on a grid) — which is what corpus
  *    monitoring quantiles are; a near-unique heavy-skew domain wants
  *    the exact sort.
  *
  * Query: lower quantile over the retained histogram — smallest
  * retained value whose cumulative count reaches `q/10000` of the
  * retained mass, all integer arithmetic.
  */
object QuantileSketch {

  /** Engine-agnostic 60-bit sampling hash of the VALUE (not the row):
    * `md5('qsk:' || value)` first 15 hex digits — the
    * [[DistinctSketch.hash60]] discipline under a family-distinct
    * salt.
    */
  def valueHash(value: Column): Column =
    conv(substring(md5(concat(lit("qsk:"), value.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Aggregate Column: sketch of `value` (cast to long) with capacity
    * `k`. Evaluates to
    * `struct<n long, n_pairs long, values array<long>, counts array<long>>`
    * — `n` the exact total count, `n_pairs` the fill, arrays parallel
    * and sorted by value ascending.
    */
  def qsketch(value: Column, k: Int): Column =
    GraftInterop.column(QSketchAgg(
      GraftInterop.expression(value.cast("long")),
      GraftInterop.expression(valueHash(value.cast("long"))),
      k).toAggregateExpression())

  /** Lower quantile at `qx10000` in (0, 10000] from a [[qsketch]]
    * struct: smallest value with `cum * 10000 >= qx10000 * W` over the
    * retained histogram (W = retained mass). Pure HOF fold — exact
    * integer arithmetic, the DuckDB twin is a windowed cumulative sum.
    * Null on an empty sketch. (Bound: retained mass must stay below
    * 2^63/104 ~ 9e14 rows per group for the long multiply.)
    */
  def sketchQuantile(sk: Column, qx10000: Int): Column = {
    require(qx10000 > 0 && qx10000 <= 10000,
      s"sketchQuantile: qx10000 must be in (0, 10000], got $qx10000")
    val zipped = arrays_zip(
      sk.getField("values").as("v"), sk.getField("counts").as("c"))
    val w = aggregate(sk.getField("counts"), lit(0L), (a, x) => a + x)
    val folded = aggregate(zipped,
      struct(lit(0L).as("cum"), lit(false).as("found"), lit(0L).as("ans")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("c")
        val hit = !acc.getField("found") &&
          cum * 10000 >= lit(qx10000.toLong) * w
        struct(cum.as("cum"),
          (acc.getField("found") || hit).as("found"),
          when(hit, x.getField("v")).otherwise(acc.getField("ans")).as("ans"))
      },
      s => when(s.getField("found"), s.getField("ans")))
    when(sk.getField("n_pairs") > 0, folded)
  }

  /** Per-group quantile rows — the convenience wrapper the q-series
    * drives: (groupCols..., n, n_pairs, p50, p90, p99).
    */
  def quantilesByKey(
      df: DataFrame, groupCols: Seq[Column], value: Column,
      k: Int): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(qsketch(value, k).as("_qs"))
      .withColumn("n", col("_qs.n"))
      .withColumn("n_pairs", col("_qs.n_pairs"))
      .withColumn("p50", sketchQuantile(col("_qs"), 5000))
      .withColumn("p90", sketchQuantile(col("_qs"), 9000))
      .withColumn("p99", sketchQuantile(col("_qs"), 9900))
      .drop("_qs")

  /** Buffer: the k smallest (hash, value) pairs with exact counts,
    * plus the exact total row count. Pair order is (hash, value) — the
    * value tiebreak pins the astronomically-unlikely 60-bit collision
    * case deterministically on both engines.
    */
  final class QBuf extends Serializable {
    val pairs = new java.util.TreeMap[(Long, Long), Long](
      implicitly[Ordering[(Long, Long)]])
    var total: Long = 0L
  }

  case class QSketchAgg(
      value: Expression, hash: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QBuf] {

    require(k >= 2, s"qsketch: k must be >= 2, got $k")

    override def children: Seq[Expression] = Seq(value, hash)
    override def nullable: Boolean = false
    override def dataType: DataType = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("n_pairs", LongType, nullable = false),
      StructField("values", ArrayType(LongType, containsNull = false)),
      StructField("counts", ArrayType(LongType, containsNull = false))))
    override def prettyName: String = "qsketch"

    override def createAggregationBuffer(): QBuf = new QBuf

    private def add(buf: QBuf, h: Long, v: Long, c: Long): Unit = {
      val key = (h, v)
      // containsKey, NOT get-against-null: the value type parameter is
      // a primitive Long, so a missing key's null would silently unbox
      // to 0 and defeat the trim
      if (buf.pairs.containsKey(key)) {
        buf.pairs.put(key, buf.pairs.get(key) + c); ()
      } else if (buf.pairs.size < k) { buf.pairs.put(key, c); () }
      else if (implicitly[Ordering[(Long, Long)]]
          .lt(key, buf.pairs.lastKey())) {
        buf.pairs.put(key, c)
        buf.pairs.pollLastEntry()
        ()
      }
    }

    override def update(buf: QBuf, input: InternalRow): QBuf = {
      val v = value.eval(input)
      if (v != null) {
        val h = hash.eval(input).asInstanceOf[Long]
        buf.total += 1
        add(buf, h, v.asInstanceOf[Long], 1L)
      }
      buf
    }

    override def merge(buf: QBuf, other: QBuf): QBuf = {
      buf.total += other.total
      val it = other.pairs.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        add(buf, e.getKey._1, e.getKey._2, e.getValue)
      }
      buf
    }

    override def eval(buf: QBuf): Any = {
      // emit sorted by VALUE (quantile consumption order)
      val byValue = new java.util.TreeMap[Long, Long]()
      val it = buf.pairs.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val prev = if (byValue.containsKey(e.getKey._2))
          byValue.get(e.getKey._2).longValue() else 0L
        byValue.put(e.getKey._2, prev + e.getValue)
      }
      val vs = new Array[Any](byValue.size)
      val cs = new Array[Any](byValue.size)
      val it2 = byValue.entrySet().iterator()
      var i = 0
      while (it2.hasNext) {
        val e = it2.next()
        vs(i) = e.getKey.longValue(); cs(i) = e.getValue.longValue(); i += 1
      }
      new GenericInternalRow(Array[Any](
        buf.total, buf.pairs.size.toLong,
        new GenericArrayData(vs), new GenericArrayData(cs)))
    }

    override def serialize(buf: QBuf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(buf.total)
      out.writeInt(buf.pairs.size)
      val it = buf.pairs.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeLong(e.getKey._1); out.writeLong(e.getKey._2)
        out.writeLong(e.getValue)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): QBuf = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = new QBuf
      buf.total = in.readLong()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val h = in.readLong(); val v = in.readLong(); val c = in.readLong()
        buf.pairs.put((h, v), c)
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): QSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): QSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(value = newChildren(0), hash = newChildren(1))
  }
}
