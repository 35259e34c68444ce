package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items ("heavy hitters") via a Misra-Gries summary — the
  * mergeable-summaries formulation (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012): what are
  * the most frequent tokens / domains / languages in a corpus, in ONE
  * pass, with FIXED memory per task?
  *
  * 100 TB shape — why not `groupBy(term).count.orderBy.limit`: the
  * exact form shuffles one row per DISTINCT term (billions for web
  * text). The MG aggregate keeps a capacity-bounded summary per
  * partition and merges summaries pairwise: partial aggregation sends
  * `capacity` rows per task over the wire, the whole job is one
  * narrow scan + one tiny exchange, at the price of a bounded
  * undercount. Guarantees:
  *
  *  - every estimate is an UNDERCOUNT within `n / (capacity + 1)` of
  *    the true frequency (n = total items), regardless of merge order
  *    or partitioning;
  *  - any item with true frequency > n / (capacity + 1) is PRESENT in
  *    the summary (the classic heavy-hitter guarantee);
  *  - when the dataset's distinct-item count never exceeds the
  *    capacity, no decrement ever fires anywhere, so every estimate
  *    is EXACT — which is what makes the operator oracle-checkable
  *    at test scale (HeavyHittersSpec pins both regimes).
  *
  * Evaluates to `array<struct<term string, est long>>` sorted by
  * (est desc, term asc) — deterministic for a deterministic input
  * multiset, independent of partition count.
  */
object HeavyHitters {

  /** Aggregate Column: Misra-Gries summary of `term` with `capacity`
    * tracked items.
    */
  def mg_summary(term: Column, capacity: Int): Column =
    GraftInterop.column(
      MisraGriesAgg(GraftInterop.expression(term), capacity)
        .toAggregateExpression())

  /** Top-k heavy hitters as rows (rank, term, est) from a doc/term
    * frame — the convenience wrapper q80 drives.
    */
  def topK(terms: org.apache.spark.sql.DataFrame, termCol: String,
      capacity: Int, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    terms
      .agg(mg_summary(col(termCol), capacity).as("_s"))
      .select(posexplode(slice(col("_s"), 1, k)).as(Seq("_i", "_e")))
      .select((col("_i") + 1).cast("long").as("rank"),
        col("_e.term").as("term"), col("_e.est").as("est"))
  }

  case class MisraGriesAgg(
      child: Expression, capacity: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

    require(capacity >= 1, s"mg_summary: capacity must be >= 1, got $capacity")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "mg_summary"

    override def createAggregationBuffer(): java.util.HashMap[String, Long] =
      new java.util.HashMap[String, Long]()

    override def update(
        buf: java.util.HashMap[String, Long],
        input: InternalRow): java.util.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val term = v.asInstanceOf[UTF8String].toString
        val cur = buf.get(term)
        if (cur != 0L || buf.containsKey(term)) buf.put(term, cur + 1L)
        else if (buf.size < capacity) buf.put(term, 1L)
        else {
          // classic MG step: a new item with the summary full
          // decrements EVERY counter; zeros free their slots
          val it = buf.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue <= 1L) it.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      buf
    }

    override def merge(
        buf: java.util.HashMap[String, Long],
        other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
      val oit = other.entrySet().iterator()
      while (oit.hasNext) {
        val e = oit.next()
        val cur = buf.get(e.getKey) // Scala unboxes a missing key to 0L
        buf.put(e.getKey, cur + e.getValue)
      }
      if (buf.size > capacity) {
        // Agarwal et al.: subtract the (capacity+1)-th largest count
        // from everything; at most `capacity` survivors remain
        val counts = new Array[Long](buf.size)
        var i = 0
        val vit = buf.values().iterator()
        while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val d = counts(counts.length - capacity - 1)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= d) it.remove()
          else e.setValue(e.getValue - d)
        }
      }
      buf
    }

    override def eval(buf: java.util.HashMap[String, Long]): Any = {
      val entries = new Array[(String, Long)](buf.size)
      var i = 0
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        entries(i) = (e.getKey, e.getValue)
        i += 1
      }
      scala.util.Sorting.stableSort(entries,
        (a: (String, Long), b: (String, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      new GenericArrayData(entries.map { case (t, n) =>
        InternalRow(UTF8String.fromString(t), n)
      }.asInstanceOf[Array[Any]])
    }

    override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeUTF(e.getKey)
        out.writeLong(e.getValue)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val m = new java.util.HashMap[String, Long](n * 2)
      var i = 0
      while (i < n) {
        val t = in.readUTF()
        val c = in.readLong()
        m.put(t, c)
        i += 1
      }
      m
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }
}
