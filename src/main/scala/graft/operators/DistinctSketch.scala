package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distinct-count estimation via a KMV (k-minimum-values) sketch —
  * Bar-Yossef et al. 2002; the mergeable-summaries formulation
  * (Agarwal et al., PODS 2012): how many distinct tokens / URLs /
  * fingerprints does a corpus (or each stratum) hold, in ONE pass,
  * with FIXED memory per task?
  *
  * 100 TB shape — why not `count_distinct`: the exact form shuffles
  * one row per distinct value (billions for web-scale vocabularies);
  * Spark's built-in `approx_count_distinct` (HLL++) fixes that but its
  * estimate is not recomputable outside Spark, so nothing independent
  * can check it. KMV keeps the k SMALLEST values of a uniform hash;
  * partials merge by unioning and re-trimming to k; the estimate is a
  * pure integer function of the k-th smallest hash that an independent
  * engine (the DuckDB oracle) recomputes EXACTLY — the estimator
  * itself is oracle-checked, not just a lucky exact regime.
  *
  * Contract: the input column is a hash in `[0, 2^60)` — use
  * [[hash60]] (md5-derived, the [[Sampling]] family's engine-agnostic
  * hash) so any md5 implementation reproduces it. With distinct hash
  * count `c`:
  *   - `c < k`: the sketch holds every distinct hash → report `c`
  *     (exact up to 60-bit hash collisions);
  *   - `c >= k`: report `floor((k-1) * 2^60 / h_k)` with `h_k` the
  *     k-th smallest distinct hash (the classic unbiased-ish KMV
  *     estimator; relative error ~ 1/sqrt(k-2)).
  * Both regimes are deterministic in the input SET — independent of
  * partitioning, merge order, and duplication — which is what makes
  * the estimate hash-matchable. Evaluates to
  * `struct<n_hashes long, est_distinct long>` (`n_hashes` =
  * `min(c, k)`, the sketch's fill).
  */
object DistinctSketch {

  /** 2^60 — the hash domain size `M` in the estimator. */
  val HashDomain: Long = 1L << 60

  /** Engine-agnostic 60-bit hash: the first 15 hex digits of
    * `md5(string form)` — reproducible anywhere md5 exists (DuckDB:
    * `('0x' || substr(md5(v), 1, 15))::BIGINT`). Same discipline as
    * [[Sampling]]'s md5 buckets; 60 bits keeps the value positive in
    * a signed 64-bit lane on every engine.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Aggregate Column: KMV sketch of `hash` (a [[hash60]]-style value)
    * with `k` minima.
    */
  def kmv(hash: Column, k: Int): Column =
    GraftInterop.column(
      KmvAgg(GraftInterop.expression(hash), k).toAggregateExpression())

  /** Per-group distinct estimate as rows — the convenience wrapper the
    * q-series drives: `df.groupBy(groupCols).agg(...)` with columns
    * (groupCols..., n_values, n_hashes, est_distinct).
    */
  def estimateByKey(
      df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      value: Column, k: Int): org.apache.spark.sql.DataFrame =
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_values"), kmv(hash60(value), k).as("_kmv"))
      .withColumn("n_hashes", col("_kmv.n_hashes"))
      .withColumn("est_distinct", col("_kmv.est_distinct"))
      .drop("_kmv")

  /** KMV estimate from the sorted distinct-minima set — shared by the
    * aggregate's eval and the spec's reference recomputation.
    */
  def estimate(sorted: java.util.TreeSet[java.lang.Long], k: Int): Long = {
    val c = sorted.size
    if (c < k) c.toLong
    else {
      val hk = math.max(sorted.last.longValue(), 1L) // 0 only at ~2^-60
      ((BigInt(k - 1) * BigInt(HashDomain)) / BigInt(hk)).toLong
    }
  }

  case class KmvAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

    require(k >= 2, s"kmv: k must be >= 2, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = StructType(Seq(
      StructField("n_hashes", LongType, nullable = false),
      StructField("est_distinct", LongType, nullable = false)))
    override def prettyName: String = "kmv"

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
      require(h >= 0 && h < HashDomain,
        s"kmv: hash $h outside [0, 2^60) — feed hash60() values")
      // only candidates below the current k-th minimum can matter;
      // the set dedups revisits of the same hash for free
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last.longValue()) {
        if (buf.add(h)) { buf.pollLast(); () }
      }
    }

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(
        buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = other.iterator()
      while (it.hasNext) add(buf, it.next().longValue())
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
      new GenericInternalRow(Array[Any](
        math.min(buf.size, k).toLong, estimate(buf, k)))

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) out.writeLong(it.next().longValue())
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val s = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { s.add(in.readLong()); i += 1 }
      s
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }
}
