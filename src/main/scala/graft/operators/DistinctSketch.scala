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

  /** Aggregate Column: the sketch's raw minima as a sorted
    * `array<long>` — the mergeable form set algebra needs.
    */
  def kmvMinima(hash: Column, k: Int): Column =
    GraftInterop.column(
      KmvSetAgg(GraftInterop.expression(hash), k).toAggregateExpression())

  /** Cross-stratum overlap estimation — "how much does source A's
    * vocabulary (or URL set, or fingerprint set) overlap source B's?"
    * — from per-stratum KMV sketches, in ONE pass over the data plus
    * pairwise arithmetic on the #groups-row sketch frame.
    *
    * The KMV union identity makes this exact over sketches: the k
    * smallest distinct hashes of `A UNION B` all lie in A's k minima
    * or B's k minima, so merging two sketches (distinct-union, trim to
    * k) IS the union's sketch — no second data pass. Estimates:
    *
    *   est_union     = KMV estimate of the merged sketch
    *   est_intersect = max(est_a + est_b - est_union, 0)   (incl-excl)
    *   jaccard_x10000 = est_intersect * 10000 DIV est_union
    *
    * All integer arithmetic (the DIV runs in decimal(38,0) — the
    * (k-1)*2^60 numerator overflows a signed 64-bit lane for k > 8),
    * so an independent engine recomputes every column exactly from the
    * raw values; when every side holds < k distinct hashes the whole
    * row degenerates to exact set algebra (up to 60-bit collisions).
    *
    * Scale shape: one hash-shuffle aggregation over the data (<= k
    * longs per (task, group) shuffled), then a pairwise join of the
    * #groups-row sketch frame against itself — quadratic in the GROUP
    * count (strata: languages, sources, crawls), never in the data.
    */
  def overlapByKey(
      df: org.apache.spark.sql.DataFrame, keyCol: Column,
      value: Column, k: Int): org.apache.spark.sql.DataFrame = {
    val sk = df.groupBy(keyCol.as("key"))
      .agg(kmvMinima(hash60(value), k).as("_mins"))
    val a = sk.select(col("key").as("key_a"), col("_mins").as("_ma"))
    val b = sk.select(col("key").as("key_b"), col("_mins").as("_mb"))
    def est(arr: String): Column =
      when(size(col(arr)) < k, size(col(arr)).cast("long"))
        .otherwise(expr(
          s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * CAST($HashDomain AS DECIMAL(38,0)))" +
            s" DIV greatest(element_at(`$arr`, $k), 1L) AS BIGINT)"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("_mu",
        slice(array_sort(array_distinct(concat(col("_ma"), col("_mb")))), 1, 2 * k))
      .withColumn("est_a", est("_ma"))
      .withColumn("est_b", est("_mb"))
      .withColumn("est_union", est("_mu"))
      .withColumn("est_intersect",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .withColumn("jaccard_x10000", expr(
        "CAST((CAST(est_intersect AS DECIMAL(38,0)) * 10000)" +
          " DIV greatest(est_union, 1L) AS BIGINT)"))
      .select("key_a", "key_b", "est_a", "est_b", "est_union",
        "est_intersect", "jaccard_x10000")
  }

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

  /** [[KmvAgg]]'s twin evaluating to the RAW sorted minima
    * (`array<long>`, ascending) instead of the estimate — the
    * mergeable form [[overlapByKey]]'s set algebra composes. Same
    * buffer, same update/merge, same serialization.
    */
  case class KmvSetAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

    require(k >= 2, s"kmv_minima: k must be >= 2, got $k")

    private val inner = KmvAgg(child, k)

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "kmv_minima"

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      inner.createAggregationBuffer()
    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] =
      inner.update(buf, input)
    override def merge(
        buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
      inner.merge(buf, other)
    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
      inner.serialize(buf)
    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
      inner.deserialize(bytes)

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val arr = new Array[Any](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvSetAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvSetAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }
}
