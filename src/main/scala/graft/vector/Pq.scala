package graft.vector

import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** IVF-PQ approximate nearest-neighbor search: IVF coarse cells
  * ([[Ivf]]) + product-quantized codes + asymmetric-distance (ADC)
  * shortlisting + exact re-rank.
  *
  * The 100 TB rationale: a 64-dim float vector is 256 bytes; its PQ code
  * is `m` bytes (8 here) — the searchable index shrinks ~32x, so the
  * candidate scan touches codes only and the full vectors are fetched
  * (joined) for just the top `refine·k` shortlist per query. Training is
  * driver-side on the same bounded sample as the IVF quantizer.
  *
  * Scoring uses the classic per-query lookup table: for each query, the
  * inner product against sub-centroid `c` of subspace `s` is
  * precomputed once (`m · ks` entries), and a candidate's approximate
  * score is `m` table lookups — O(m) per pair instead of O(dim).
  * Queries are a bounded set by contract (they're broadcast), so the
  * LUTs travel as one plan-reference object.
  */
object Pq {

  /** Per-subspace codebooks: `m` arrays of `ks` sub-centroids, trained
    * with the shared seeded k-means on a driver-side sample of
    * L2-NORMALIZED vectors (normalize first so inner product ranks like
    * cosine).
    */
  def fitCodebooks(
      sample: Array[Array[Double]], m: Int, ks: Int, seed: Long): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "fitCodebooks: empty sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      Ivf.kmeans(pts, math.min(ks, pts.length), seed + s, iters = 10)
    }
  }

  /** Nearest sub-centroid per subspace (L2) of the normalized vector. */
  def encode(v: ArrayData, codebooks: Array[Array[Array[Double]]], isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val vec = new Array[Double](n)
    var norm = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vec(i) = x; norm += x * x; i += 1
    }
    val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
    i = 0
    while (i < n) { vec(i) *= inv; i += 1 }
    val m = codebooks.length
    val sub = n / m
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = vec(s * sub + j) - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC: approximate inner product = sum over subspaces of
    * `lut(query)(s)(code)`.
    */
  def adcScore(qid: Long, codes: ArrayData, luts: java.util.HashMap[Long, Array[Array[Double]]]): Double = {
    val lut = luts.get(qid)
    // a qid the driver never collected means the scored frame and the
    // LUT set diverged — fail loudly rather than rank the pair last
    if (lut == null) throw new IllegalStateException(
      s"pq_adc_score: query id $qid has no ADC lookup table; the scored frame " +
        "contains a query the driver did not collect LUTs for")
    var acc = 0.0
    var s = 0
    val m = codes.numElements()
    while (s < m) {
      acc += lut(s)(codes.getInt(s))
      s += 1
    }
    acc
  }

  case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "pq_encode"
    @transient private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(input: Any): Any =
      encode(input.asInstanceOf[ArrayData], codebooks, isFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftPqCodebooks", codebooks, "double[][][]")
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.vector.Pq.encode($input, $ref, $isFloat);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class PqAdcExpr(
      left: Expression, right: Expression,
      luts: java.util.HashMap[Long, Array[Array[Double]]]) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "pq_adc_score"
    override def nullSafeEval(qid: Any, codes: Any): Any =
      adcScore(qid.asInstanceOf[Long], codes.asInstanceOf[ArrayData], luts)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftPqLuts", luts, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, (q, c) =>
        s"${ev.value} = graft.vector.Pq.adcScore($q, $c, $ref);")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def pq_encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftInterop.column(PqEncodeExpr(GraftInterop.expression(v), codebooks))

  def pq_adc_score(qid: Column, codes: Column,
      luts: java.util.HashMap[Long, Array[Array[Double]]]): Column =
    GraftInterop.column(PqAdcExpr(
      GraftInterop.expression(qid), GraftInterop.expression(codes), luts))

  /** The front half of [[ivfPqTopK]] — train quantizers, build ADC
    * LUTs, probe cells, shortlist `refine·k` candidates per query from
    * codes alone. Returns (shortlist(query_id, neighbor_id),
    * qBase(query_id, _qv)). Public so the generated DuckDB oracle
    * ([[graft.OracleGen]]) can replay the exact shortlist and
    * independently re-rank it.
    */
  /** Bounded, validated query collect for the LUT build. The limit
    * makes the guard and the collect one bounded job: one row past
    * maxQueries proves the contract violation without fetching a
    * corpus-sized frame first. Null ids/embeddings/elements are
    * rejected with the offending query id (they would NPE deep inside
    * the LUT build otherwise).
    */
  private def collectQueries(
      queries: DataFrame, qidCol: String, qvecCol: String,
      maxQueries: Int, api: String): Array[org.apache.spark.sql.Row] = {
    require(maxQueries > 0 && maxQueries < Int.MaxValue,
      s"$api: maxQueries must be in [1, ${Int.MaxValue - 1}], got $maxQueries " +
        "(maxQueries + 1 rows are probed, so Int.MaxValue would overflow)")
    val qRows = queries.select(
      col(qidCol).cast("long").as("query_id"),
      transform(col(qvecCol), x => x.cast("double")).as("_qv"))
      .limit(maxQueries + 1).collect()
    if (qRows.length > maxQueries) throw new IllegalArgumentException(
      s"$api: query frame exceeds maxQueries=$maxQueries rows; the query set " +
        "is collected for ADC LUTs and broadcast by contract. Batch the query " +
        "frame, raise maxQueries deliberately, or use the pairwise APIs for " +
        "corpus-vs-corpus shapes.")
    qRows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        s"$api: query row with null ${if (r.isNullAt(0)) "id" else "embedding"} " +
          "in the query frame; filter nulls before calling the top-k APIs")
      require(!r.getSeq[Any](1).contains(null),
        s"$api: query id ${r.getLong(0)} has null elements in its embedding; " +
          "filter or impute null vector elements before calling the top-k APIs")
    }
    qRows
  }

  /** Per-query ADC lookup tables: inner products of the normalized
    * query against every sub-centroid.
    */
  private def buildLuts(
      qRows: Array[org.apache.spark.sql.Row],
      codebooks: Array[Array[Array[Double]]]): java.util.HashMap[Long, Array[Array[Double]]] = {
    val m = codebooks.length
    val luts = new java.util.HashMap[Long, Array[Array[Double]]]()
    qRows.foreach { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val norm = math.sqrt(qv.map(x => x * x).sum)
      val qn = if (norm > 0) qv.map(_ / norm) else qv
      val sub = qn.length / m
      luts.put(qid, Array.tabulate(m) { s =>
        codebooks(s).map { cent =>
          var acc = 0.0
          var j = 0
          while (j < sub) { acc += qn(s * sub + j) * cent(j); j += 1 }
          acc
        }
      })
    }
    luts
  }

  /** Probe + re-rank query frames are REBUILT from the collected rows,
    * not re-derived from the caller's plan: re-evaluating a
    * nondeterministic query plan (sample, multi-partition limit) could
    * yield qids the LUT map never saw, failing in an executor after
    * the corpus encode already ran — and the rebuild saves two full
    * re-evaluations.
    */
  private def qBaseOf(
      spark: org.apache.spark.sql.SparkSession,
      qRows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    spark.createDataset(qRows.toSeq.map(r => (r.getLong(0), r.getSeq[Double](1))))
      .toDF("query_id", "_qv")
  }

  /** ADC shortlist from a codes frame (neighbor_id, _cell, _code) —
    * shared by the in-memory path (codes computed on the fly) and the
    * persisted-index path (codes read back from parquet).
    */
  private def shortlistFrom(
      codes: DataFrame, qBase: DataFrame,
      centroids: Array[Array[Double]],
      luts: java.util.HashMap[Long, Array[Array[Double]]],
      k: Int, nprobe: Int, refine: Int): DataFrame = {
    val q = qBase.select(col("query_id"),
      explode(Ivf.nearest_cells(col("_qv"), centroids, nprobe)).as("_cell"))
    val shortlistW = Window.partitionBy(col("query_id"))
      .orderBy(col("_adc").desc, col("neighbor_id").asc)
    codes.join(broadcast(q), Seq("_cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_adc", pq_adc_score(col("query_id"), col("_code"), luts))
      .withColumn("_r", row_number().over(shortlistW))
      .filter(col("_r") <= k * refine)
      .select("query_id", "neighbor_id")
  }

  /** Exact re-rank: fetch full vectors for the shortlist only. */
  private def rerank(
      shortlist: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      qBase: DataFrame, k: Int): DataFrame = {
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      Ann.l2norm(col(vecCol)).as("_cn"))
    val qv = qBase.withColumn("_qn", Ann.l2norm(col("_qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    shortlist
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", Ann.dot(col("_cv"), col("_qv")) / (col("_cn") * col("_qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** The ONE training recipe (bounded sample feeding BOTH quantizers)
    * shared by the in-memory path and [[buildIndex]] — a drift between
    * them would silently break the persisted-vs-fresh equality
    * contract PqIndexSpec pins.
    */
  private def train(
      corpus: DataFrame, vecCol: String, nlist: Int, m: Int, ks: Int,
      seed: Long, cacheKey: Option[String] = None)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val sample = Ivf.sampleNormalized(corpus, vecCol, seed, cacheKey = cacheKey)
    (Ivf.fitCentroids(sample, nlist, seed, iters = 10), fitCodebooks(sample, m, ks, seed))
  }

  def adcShortlistWithQueries(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nlist: Int, nprobe: Int,
      m: Int, ks: Int, refine: Int, seed: Long,
      maxQueries: Int, cacheKey: Option[String] = None): (DataFrame, DataFrame) = {
    // validate the query contract BEFORE paying for quantizer training
    // (sample collect + k-means) — fail-fast on a bad maxQueries/frame
    val qRows = collectQueries(queries, qidCol, qvecCol, maxQueries, "ivfPqTopK")
    val (centroids, codebooks) = train(corpus, vecCol, nlist, m, ks, seed, cacheKey)
    val luts = buildLuts(qRows, codebooks)
    val qBase = qBaseOf(queries.sparkSession, qRows)
    // Corpus index: cell id + m-byte code per vector (codes-only scan)
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      Ivf.nearest_cells(col(vecCol), centroids, 1).getItem(0).as("_cell"),
      pq_encode(col(vecCol), codebooks).as("_code"))
    (shortlistFrom(codes, qBase, centroids, luts, k, nprobe, refine), qBase)
  }

  /** Persist the full PQ index: coarse centroids, per-subspace
    * codebooks, and the per-vector (id, cell, code) codes frame — the
    * codes-only scan artifact (~32x smaller than the vectors), written
    * distributed. Build once, serve every later query batch without
    * re-training or re-encoding.
    */
  def buildIndex(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Int = 16, m: Int = 8, ks: Int = 64, seed: Long = 42L): Unit = {
    val (centroids, codebooks) = train(corpus, vecCol, nlist, m, ks, seed)
    writeIndex(corpus, idCol, vecCol, dir, centroids, codebooks)
  }

  /** Bulk-build the index with an EXPLICIT quantizer pair
    * (offline-trained, or loaded from an existing index): encode +
    * assign only, no training. [[buildIndex]] is train + this;
    * [[appendToIndex]] must produce the same index state as this over
    * the union (PqIndexSpec pins it).
    */
  def writeIndex(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    codebooks.zipWithIndex.toSeq
      .flatMap { case (cb, s) => cb.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) } }
      .toDF("subspace", "code", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    corpus.select(col(idCol).as("id"),
      Ivf.nearest_cells(col(vecCol), centroids, 1).getItem(0).as("cell"),
      pq_encode(col(vecCol), codebooks).as("code"))
      .write.mode("overwrite").parquet(s"$dir/codes.parquet")
  }

  /** Append a new vector batch to a persisted PQ index WITHOUT
    * retraining: encode + assign against the SAVED quantizer/codebooks,
    * append the (id, cell, code) rows — centroids and codebooks are
    * untouched, the write is sized by the batch. Caller contract: the
    * batch's ids are new (dedup/anti-join against the index first).
    */
  def appendToIndex(
      batch: DataFrame, idCol: String, vecCol: String, dir: String): Unit =
    graft.operators.IndexOps.withMutationLock(batch.sparkSession, dir, "append-pq") {
      val (centroids, codebooks) = loadQuantizer(batch.sparkSession, dir)
      batch.select(col(idCol).as("id"),
        Ivf.nearest_cells(col(vecCol), centroids, 1).getItem(0).as("cell"),
        pq_encode(col(vecCol), codebooks).as("code"))
        .write.mode("append").parquet(s"$dir/codes.parquet")
    }

  /** The saved quantizer pair of a persisted index — shared by
    * [[searchIndex]] and [[appendToIndex]] so the search and append
    * paths read the identical artifact.
    */
  /** Tombstone `ids` in a persisted PQ index: O(batch) append,
    * [[searchIndex]] stops shortlisting them immediately; centroids and
    * codebooks are untouched. IndexDeleteSpec pins search-after-delete
    * ≡ search of an index rebuilt (same quantizer pair) without the ids.
    */
  def removeFromIndex(ids: DataFrame, idCol: String, dir: String): Unit =
    graft.operators.IndexOps.removeFromIndex(ids, idCol, dir)

  /** Apply tombstones + bound the codes dataset's parquet file count
    * (see [[graft.operators.IndexOps.compactIndex]]).
    */
  def compactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFiles: Int = 4): Unit =
    graft.operators.IndexOps.compactIndex(spark, dir,
      Seq("codes.parquet" -> "id"), targetFiles)

  private[graft] def loadQuantizer(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val centroids = spark.read.parquet(s"$dir/centroids.parquet")
      .orderBy(col("cell")).collect().map(_.getSeq[Double](1).toArray)
    val cbRows = spark.read.parquet(s"$dir/codebooks.parquet")
      .orderBy(col("subspace"), col("code")).collect()
    val codebooks = cbRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Double](2).toArray)).toArray
    (centroids, codebooks)
  }

  /** Search a persisted PQ index: the ADC shortlist runs entirely off
    * the SAVED codes frame (no corpus encode), the quantizer and
    * codebooks load from the saved parquet, and only the final re-rank
    * touches the corpus vectors (shortlist-sized join). Output schema
    * matches [[ivfPqTopK]]; PqIndexSpec pins row-for-row equality with
    * the fresh in-memory path.
    */
  def searchIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dir: String, k: Int, nprobe: Int = 4, refine: Int = 4,
      maxQueries: Int = Ann.MaxQueries): DataFrame = {
    val spark = corpus.sparkSession
    val (centroids, codebooks) = loadQuantizer(spark, dir)
    val qRows = collectQueries(queries, qidCol, qvecCol, maxQueries, "searchIndex")
    val luts = buildLuts(qRows, codebooks)
    val qBase = qBaseOf(spark, qRows)
    val codes = graft.operators.IndexOps.dropTombstoned(spark, dir,
      spark.read.parquet(s"$dir/codes.parquet"), "id")
      .select(col("id").as("neighbor_id"), col("cell").as("_cell"), col("code").as("_code"))
    val shortlist = shortlistFrom(codes, qBase, centroids, luts, k, nprobe, refine)
    rerank(shortlist, corpus, idCol, vecCol, qBase, k)
  }

  /** IVF-PQ top-k: probe `nprobe` coarse cells, ADC-shortlist
    * `refine·k` candidates per query from codes alone, exact-cosine
    * re-rank of the shortlist. Output schema matches
    * [[Ann.cosineTopK]]: (query_id, neighbor_id, cosine, rank).
    */
  def ivfPqTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ks: Int = 64, refine: Int = 4, seed: Long = 42L,
      maxQueries: Int = Ann.MaxQueries,
      cacheKey: Option[String] = None): DataFrame = {
    val (shortlist, qBase) = adcShortlistWithQueries(
      corpus, idCol, vecCol, queries, qidCol, qvecCol,
      k, nlist, nprobe, m, ks, refine, seed, maxQueries, cacheKey)
    rerank(shortlist, corpus, idCol, vecCol, qBase, k)
  }
}
