package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) ANN — the codec between raw floats and
  * [[Pq]]'s product quantizer: every dimension quantizes independently
  * to an 8-bit code against corpus-wide per-dimension [min, max]
  * bounds (FAISS's `ScalarQuantizer` QT_8bit shape). The scan phase
  * reads CODES ONLY — 4× smaller than float32 at full dimensionality,
  * no codebook training, exact reconstruction ordering within each
  * dimension — and a bounded shortlist re-ranks by exact cosine over
  * raw vectors fetched by id (the [[Pq.ivfPqTopK]] refine discipline).
  *
  * Determinism contract: codes are
  * `clamp(floor((x − mn_d) · 255 / (mx_d − mn_d)), 0, 255)` evaluated
  * in IEEE double with this exact association — DuckDB replays it
  * verbatim. Code dots are sums of integer-valued doubles
  * (≤ 255²·dim ≪ 2^53, exact); the shortlist score is code-space
  * COSINE (dot over the product of code norms, ε-guarded) — raw
  * unsigned code dots would favor large-norm candidates and lose
  * true neighbors — with the (score desc, id asc) tiebreak; the
  * final ranking is the q27 exact-cosine ordering.
  *
  * 100 TB shape: fit is ONE aggregation with map-side partial min/max
  * on `dim` keys (≤ dim rows per task emitted); the driver holds 2·dim
  * doubles — never corpus-sized state. Search is a codes-only
  * broadcast scan + per-query top-(k·refine) window + an id equi-join
  * to fetch raw vectors for the ≤ |queries|·k·refine shortlist rows.
  */
object Sq {

  /** Per-dimension (min, max) over the corpus, index-ordered. One
    * narrow posexplode + one hash aggregation on the dimension id.
    */
  def fitParams(corpus: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("_sq_d", "_sq_x")))
      .groupBy(col("_sq_d"))
      .agg(min(col("_sq_x").cast("double")).as("mn"),
        max(col("_sq_x").cast("double")).as("mx"))
      .orderBy(col("_sq_d"))
      .collect()
    require(rows.nonEmpty, "Sq.fitParams: empty corpus")
    require(rows.head.getInt(0) == 0 && rows.length == rows.last.getInt(0) + 1,
      "Sq.fitParams: ragged embedding dimensions")
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** The 8-bit code vector as integer-valued doubles (see the
    * determinism contract above). A constant dimension (mx = mn)
    * codes to 0.
    */
  def codes(v: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = typedlit(mins.toSeq)
    val mx = typedlit(maxs.toSeq)
    transform(v, (x, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi === lo, lit(0.0)).otherwise(
        least(greatest(floor((x.cast("double") - lo) * lit(255.0) / (hi - lo)),
          lit(0.0)), lit(255.0)))
    })
  }

  /** The one scoring tail shared by [[sqTopK]] and [[searchSqIndex]]
    * (the [[Ivf]] rankProbed discipline — fresh and persisted paths
    * cannot drift; SqIndexSpec pins their row equality).
    *
    * The corpus scan is CODES-ONLY; the (small, broadcast) query side
    * carries its raw vector + norm through the shortlist so the
    * re-rank needs only the corpus-side id join-back. The shortlist
    * score is code-space COSINE, not the raw code dot — an unsigned
    * code dot favors large-norm candidates (an all-255 vector beats
    * everything), while the normalized score makes identical codes
    * the provable maximum (the twin-recall contract). Zero-code
    * vectors guard the division with an epsilon both engines share.
    *
    * `c` = (neighbor_id, _cc, _ccn); `raw` = (_rid, _rv, _rn);
    * `q` = (query_id, _qc, _qcn, _qv, _qn).
    */
  private def rankCodes(
      c: DataFrame, raw: DataFrame, q: DataFrame,
      k: Int, refine: Int): DataFrame = {
    val cand = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_adot", Ann.dot(col("_cc"), col("_qc")) /
        greatest(col("_ccn") * col("_qcn"), lit(1e-12)))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("_adot").desc, col("neighbor_id").asc)
    val short = cand
      .withColumn("_arank", row_number().over(wa))
      .filter(col("_arank") <= k * refine)
      .select("query_id", "neighbor_id", "_qv", "_qn")
    val rr = short
      .join(raw, col("neighbor_id") === col("_rid"))
      .withColumn("cosine",
        Ann.dot(col("_rv"), col("_qv")) / (col("_rn") * col("_qn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    rr.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  private def codedQueries(
      queries: DataFrame, qidCol: String, qvecCol: String,
      mins: Array[Double], maxs: Array[Double]): DataFrame =
    queries.select(col(qidCol).as("query_id"),
      codes(col(qvecCol), mins, maxs).as("_qc"),
      col(qvecCol).as("_qv"), Ann.l2norm(col(qvecCol)).as("_qn"))
      .withColumn("_qcn", Ann.l2norm(col("_qc")))

  /** SQ8 top-k: codes-only approximate scan, top-(k·refine) shortlist
    * per query, exact cosine re-rank. Output (query_id, neighbor_id,
    * cosine, rank) — the [[Ann.cosineTopK]] contract.
    */
  def sqTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, refine: Int = 4, maxQueries: Int = Ann.MaxQueries): DataFrame = {
    require(k > 0 && refine > 0, s"sqTopK: k/refine must be positive (got $k/$refine)")
    Ann.requireBoundedQueries(queries, maxQueries, "sqTopK")
    val (mins, maxs) = fitParams(corpus, vecCol)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      codes(col(vecCol), mins, maxs).as("_cc"))
      .withColumn("_ccn", Ann.l2norm(col("_cc")))
    val raw = corpus.select(col(idCol).as("_rid"), col(vecCol).as("_rv"),
      Ann.l2norm(col(vecCol)).as("_rn"))
    rankCodes(c, raw, codedQueries(queries, qidCol, qvecCol, mins, maxs),
      k, refine)
  }

  // ----- persisted SQ index (the Ivf/Pq lifecycle) -----
  //
  // dir/params.parquet — one row per dimension: (dim, mn, mx)
  // dir/codes.parquet  — (id, codes array<double>), the scan artifact
  //
  // The raw vectors stay in the CORPUS store (searchSqIndex takes the
  // corpus frame for the re-rank join) — the index holds only the 4x
  // smaller codes plus 2·dim doubles of quantizer state.

  /** Fit params on the corpus and write the full index (overwrite). */
  def buildSqIndex(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val (mins, maxs) = fitParams(corpus, vecCol)
    writeSqIndex(corpus, idCol, vecCol, dir, mins, maxs)
  }

  /** Bulk-build with EXPLICIT params (offline-fitted, or loaded from
    * another index) — [[buildSqIndex]] is fit + this;
    * [[appendToSqIndex]] must produce the same state over the union
    * (SqIndexSpec pins it, the [[Ivf.writeIndex]] contract).
    */
  def writeSqIndex(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      mins: Array[Double], maxs: Array[Double]): Unit = {
    require(mins.length == maxs.length && mins.nonEmpty,
      "writeSqIndex: mins/maxs must be same-length and non-empty")
    val spark = corpus.sparkSession
    import spark.implicits._
    mins.indices.map(i => (i, mins(i), maxs(i))).toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params.parquet")
    corpus.select(col(idCol).as("id"),
      codes(col(vecCol), mins, maxs).as("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes.parquet")
  }

  private[graft] def loadParams(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Array[Double], Array[Double]) = {
    val rows = spark.read.parquet(s"$dir/params.parquet")
      .orderBy(col("dim")).collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Append a batch WITHOUT refitting: code against the SAVED params
    * (values outside the fitted range clamp to 0/255 — the quantizer
    * is frozen, the [[Ivf.appendToIndex]] contract) and append the
    * narrow (id, codes) rows. Caller contract: batch ids are new.
    */
  def appendToSqIndex(
      batch: DataFrame, idCol: String, vecCol: String, dir: String): Unit =
    graft.operators.IndexOps.withMutationLock(
      batch.sparkSession, dir, "append-sq") {
      val (mins, maxs) = loadParams(batch.sparkSession, dir)
      batch.select(col(idCol).as("id"),
        codes(col(vecCol), mins, maxs).as("codes"))
        .write.mode("append").parquet(s"$dir/codes.parquet")
    }

  /** Tombstone ids — [[searchSqIndex]] stops returning them
    * immediately; params are untouched.
    */
  def removeFromSqIndex(ids: DataFrame, idCol: String, dir: String): Unit =
    graft.operators.IndexOps.removeFromIndex(ids, idCol, dir)

  /** Apply tombstones + bound the codes dataset's file count. */
  def compactSqIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFiles: Int = 4): Unit =
    graft.operators.IndexOps.compactIndex(spark, dir,
      Seq("codes.parquet" -> "id"), targetFiles)

  /** Search a persisted index: SAVED codes scan (tombstones dropped),
    * queries coded against the SAVED params, exact re-rank against
    * the corpus frame's raw vectors. Output schema matches
    * [[sqTopK]]; SqIndexSpec pins row equality with the fresh path.
    */
  def searchSqIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dir: String, k: Int, refine: Int = 4,
      maxQueries: Int = Ann.MaxQueries): DataFrame = {
    require(k > 0 && refine > 0,
      s"searchSqIndex: k/refine must be positive (got $k/$refine)")
    Ann.requireBoundedQueries(queries, maxQueries, "searchSqIndex")
    val spark = corpus.sparkSession
    val (mins, maxs) = loadParams(spark, dir)
    val saved = graft.operators.IndexOps.dropTombstoned(spark, dir,
      spark.read.parquet(s"$dir/codes.parquet"), "id")
    val c = saved.select(col("id").as("neighbor_id"), col("codes").as("_cc"))
      .withColumn("_ccn", Ann.l2norm(col("_cc")))
    val raw = corpus.select(col(idCol).as("_rid"), col(vecCol).as("_rv"),
      Ann.l2norm(col(vecCol)).as("_rn"))
    rankCodes(c, raw, codedQueries(queries, qidCol, qvecCol, mins, maxs),
      k, refine)
  }
}
