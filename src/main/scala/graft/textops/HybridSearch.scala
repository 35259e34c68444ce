package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
  * the standard hybrid-retrieval combiner: given per-retriever
  * rankings (lexical BM25, dense ANN, …), fuse by
  *
  *   rrf(d) = Σ_lists 1 / (rrfK + rank_list(d))
  *
  * evaluated here in INTEGER arithmetic, `1000000 DIV (rrfK + rank)`
  * per list — sum-of-floors is order-independent and engine-exact, so
  * the DuckDB oracle reproduces every fused score bit-for-bit (the
  * repo-wide x1000/x10000 fixed-point discipline). RRF needs no score
  * calibration between retrievers — only ranks cross the boundary —
  * which is exactly why it is the production default for BM25+vector
  * hybrid search (Elasticsearch/OpenSearch both ship this formula
  * with the same k=60 constant).
  *
  * 100 TB shape: inputs are ALREADY top-k frames (each retriever
  * bounds its own candidate set — q77's postings pushdown, q32's IVF
  * probes), so fusion aggregates a few hundred rows: one hash
  * aggregation on id, then a driver-window rank over ≤ Σ k_i rows.
  * The global (unpartitioned) window is deliberate and safe — its
  * input is bounded by the retrievers' k's, never by corpus size.
  */
object HybridSearch {

  /** Fuse named rankings, each a frame with (id, rank) where rank is
    * 1-based within its list. Output: (id, n_lists, rrf_x1m, rank) —
    * the top `k` by (rrf_x1m desc, id asc).
    */
  def rrfFuse(
      rankings: Seq[(String, DataFrame)], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k > 0 && rrfK > 0, s"rrfFuse: k/rrfK must be positive (got $k/$rrfK)")
    val tagged = rankings.map { case (_, df) =>
      df.select(col("id"),
        expr(s"CAST(1000000 DIV ($rrfK + rank) AS BIGINT)").as("_rrf_s"))
    }.reduce(_ unionByName _)
    val fused = tagged.groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("_rrf_s")).as("rrf_x1m"))
    val w = Window.orderBy(col("rrf_x1m").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
