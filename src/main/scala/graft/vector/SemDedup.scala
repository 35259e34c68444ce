package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): k-means cluster the embedding space, then look
  * for high-cosine pairs ONLY within a cluster — the cluster
  * assignment is the candidate blocker that turns the O(n²) all-pairs
  * cosine into per-cell work, the same role the LSH band / simhash
  * chunk plays for the text families.
  *
  * Semantics ([[semanticDedup]]): assign every vector to its nearest
  * centroid; within each cell, any pair with `round(cosine, 4) >=
  * threshold` marks the HIGHER id a duplicate (keep-first-by-id, the
  * deterministic representative rule the exact-dedup family uses);
  * output is every input id with its cell and a `kept` flag.
  *
  * 100 TB shape: the quantizer trains on a bounded hash-gated sample
  * ([[Ivf.fitCentroids]] — driver-side, one sampling scan); assignment
  * is one codegen'd narrow pass; the pair search is ONE equi-join on
  * the cell id. Size `nClusters` so cells stay bounded (SemDeDup runs
  * ~100k clusters at corpus scale); `maxCellSize` is the guardrail —
  * cells above it contribute NO pairs (the LSH bucket-cap rule:
  * a too-coarse quantizer degrades recall loudly in the duel numbers,
  * never quadratically in the shuffle), and every vector of a skipped
  * cell stays `kept`.
  */
object SemDedup {

  /** Returns (`id`, `cell`, `kept`) for every input row.
    *
    * `threshold` compares against the 4-decimal-rounded cosine (the
    * q33 convention — both engine and oracle round before comparing,
    * so the comparison never straddles a half-ulp).
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, threshold: Double,
      maxCellSize: Long = 0, cacheKey: Option[String] = None): DataFrame = {
    require(nClusters >= 1, s"semanticDedup: nClusters must be >= 1, got $nClusters")
    val centroids = Ivf.fitCentroids(df, vecCol, nClusters, cacheKey = cacheKey)
    val assigned = df.select(
      col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("_v"),
      Ann.l2norm(col(vecCol)).as("_n"),
      Ivf.nearest_cells(col(vecCol), centroids, 1).getItem(0).as("cell"))
    val inCell =
      if (maxCellSize <= 0) assigned
      else assigned
        .withColumn("_cn", count(lit(1)).over(Window.partitionBy(col("cell"))))
        .filter(col("_cn") <= maxCellSize)
        .drop("_cn")
    val a = inCell.select(col("cell"), col("id").as("id_a"), col("_v").as("_va"), col("_n").as("_na"))
    val b = inCell.select(col("cell"), col("id").as("id_b"), col("_v").as("_vb"), col("_n").as("_nb"))
    val drops = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(DotProductExpr.dot_product(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("_dup", lit(true))
    assigned.select(col("id"), col("cell"))
      .join(drops, Seq("id"), "left")
      .select(col("id"), col("cell"), col("_dup").isNull.as("kept"))
  }
}
