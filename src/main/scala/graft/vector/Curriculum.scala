package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-coherent corpus ordering — the In-Context Pretraining
  * shape (Shi et al. 2023: pretraining batches read better when
  * adjacent documents are semantically related, vs the i.i.d. shuffle
  * q71 produces): a distributed approximation that orders the corpus
  * cell-major by a k-means coarse quantizer, and within each cell by
  * descending cosine to the cell centroid — documents that share a
  * cell land in one contiguous run, the run's core (closest to the
  * centroid) first, its boundary cases last. The exact greedy
  * nearest-neighbor chain is inherently sequential (each pick depends
  * on the previous); the cell-major form keeps the 100 TB shape: one
  * narrow assignment scan, per-cell rank windows BOUNDED by the
  * corpus-sized quantizer rule (cells stay ~capacity-sized as the
  * corpus grows — the [[graft.SparkEntry.semDedupClusters]]
  * discipline), and a #cells-row offset frame.
  *
  * Determinism: the quantizer is [[Ivf.fitCentroids]] (deterministic
  * ordered sample); similarity is the q27 cosine arithmetic against
  * the per-cell centroid literal; ranks tiebreak on id; global
  * position is cell-major offset + in-cell rank. The generated oracle
  * embeds the engine's (id, cell) assignments AND centroid
  * coordinates, then recomputes every cosine, rank and offset from
  * the raw embeddings.
  */
object Curriculum {

  /** (idCol, cell, sim, cell_rank, global_pos) — cell-major
    * similarity-coherent ordering; `sim` is the 4-rounded cosine to
    * the assigned cell's centroid.
    */
  def semanticOrder(
      emb: DataFrame, idCol: String, vecCol: String,
      nCells: Int, cacheKey: Option[String] = None): DataFrame = {
    require(nCells > 0, s"semanticOrder: nCells must be positive (got $nCells)")
    val centroids = Ivf.fitCentroids(emb, vecCol, nCells, cacheKey = cacheKey)
    val cs = typedlit(centroids.map(_.toSeq).toSeq)

    val assigned = emb.select(col(idCol).as("_cu_id"), col(vecCol).as("_cu_v"),
      Ivf.nearest_cells(col(vecCol), centroids, 1).getItem(0).as("cell"))
      .withColumn("_cu_c", element_at(cs, col("cell") + 1))
      .withColumn("_cu_cos",
        Ann.dot(col("_cu_v"), col("_cu_c")) /
          (Ann.l2norm(col("_cu_v")) * Ann.l2norm(col("_cu_c"))))
    val wc = Window.partitionBy(col("cell"))
      .orderBy(col("_cu_cos").desc, col("_cu_id").asc)
    val ranked = assigned
      .withColumn("cell_rank", row_number().over(wc).cast("long"))

    // cell-major offsets: a #cells-row frame, cumsum by cell id
    val wo = Window.orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = ranked.groupBy(col("cell"))
      .agg(count(lit(1)).as("_cu_n"))
      .withColumn("_cu_off", coalesce(sum(col("_cu_n")).over(wo), lit(0L)))
      .select(col("cell"), col("_cu_off"))

    ranked.join(broadcast(offsets), "cell")
      .withColumn("global_pos", col("_cu_off") + col("cell_rank"))
      .select(col("_cu_id").as(idCol), col("cell"),
        round(col("_cu_cos"), 4).as("sim"), col("cell_rank"), col("global_pos"))
  }
}
