package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced (diversity) sampling — the D4/SemDeDup-family
  * selection step: instead of sampling a corpus uniformly (which
  * reproduces its cluster imbalance), partition the embedding space
  * into k-means cells ([[Ivf]]'s quantizer) and fill a per-cell
  * quota, so every region of the space is represented.
  *
  * Deterministic allocation (the oracle contract):
  *
  *  - quota base = `(total · n_c) DIV N` per cell (exact integer
  *    arithmetic), remainders distributed largest-remainder-first
  *    (ties by cell id ascending) — the classic Hamilton
  *    apportionment, SQL-replayable;
  *  - a cell never receives more than its row count; the shortfall is
  *    NOT redistributed (output size ≤ total, documented — chasing
  *    exact-total across capped cells would make the allocation
  *    iterative and partition-order-dependent);
  *  - within a cell, rows rank by `md5(salt:id)` then id (the q48
  *    deterministic-coin discipline) — reproducible across engines
  *    and partitionings.
  *
  * 100 TB shape: assignment is one broadcast-centroid narrow pass
  * ([[Ivf.nearest_cells]]); sizes/quotas are a k-row model frame
  * (the unpartitioned allocation window ranks k cells, not data);
  * selection is one shuffle on the cell key with per-task top-quota
  * pruning via the InferWindowGroupLimit path.
  */
object DiversitySample {

  /** Select ≤ `total` rows balanced across `nCells` k-means cells.
    * Output: (id, cell, pick_rank).
    */
  def clusterBalanced(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, nCells: Int, total: Int,
      salt: String, cacheKey: Option[String] = None): DataFrame = {
    require(total > 0 && nCells > 0, "clusterBalanced: total, nCells > 0")
    val centroids = Ivf.fitCentroids(emb, vecCol, nCells, cacheKey = cacheKey)
    val cells = emb.select(col(idCol).as("id"),
      Ivf.nearest_cells(col(vecCol), centroids, 1).getItem(0).as("cell"))
    val sizes = cells.groupBy("cell").agg(count(lit(1)).as("n_c"))
    val tot = cells.agg(count(lit(1)).as("n_total"))
    val alloc = sizes.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(${total}L * n_c) DIV n_total"))
      .withColumn("rem", expr(s"(${total}L * n_c) % n_total"))
    val sumBase = alloc.agg(sum(col("base")).as("sum_base"))
    val wCell = Window.orderBy(col("rem").desc, col("cell").asc)
    val quotas = alloc.crossJoin(broadcast(sumBase))
      .withColumn("crank", row_number().over(wCell))
      .withColumn("quota", least(col("n_c"),
        col("base") + when(col("crank") <= lit(total.toLong) - col("sum_base"), 1L)
          .otherwise(0L)))
      .select("cell", "quota")
    val wPick = Window.partitionBy(col("cell"))
      .orderBy(md5(concat(lit(salt + ":"), col("id").cast("string"))).asc,
        col("id").asc)
    cells.withColumn("pick_rank", row_number().over(wPick).cast("long"))
      .join(broadcast(quotas), "cell")
      .filter(col("pick_rank") <= col("quota"))
      .select(col("id"), col("cell"), col("pick_rank"))
  }
}
