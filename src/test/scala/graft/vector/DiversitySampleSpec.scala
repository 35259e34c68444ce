package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[DiversitySample.clusterBalanced]]: Hamilton apportionment
  * (sums to total when cells are big enough), the per-cell cap with
  * NO redistribution, every non-empty cell's representation, and
  * partitioning invariance.
  */
class DiversitySampleSpec extends GraftSparkSpec {
  import spark.implicits._

  /** Two far-apart clusters with a 3:1 size ratio + one tiny cluster. */
  private def corpus(n: Int): Seq[(Long, Array[Float])] = {
    def v(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, j) => x + (((i * 31 + j) % 7) - 3) * 0.01f }
    val a = Array(10f, 0f, 0f, 0f)
    val b = Array(0f, 10f, 0f, 0f)
    val c = Array(0f, 0f, 10f, 0f)
    (0 until n).map { i =>
      val base = if (i % 8 < 6) a else if (i % 8 < 7) b else c
      (i.toLong, v(base, i))
    }
  }

  test("selection size hits the total when every cell is large enough") {
    val df = corpus(400).toDF("vec_id", "embedding")
    val got = DiversitySample.clusterBalanced(
      spark, df, "vec_id", "embedding", nCells = 4, total = 40, salt = "t")
    assert(got.count() === 40L)
  }

  test("quota is proportional and capped at the cell size") {
    val df = corpus(80).toDF("vec_id", "embedding")
    // total close to N: small cells saturate, output <= total
    val got = DiversitySample.clusterBalanced(
      spark, df, "vec_id", "embedding", nCells = 4, total = 75, salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length <= 75)
    // no pick_rank exceeds its cell's row count, no duplicate ids
    assert(got.map(_._1).distinct.length === got.length)
    val perCell = got.groupBy(_._2).view.mapValues(_.length).toMap
    // the dominant cluster (6/8 of rows) must dominate the sample too
    assert(perCell.values.max >= got.length / 2)
  }

  test("every populated cell is represented when total >= nCells") {
    val df = corpus(200).toDF("vec_id", "embedding")
    val sel = DiversitySample.clusterBalanced(
      spark, df, "vec_id", "embedding", nCells = 4, total = 20, salt = "t")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    val centroids = Ivf.fitCentroids(df, "embedding", 4)
    val all = df.select(
      Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      .groupBy("cell").count()
      // a cell needs n_c large enough to earn a Hamilton seat at 20/200
      .filter(col("count") >= 10)
      .collect().map(_.getInt(0)).toSet
    assert(all.subsetOf(sel))
  }

  test("partitioning invariance") {
    val rows = corpus(300)
    def run(n: Int) = DiversitySample.clusterBalanced(
      spark, rows.toDF("vec_id", "embedding").repartition(n),
      "vec_id", "embedding", nCells = 4, total = 30, salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run(1) === run(7))
  }
}
