package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class CurriculumSpec extends GraftSparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def run(parts: Int = 4) =
    Curriculum.semanticOrder(
      emb.repartition(parts), "vec_id", "embedding", nCells = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))

  test("global_pos is a permutation of 1..N, cell-major and contiguous per cell") {
    val rows = run()
    val n = emb.count()
    assert(rows.length == n)
    assert(rows.map(_._5).sorted.toSeq == (1L to n).toSeq)
    // within each cell: positions form one contiguous run, ordered by
    // rank; across cells: lower cell ids come first
    val byCell = rows.groupBy(_._2).toSeq.sortBy(_._1)
    var expectedStart = 1L
    byCell.foreach { case (_, cellRows) =>
      val ps = cellRows.sortBy(_._4).map(_._5).toSeq
      assert(ps == (expectedStart until expectedStart + ps.length).toSeq)
      expectedStart += ps.length
    }
  }

  test("in-cell order is by descending similarity") {
    // ranking is on the RAW cosine (the q27 discipline); the emitted
    // `sim` is rounded to 4, so adjacent ranks may show equal sims —
    // assert the rounded view is non-increasing within each cell
    val rows = run()
    rows.groupBy(_._2).foreach { case (_, cellRows) =>
      val sorted = cellRows.sortBy(_._4)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 >= b._3,
            s"cell ${a._2}: rank ${a._4} sim ${a._3} vs rank ${b._4} sim ${b._3}")
        case _ =>
      }
    }
  }

  test("partitioning-insensitive") {
    assert(run(1).sortBy(_._1).toSeq == run(13).sortBy(_._1).toSeq)
  }
}
