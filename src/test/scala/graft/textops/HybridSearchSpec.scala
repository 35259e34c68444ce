package graft.textops

import graft.GraftSparkSpec

class HybridSearchSpec extends GraftSparkSpec {
  import spark.implicits._

  private def fuse(lists: Seq[Seq[Long]], k: Int = 10) =
    HybridSearch.rrfFuse(
      lists.zipWithIndex.map { case (ids, i) =>
        s"l$i" -> ids.zipWithIndex
          .map { case (id, r) => (id, (r + 1).toLong) }.toDF("id", "rank")
      }, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("the RRF formula: 1000000 DIV (60 + rank) summed per id") {
    val got = fuse(Seq(Seq(7L, 8L), Seq(8L, 9L)), k = 10)
    val s1 = 1000000L / 61 // rank 1
    val s2 = 1000000L / 62 // rank 2
    // 8 appears at rank 2 (list 0) and rank 1 (list 1)
    assert(got.toSeq == Seq(
      (8L, 2L, s2 + s1, 1L), (7L, 1L, s1, 2L), (9L, 1L, s2, 3L)))
  }

  test("a doc ranked in both lists beats a doc ranked first in one") {
    // id 5 is rank 3+3; id 1 is rank 1 in one list only:
    // 2*1000000/63 = 31744 > 1000000/61 = 16393
    val got = fuse(Seq(Seq(1L, 2L, 5L), Seq(3L, 4L, 5L)))
    assert(got.head._1 == 5L)
  }

  test("ties break by id ascending; k cuts after ranking") {
    val got = fuse(Seq(Seq(10L, 2L), Seq(2L, 10L)), k = 1)
    // both have s1+s2 — id 2 wins the tie
    assert(got.toSeq == Seq((2L, 2L, 1000000L / 61 + 1000000L / 62, 1L)))
  }

  test("empty ranking list input is rejected") {
    intercept[IllegalArgumentException] {
      HybridSearch.rrfFuse(Seq.empty, k = 5)
    }
  }
}
