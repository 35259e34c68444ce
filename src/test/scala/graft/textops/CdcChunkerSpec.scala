package graft.textops

import graft.GraftSparkSpec

class CdcChunkerSpec extends GraftSparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], w: Int = 8, d: Long = 64, r: Long = 5) =
    CdcChunker.chunks(rows.toDF("doc_id", "text").repartition(3),
      "doc_id", "text", w, d, r)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4)))
      .sortBy(t => (t._1, t._2))

  /** Independent boundary recomputation: direct per-window polynomial
    * (no rolling), own loops.
    */
  private def refCuts(s: String, w: Int, d: Long, r: Long): Seq[Int] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val pw = CdcChunker.powerConstants(w)
    val cuts = (0 to n - w).flatMap { i =>
      val h = (0 until w).map(j => cps(i + j) * pw(j) % CdcChunker.M)
        .sum % CdcChunker.M
      if (h % d == r) Some(i + w) else None
    }
    if (cuts.isEmpty || cuts.last != n) cuts :+ n else cuts
  }

  test("spans match an independent per-window polynomial recomputation") {
    val text = (1 to 40).map(i => s"token$i word${i % 7}").mkString(" ")
    val got = run(Seq(1L -> text))
    val cuts = refCuts(text, 8, 64, 5)
    assert(got.map(_._3).toSeq == (0 +: cuts.dropRight(1)).map(_.toLong))
    assert(got.map(g => g._3 + g._4).toSeq == cuts.map(_.toLong))
    assert(got.length > 2, "fixture should produce several chunks")
  }

  test("shift-resilience: an inserted prefix leaves later chunk hashes intact") {
    val base = (1 to 60).map(i => s"stable$i content${i % 11}").mkString(" ")
    val a = run(Seq(1L -> base)).map(_._5)
    val b = run(Seq(1L -> ("INSERTED NEW LEAD PARAGRAPH " + base))).map(_._5)
    // every chunk of the original except its first must reappear
    val shared = a.drop(1).toSet intersect b.toSet
    assert(shared == a.drop(1).toSet,
      s"lost ${(a.drop(1).toSet -- b.toSet).size} of ${a.length - 1} chunks")
  }

  test("fixed-size blocks do NOT survive the same insertion (the contrast)") {
    val base = (1 to 60).map(i => s"stable$i content${i % 11}").mkString(" ")
    def blocks(s: String) = s.grouped(64).toSeq
    val a = blocks(base).drop(1).toSet
    val b = blocks("INSERTED NEW LEAD PARAGRAPH " + base).toSet
    assert((a intersect b).size < a.size / 2)
  }

  test("short and empty texts: one whole-doc chunk; empty yields no rows") {
    val got = run(Seq(1L -> "tiny", 2L -> ""))
    assert(got.toSeq == Seq((1L, 0L, 0L, 4L, got.head._5)))
  }

  test("chunks tile the document exactly") {
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val got = run(Seq(1L -> text))
    var pos = 0L
    got.foreach { c => assert(c._3 == pos); pos += c._4 }
    assert(pos == text.length.toLong)
  }
}
