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

  private def runBounded(rows: Seq[(Long, String)],
      minLen: Int = 16, maxLen: Int = 128) =
    CdcChunker.chunksBounded(rows.toDF("doc_id", "text").repartition(3),
      "doc_id", "text", 8, 64, 5, minLen, maxLen)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4)))
      .sortBy(t => (t._1, t._2))

  test("bounded: every chunk in [min, max] except a short final remainder") {
    val text = (1 to 120).map(i => s"token$i word${i % 7}").mkString(" ")
    val got = runBounded(Seq(1L -> text))
    got.dropRight(1).foreach { c =>
      assert(c._4 >= 16L && c._4 <= 128L, s"chunk len ${c._4} out of bounds")
    }
    assert(got.last._4 <= 128L)
    var pos = 0L
    got.foreach { c => assert(c._3 == pos); pos += c._4 }
    assert(pos == text.length.toLong, "bounded chunks must still tile")
  }

  test("bounded: a pathological repeating fire-block gets min-size chunks") {
    // find an 8-char block whose window hash fires; repeating it
    // makes every 8-aligned window fire, so the STATELESS chunker
    // cuts every 8 chars — the degenerate case the bounds exist for.
    val pw = CdcChunker.powerConstants(8)
    def h(s: String) =
      (0 until 8).map(j => s(j).toInt * pw(j) % CdcChunker.M)
        .sum % CdcChunker.M
    val block = Iterator.from(0).map { k =>
      (0 until 8).map(j => ('a' + (k >> (j * 2)) % 26).toChar).mkString
    }.find(s => h(s) % 64 == 5).get
    val text = block * 40 // 320 chars, raw cuts every 8
    val raw = run(Seq(1L -> text))
    assert(raw.length >= 30, "degenerate input should explode stateless chunks")
    val got = runBounded(Seq(1L -> text))
    // in-bounds fires exist every 8 chars past minLen, so the walk
    // cuts at exactly 16 each time
    got.dropRight(1).foreach(c => assert(c._4 == 16L,
      s"skip-then-cut should cut at the first in-bounds fire (len ${c._4})"))
    assert(got.map(_._4).sum == text.length.toLong)
  }

  test("bounded: no content cuts for a long stretch forces max-size chunks") {
    // find a char whose 8-run never fires -> forced cuts at maxLen
    val quiet = (32 to 500).map(_.toChar).find { ch =>
      val pw = CdcChunker.powerConstants(8)
      val h = (0 until 8).map(j => ch.toInt * pw(j) % CdcChunker.M)
        .sum % CdcChunker.M
      h % 64 != 5
    }.get
    val text = quiet.toString * 300
    val got = runBounded(Seq(1L -> text))
    assert(got.dropRight(1).forall(_._4 == 128L),
      "quiet input must force maxLen cuts")
    assert(got.map(_._4).sum == 300L)
  }

  test("bounded: shift re-synchronization after an edit") {
    val base = (1 to 120).map(i => s"stable$i content${i % 11}").mkString(" ")
    val a = runBounded(Seq(1L -> base)).map(_._5)
    val b = runBounded(Seq(1L -> ("INSERTED NEW LEAD PARAGRAPH " + base))).map(_._5)
    // the walk re-synchronizes at an in-bounds content cut past the
    // edit: a clear majority of original chunks must reappear (the
    // guarantee is weaker than the unbounded chunker's all-but-first
    // because a forced cut near the edit can shift one extra chunk)
    val shared = a.toSet intersect b.toSet
    assert(shared.size * 10 >= a.length * 6,
      s"only ${shared.size}/${a.length} chunks survived the edit")
  }
}
