package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class ChunkerSpec extends GraftSparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int): Seq[(Long, Long, String)] =
    Chunker.chunkByTokens(
      Seq((1L, text)).toDF("id", "text"), col("text"), window, stride, Seq(col("id")))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq

  test("short doc yields one whole chunk") {
    assert(chunksOf("a b c", 5, 3) == Seq((0L, 3L, "a b c")))
  }

  test("exact-window doc yields one chunk") {
    assert(chunksOf("a b c d e", 5, 3) == Seq((0L, 5L, "a b c d e")))
  }

  test("overlapping windows cover every token; last chunk reaches the tail") {
    // 7 tokens, window 5, stride 3: chunks [0,5) and [3,7) — no third
    // chunk at start 6 (it would be contained in the second's window)
    assert(chunksOf("a b c d e f g", 5, 3) ==
      Seq((0L, 5L, "a b c d e"), (1L, 4L, "d e f g")))
  }

  test("stride == window tiles without overlap") {
    assert(chunksOf("a b c d e f", 3, 3) ==
      Seq((0L, 3L, "a b c"), (1L, 3L, "d e f")))
    // 7th token forces a short tail chunk
    assert(chunksOf("a b c d e f g", 3, 3) ==
      Seq((0L, 3L, "a b c"), (1L, 3L, "d e f"), (2L, 1L, "g")))
  }

  test("empty and space-only docs emit no chunks") {
    assert(chunksOf("", 5, 3).isEmpty)
    assert(chunksOf("     ", 5, 3).isEmpty)
    // pinned family artifact (q22/q38 twin): trim strips SPACES only,
    // so tab/newline-only text splits into empty tokens on both the
    // Spark and DuckDB sides — the chunker inherits it rather than
    // diverging from the token twin
    assert(chunksOf("\t\n", 5, 3) == Seq((0L, 2L, " ")))
  }

  test("whitespace runs normalize to single spaces in chunk text") {
    assert(chunksOf("  a\t\tb \n c  ", 5, 3) == Seq((0L, 3L, "a b c")))
  }

  test("every token lands in at least one chunk (coverage invariant)") {
    val texts = (0 until 50).map(i => (i.toLong, (0 to i).map(j => s"t$j").mkString(" ")))
    // per-doc: sum of chunk_tokens >= n (overlap counts twice), and the
    // last chunk's window reaches token n-1
    val rows = Chunker.chunkByTokens(
      texts.toDF("id", "text"), col("text"), window = 7, stride = 4, keep = Seq(col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    texts.foreach { case (id, text) =>
      val n = text.split("\\s+").length
      val cs = rows(id)
      val lastIdx = cs.map(_._2).max
      assert(lastIdx * 4 + 7 >= n, s"doc $id: last chunk misses the tail")
      assert(cs.map(_._3).sum >= n, s"doc $id: chunks cover fewer than $n tokens")
      assert(cs.forall(_._3 <= 7))
    }
  }

  test("stride > window is rejected") {
    intercept[IllegalArgumentException] {
      Chunker.chunkByTokens(Seq((1L, "a")).toDF("id", "text"),
        col("text"), window = 3, stride = 4, Seq(col("id")))
    }
  }
}
