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

  // ---- sentence-aligned mode ----

  private def sentChunksOf(text: String, window: Int): Seq[(Long, Long, Long, String)] =
    Chunker.chunkBySentences(
      Seq((1L, text)).toDF("id", "text"), col("text"), window, Seq(col("id")))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1).toSeq

  test("sentence mode: bins fill to the window at sentence ends only") {
    // four 4-token sentences, window 8: prefix sums 0,4,8,12 -> bins
    // 0,0,1,1
    assert(sentChunksOf("a b c d. e f g h. i j k l. m n o p.", 8) ==
      Seq((0L, 2L, 8L, "a b c d e f g h"),
        (1L, 2L, 8L, "i j k l m n o p")))
  }

  test("sentence mode: a boundary-crossing sentence stays in its bin (overrun)") {
    // ntoks 3, 10, 2 at window 5: prefixes 0,3,13 -> bins 0,0,2;
    // chunk 0 overruns to 13 tokens, bin ids re-densify to 0,1
    assert(sentChunksOf("a b c. d e f g h i j k l m. n o.", 5) ==
      Seq((0L, 2L, 13L, "a b c d e f g h i j k l m"),
        (1L, 1L, 2L, "n o")))
  }

  test("sentence mode: a longer-than-window sentence gets its own chunk") {
    // ntoks 3, 7, 2 at window 3: prefixes 0, 3, 10 -> bins 0, 1, 3 —
    // the long sentence starts exactly at a boundary so it is alone
    assert(sentChunksOf("a b c. d e f g h i j. k l.", 3) ==
      Seq((0L, 1L, 3L, "a b c"),
        (1L, 1L, 7L, "d e f g h i j"),
        (2L, 1L, 2L, "k l")))
  }

  test("sentence mode: no mid-sentence boundary ever (invariant)") {
    val text = (0 until 40).map(i => s"tok$i word$i end$i.").mkString(" ")
    val chunks = sentChunksOf(text, 7)
    // every chunk is a concatenation of whole 3-token sentences
    assert(chunks.forall(_._3 % 3 == 0))
    assert(chunks.map(_._2).sum == 40)
    assert(chunks.map(_._1) == chunks.indices.map(_.toLong))
    // reassembling the chunks reproduces the token stream in order
    assert(chunks.map(_._4).mkString(" ") ==
      (0 until 40).map(i => s"tok$i word$i end$i").mkString(" "))
  }

  test("sentence mode: empty doc emits no chunks; window >= 1 enforced") {
    assert(sentChunksOf("", 5).isEmpty)
    assert(sentChunksOf("  ?! . ", 5).isEmpty)
    intercept[IllegalArgumentException] {
      Chunker.chunkBySentences(Seq((1L, "a")).toDF("id", "text"),
        col("text"), 0, Seq(col("id")))
    }
  }
}
