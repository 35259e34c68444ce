package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.GraftSparkSpec

class TextIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry apple apple"),
    (4L, ""),
    (5L, "Apple pie")).toDF("doc_id", "text")

  private def rows(df: DataFrame): Seq[(Long, Double, Long, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSeq.sortBy(_._1)

  // independent reference scorer: own tokenization and arithmetic
  private def refScores(
      docs: Seq[(Long, String)], query: Seq[String]): Map[Long, (Double, Int)] = {
    val toks = docs.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Array.empty[String]
             else t.trim.toLowerCase.split("\\s+"))
    }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.length).sum.toDouble / n
    val dfOf = query.map(q => q -> toks.values.count(_.contains(q))).toMap
    docs.flatMap { case (id, _) =>
      val contribs = query.flatMap { q =>
        val tf = toks(id).count(_ == q)
        if (tf == 0) None
        else {
          val df = dfOf(q)
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          val dl = toks(id).length
          Some(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> (math.floor(contribs.sum * 10000 + 0.5) / 10000, contribs.length))
    }.toMap
  }

  test("bm25TopK matches an independent reference scorer") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "apple cherry cherry apple apple"), (4L, ""), (5L, "Apple pie"))
    val out = rows(TextIndex.bm25TopK(corpus, "doc_id", "text",
      Seq("apple", "cherry"), k = 10))
    val exp = refScores(docs, Seq("apple", "cherry"))
    assert(out.map(_._1).toSet == exp.keySet) // docs 1, 2, 3, 5
    out.foreach { case (id, score, nTerms, _) =>
      assert(math.abs(score - exp(id)._1) < 1e-9, s"doc $id score")
      assert(nTerms == exp(id)._2, s"doc $id n_terms")
    }
    // ranks follow rounded score desc, id asc
    val byRank = out.sortBy(_._4)
    assert(byRank.map(_._2).sliding(2).forall {
      case Seq(a, b) => a > b || (a == b)
      case _ => true
    })
  }

  test("k caps the result and keeps the best-ranked docs") {
    val out = rows(TextIndex.bm25TopK(corpus, "doc_id", "text",
      Seq("apple", "cherry"), k = 2))
    assert(out.length == 2 && out.map(_._4).sorted == Seq(1, 2))
  }

  test("persisted index search equals the one-frame path; append equals rebuild") {
    val dir = Files.createTempDirectory("graft_text_idx").toString
    val a = corpus.filter($"doc_id" <= 3)
    val b = corpus.filter($"doc_id" > 3)
    TextIndex.buildTextIndex(a, "doc_id", "text", dir)
    TextIndex.appendToTextIndex(b, "doc_id", "text", dir)
    val fromIndex = rows(TextIndex.searchTextIndex(spark, dir, Seq("apple", "cherry"), 10))
    val oneFrame = rows(TextIndex.bm25TopK(corpus, "doc_id", "text", Seq("apple", "cherry"), 10))
    assert(fromIndex == oneFrame)
  }

  test("search after delete equals an index rebuilt without the ids") {
    val dir = Files.createTempDirectory("graft_text_del").toString
    val dir2 = Files.createTempDirectory("graft_text_del2").toString
    TextIndex.buildTextIndex(corpus, "doc_id", "text", dir)
    TextIndex.removeFromTextIndex(Seq(3L).toDF("doc_id"), "doc_id", dir)
    TextIndex.buildTextIndex(corpus.filter($"doc_id" =!= 3L), "doc_id", "text", dir2)
    val afterDelete = rows(TextIndex.searchTextIndex(spark, dir, Seq("apple", "cherry"), 10))
    val rebuilt = rows(TextIndex.searchTextIndex(spark, dir2, Seq("apple", "cherry"), 10))
    assert(afterDelete == rebuilt)
    // deleting changed N/df/avgdl, not just membership: doc 1 score moved
    val before = rows(TextIndex.bm25TopK(corpus, "doc_id", "text", Seq("apple", "cherry"), 10))
    assert(afterDelete.find(_._1 == 1L).get._2 !=
      before.find(_._1 == 1L).get._2)
    // compact applies tombstones physically; search unchanged
    TextIndex.compactTextIndex(spark, dir)
    assert(rows(TextIndex.searchTextIndex(spark, dir, Seq("apple", "cherry"), 10)) == rebuilt)
  }

  test("phraseSearch: exact consecutive matches only, counted per doc") {
    val docs = Seq(
      (1L, "new york is not york new"),          // 1 occurrence
      (2L, "new new york york new york city"),   // positions 1 and 4
      (3L, "new jersey and york"),               // terms present, never adjacent
      (4L, "NEW YORK"),                          // case-folded match
      (5L, "")                                   // empty doc
    ).toDF("doc_id", "text")
    val got = TextIndex.phraseSearch(docs, "doc_id", "text", Seq("new", "york"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 4L -> 1L))
  }

  test("phraseSearch: repeated phrase terms need the full aligned run") {
    val docs = Seq(
      (1L, "a b a b a"),  // "a b a" at bases 0 and 2
      (2L, "a b b a"),    // never
      (3L, "a a b a")     // base 1
    ).toDF("doc_id", "text")
    val got = TextIndex.phraseSearch(docs, "doc_id", "text", Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))
    intercept[IllegalArgumentException](
      TextIndex.phraseSearch(docs, "doc_id", "text", Nil))
  }

  test("phraseSetSearch: all phrases in one pass, shared terms disambiguated") {
    val docs = Seq(
      (1L, "new york new york city"),   // p0 ×2, p1 ×1, p2 ×2 (york)
      (2L, "york alone"),               // p2 ×1
      (3L, "new city")                  // nothing ("new" and "city" only in longer phrases)
    ).toDF("doc_id", "text")
    val got = TextIndex.phraseSetSearch(docs, "doc_id", "text",
        Seq(Seq("new", "york"), Seq("york", "city"), Seq("york")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (1L, 0) -> 2L, (1L, 1) -> 1L, (1L, 2) -> 2L,
      (2L, 2) -> 1L))
    intercept[IllegalArgumentException](
      TextIndex.phraseSetSearch(docs, "doc_id", "text", Seq(Seq("a"), Nil)))
  }

  test("phraseSearchIndex: equals the one-frame path; delete and append honored") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_posidx").toFile.getAbsolutePath
    val docs = Seq(
      (1L, "new york is not york new"),
      (2L, "new new york york new york city"),
      (3L, "new jersey and york"),
      (4L, "NEW YORK")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val phrase = Seq("new", "york")
    TextIndex.buildTextIndex(docs, "doc_id", "text", dir)
    val oneFrame = rows(TextIndex.phraseSearch(docs, "doc_id", "text", phrase))
    assert(rows(TextIndex.phraseSearchIndex(spark, dir, phrase)) == oneFrame)
    // delete doc 2: index probe must equal a rebuild without it
    TextIndex.removeFromTextIndex(Seq(2L).toDF("id"), "id", dir)
    assert(rows(TextIndex.phraseSearchIndex(spark, dir, phrase)) ==
      oneFrame - 2L)
    // compact applies tombstones physically; probe unchanged
    TextIndex.compactTextIndex(spark, dir)
    assert(rows(TextIndex.phraseSearchIndex(spark, dir, phrase)) ==
      oneFrame - 2L)
    // append a new doc; probe sees it
    TextIndex.appendToTextIndex(
      Seq((5L, "more new york text")).toDF("doc_id", "text"), "doc_id", "text", dir)
    assert(rows(TextIndex.phraseSearchIndex(spark, dir, phrase)) ==
      (oneFrame - 2L) + (5L -> 1L))
  }

  test("phraseSearch: randomized duel against a brute-force sliding window") {
    // deterministic LCG over a 3-token vocab: maximal repeated-term
    // and overlap traffic for the aligned-base intersection
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    val vocab = Vector("a", "b", "c")
    val docs = (0 until 30).map { i =>
      val toks = lcg(i * 2654435761L).take(40)
        .map(x => vocab(((x >>> 33) % 3).toInt)).toSeq
      (i.toLong, toks.mkString(" "))
    }
    val phrases = Seq(Seq("a"), Seq("a", "b"), Seq("a", "a"),
      Seq("a", "b", "a"), Seq("c", "c", "c"), Seq("b", "a", "b", "a"))
    val df = docs.toDF("doc_id", "text")
    phrases.foreach { p =>
      val got = TextIndex.phraseSearch(df, "doc_id", "text", p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").toSeq
        val n = (0 to toks.length - p.length)
          .count(i => toks.slice(i, i + p.length) == p)
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      assert(got == want, s"phrase $p diverged")
    }
  }
}
