package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class DatasetCardSpec extends GraftSparkSpec {
  import spark.implicits._

  test("per-source card: volume, quality, pii, dup attribution, modal lang") {
    // unique-heavy with a sprinkle of stopwords: passes length,
    // punctuation, stopword-ratio AND repetition gates
    val good = (1 to 40).map(i =>
      s"word$i" + (if (i % 5 == 0) " the" else "")).mkString(" ")
    val rows = Seq(
      // srcA: 2 good docs sharing identical text (corpus dup), 1 short
      (1L, "srcA", "en", good),
      (2L, "srcA", "en", good),
      (3L, "srcA", "de", "tiny"),
      // srcB: 1 good doc with an email, 1 copy of srcA's text
      // (cross-source dup counts for BOTH sources)
      (4L, "srcB", "en", good + " mail me bob@example.com"),
      (5L, "srcB", "en", good))
      .toDF("doc_id", "source", "lang", "text")
    val got = DatasetCard.perSource(rows.repartition(3),
      "source", "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("srcA")
    assert(a.getAs[Long]("n_docs") === 3L)
    assert(a.getAs[Long]("n_quality_keep") === 2L) // "tiny" is too_short
    assert(a.getAs[Long]("quality_x10000") === 6666L)
    assert(a.getAs[Long]("n_pii_docs") === 0L)
    assert(a.getAs[Long]("n_dup_docs") === 2L) // both copies count
    assert(a.getAs[String]("top_lang") === "en")
    assert(a.getAs[Long]("top_lang_x10000") === 6666L)
    val b = got("srcB")
    assert(b.getAs[Long]("n_pii_docs") === 1L)
    assert(b.getAs[Long]("n_dup_docs") === 1L) // its copy of the shared text
    assert(b.getAs[Long]("top_lang_x10000") === 10000L)
  }

  test("partitioning-insensitive") {
    val rows = (1L to 60L).map(i =>
      (i, s"s${i % 3}", s"l${i % 4}", (1 to (i % 20 + 5).toInt)
        .map(j => s"t${i % 7}w$j the of").mkString(" ")))
      .toDF("doc_id", "source", "lang", "text")
    def go(parts: Int) = DatasetCard.perSource(rows.repartition(parts),
      "source", "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSet
    assert(go(1) === go(13))
  }
}
