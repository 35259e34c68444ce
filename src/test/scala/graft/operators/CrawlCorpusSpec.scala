package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{GraftSparkSpec, SparkEntry}

/** Pins the q131 crawl->corpus fixture semantics the generated oracle
  * relies on: which plants fire, that mojibake repair touches ONLY the
  * planted prefix docs, that the gates drop exactly the planted
  * regimes, and that canonical-URL dedup keeps the smallest doc_id per
  * mod-400 collision group. (The full WARC round trip + every
  * downstream stage is oracle-gated as q131_crawl_corpus.)
  */
class CrawlCorpusSpec extends GraftSparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("crawl-spec").toFile
    d.deleteOnExit()
    // 460 docs of plain prose so every mod-rule arm (13/19/17/11/97,
    // url mod 400) has instances; text is ASCII and > 10 tokens
    (0L until 460L).map(i => (i,
      s"plain prose document number $i with the kind of ordinary " +
        "wording that these filters keep when nothing is planted here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d.getAbsolutePath
  }

  private lazy val gated = SparkEntry.crawlGated(
    SparkEntry.crawlPages(spark, dir)
      .select(col("doc_id"), col("page_url").as("target_uri"), col("html")))

  test("plants fire exactly per rule: soup/bullet dropped, prose kept") {
    val keptIds = gated.select("doc_id").as[Long].collect().toSet
    for (i <- 0L until 460L) {
      val soup = i % 19 == 4
      val bullet = i % 17 == 2 && !soup
      if (soup || bullet)
        assert(!keptIds.contains(i), s"doc $i (soup=$soup bullet=$bullet)")
      else assert(keptIds.contains(i), s"doc $i should pass the gates")
    }
  }

  test("mojibake repair fires exactly on the planted-prefix docs") {
    val rows = gated.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toMap
    for ((id, text) <- rows) {
      val planted = id % 11 == 3 && id % 19 != 4 && id % 17 != 2
      assert(text.startsWith(SparkEntry.crawlMojiFixed) == planted, s"doc $id")
      assert(!text.contains("Ã"), s"doc $id still mojibake")
    }
  }

  test("boilerplate blocks never reach the extracted text") {
    val bad = gated.filter(col("text").contains("subscribe to our") ||
      col("text").contains("copyright example corp") ||
      col("text").contains("Contact menu links") ||
      col("text").contains("Short note.")).count()
    assert(bad === 0L)
  }

  test("canonical-URL dedup keeps the smallest doc_id per mod-400 group") {
    val dd = SparkEntry.crawlUrlDeduped(gated)
    val ids = dd.select("doc_id").as[Long].collect().toSet
    val survivors = gated.select("doc_id").as[Long].collect().toSet
    val expected = survivors.groupBy(_ % 400).values.map(_.min).toSet
    assert(ids === expected)
    // lang/text survive the dedup projection
    assert(dd.columns.toSeq === Seq("doc_id", "lang_pred", "text"))
  }
}
