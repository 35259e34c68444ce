package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins the incremental anchor index's contract: append ≡
  * rebuild-from-union (the q140 aggregates over every ingested batch),
  * replay no-ops, tombstone + re-ingest, and compact preservation.
  */
class AnchorIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def freshDir() = {
    val d = Files.createTempDirectory("anchor-idx").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def linksDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "dst_host", "anchor")

  private val b1 = Seq(
    (1L, "a.com", "alpha site"), (1L, "a.com", "alpha site"),
    (1L, "b.com", ""), (2L, "a.com", "the alpha"), (2L, "c.com", "c page"))
  private val b2 = Seq(
    (3L, "a.com", "alpha site"), (3L, "b.com", "b now has text"),
    (4L, "c.com", "c page"), (4L, "c.com", "c page"))
  private val b3 = Seq((5L, "d.com", "brand new host"))

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("append equals rebuild-from-union after every batch") {
    val dir = freshDir()
    AnchorIndex.build(linksDf(b1), "doc_id", dir)
    assert(agg(AnchorIndex.aggregates(spark, dir)) ===
      agg(LinkExtract.aggregateAnchors(linksDf(b1), "doc_id")))
    AnchorIndex.append(linksDf(b2), "doc_id", dir)
    assert(agg(AnchorIndex.aggregates(spark, dir)) ===
      agg(LinkExtract.aggregateAnchors(linksDf(b1 ++ b2), "doc_id")))
    AnchorIndex.append(linksDf(b3), "doc_id", dir)
    assert(agg(AnchorIndex.aggregates(spark, dir)) ===
      agg(LinkExtract.aggregateAnchors(linksDf(b1 ++ b2 ++ b3), "doc_id")))
  }

  test("a replayed batch is a no-op (at-least-once delivery)") {
    val dir = freshDir()
    AnchorIndex.build(linksDf(b1), "doc_id", dir)
    AnchorIndex.append(linksDf(b2), "doc_id", dir)
    val before = agg(AnchorIndex.aggregates(spark, dir))
    AnchorIndex.append(linksDf(b2), "doc_id", dir) // replay
    assert(agg(AnchorIndex.aggregates(spark, dir)) === before)
  }

  test("tombstone a re-fetched doc, re-append its fresh links, compact") {
    val dir = freshDir()
    AnchorIndex.build(linksDf(b1), "doc_id", dir)
    AnchorIndex.append(linksDf(b2), "doc_id", dir)
    // doc 1 re-fetched: its old links retract (tombstones suppress the
    // id everywhere until compact — the IndexOps contract)
    AnchorIndex.remove(Seq(1L).toDF("doc_id"), "doc_id", dir)
    val retracted = agg(LinkExtract.aggregateAnchors(
      linksDf(b1.filterNot(_._1 == 1L) ++ b2), "doc_id"))
    assert(agg(AnchorIndex.aggregates(spark, dir)) === retracted)
    // compact applies tombstones physically, clears them, and must not
    // change the view
    AnchorIndex.compact(spark, dir)
    assert(agg(AnchorIndex.aggregates(spark, dir)) === retracted)
    // AFTER compact the id is clean and the fresh fetch can re-ingest
    val fresh1 = Seq((1L, "a.com", "renamed anchor"), (1L, "d.com", "new link"))
    AnchorIndex.append(linksDf(fresh1), "doc_id", dir)
    val want = agg(LinkExtract.aggregateAnchors(
      linksDf(b1.filterNot(_._1 == 1L) ++ b2 ++ fresh1), "doc_id"))
    assert(agg(AnchorIndex.aggregates(spark, dir)) === want)
    // and a replay of the re-ingested batch is still a no-op
    AnchorIndex.append(linksDf(fresh1), "doc_id", dir)
    assert(agg(AnchorIndex.aggregates(spark, dir)) === want)
  }

  test("hosts with only empty anchors carry a null modal anchor") {
    val dir = freshDir()
    AnchorIndex.build(linksDf(Seq((7L, "img.com", ""), (8L, "img.com", ""))),
      "doc_id", dir)
    val r = AnchorIndex.aggregates(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_links") === 2L)
    assert(r.head.getAs[Long]("n_anchors") === 0L)
    assert(r.head.isNullAt(r.head.fieldIndex("top_anchor")))
  }
}
