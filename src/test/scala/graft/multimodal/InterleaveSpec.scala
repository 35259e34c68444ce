package graft.multimodal

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class InterleaveSpec extends GraftSparkSpec {
  import spark.implicits._

  private val text = Seq(
    (1L, 0L, "alpha beta", 2L), (1L, 2L, "gamma delta", 2L),
    (2L, 0L, "solo chunk here", 3L),
    (3L, 0L, "big doc", 2L), (3L, 2L, "more text", 2L), (3L, 4L, "tail", 1L))
    .toDF("id", "pos", "content", "seg_tokens")
  private val media = Seq(
    (1L, 1L, 101L, "image", 64L), // between chunk 0 and chunk 1
    (2L, 9L, 102L, "video", 256L), // anchor beyond last chunk -> ends last
    (4L, 1L, 104L, "audio", 128L)) // media-only doc
    .toDF("id", "pos", "media_id", "kind", "seg_tokens")

  test("media lands after its anchor chunk; totals ride every row") {
    val out = Interleave.interleave(text, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(6), r.getLong(7)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._3, x._4, x._5)).toSeq).toMap
    assert(out(1L) == Seq(("text", 3L, 68L), ("image", 3L, 68L), ("text", 3L, 68L)))
    assert(out(2L) == Seq(("text", 2L, 259L), ("video", 2L, 259L)))
    assert(out(3L).map(_._1) == Seq("text", "text", "text"))
    assert(out(4L) == Seq(("audio", 1L, 128L))) // media-only doc survives
  }

  test("size guard drops oversized docs whole") {
    val wide = (0 until 30).map(i => (9L, i.toLong * 2, s"c$i", 1L))
      .toDF("id", "pos", "content", "seg_tokens")
    val out = Interleave.interleave(
      wide.union(text.filter(col("id") === 1L)),
      media.filter(col("id") === 1L), maxSegments = 10)
    val ids = out.select("id").distinct().as[Long].collect().toSet
    assert(ids == Set(1L)) // doc 9 (30 segs) dropped whole
  }

  test("mediaTokenCost plan constants") {
    val r = Seq("image", "audio", "video", "other").toDF("k")
      .select(Interleave.mediaTokenCost(col("k"))).as[Long].collect().toSeq
    assert(r == Seq(64L, 128L, 256L, 0L))
  }
}
