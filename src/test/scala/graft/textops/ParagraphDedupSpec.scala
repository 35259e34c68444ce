package graft.textops

import graft.GraftSparkSpec

class ParagraphDedupSpec extends GraftSparkSpec {
  import spark.implicits._

  private val SEP = "\n\n"

  private def run(rows: Seq[(Long, String)], parts: Int = 4) =
    ParagraphDedup.dedupParagraphs(
      rows.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("duplicated paragraphs survive ONLY at their first (doc_id, idx)") {
    val docs = Seq(
      1L -> s"shared intro${SEP}body one",
      2L -> s"shared intro${SEP}body two",
      3L -> s"body three${SEP}shared intro")
    val got = run(docs)
    assert(got(1L) == ((2L, 0L, s"shared intro${SEP}body one")))
    assert(got(2L) == ((2L, 1L, "body two")))
    assert(got(3L) == ((2L, 1L, "body three")))
  }

  test("within-doc repeats keep the first occurrence by index") {
    val got = run(Seq(1L -> s"dup${SEP}mid${SEP}dup${SEP}dup"))
    assert(got(1L) == ((4L, 2L, s"dup${SEP}mid")))
  }

  test("matching is space-trimmed; the kept text is the original raw form") {
    val docs = Seq(
      1L -> s"  padded para  ${SEP}a1",
      2L -> s"padded para${SEP}a2",
      3L -> s"\tpadded para${SEP}a3") // tab not trimmed: distinct paragraph
    val got = run(docs)
    assert(got(1L) == ((2L, 0L, s"  padded para  ${SEP}a1")))
    assert(got(2L) == ((2L, 1L, "a2")))
    assert(got(3L) == ((2L, 0L, s"\tpadded para${SEP}a3")))
  }

  test("blank-trimmed paragraphs are structure: never counted, never dropped") {
    val docs = Seq(1L -> s"a${SEP}  ${SEP}b", 2L -> s"c${SEP}  ${SEP}d")
    val got = run(docs)
    assert(got(1L) == ((3L, 0L, s"a${SEP}  ${SEP}b")))
    assert(got(2L) == ((3L, 0L, s"c${SEP}  ${SEP}d")))
  }

  test("null text folds to one empty segment, nothing dropped") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null: String),
        org.apache.spark.sql.Row(2L, "solo")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val got = ParagraphDedup.dedupParagraphs(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((1L, 0L, "")))
    assert(got(2L) == ((1L, 0L, "solo")))
  }

  test("hot-tier (broadcast) path equals the cold-only path") {
    val docs = (1L to 300L).map(i => i -> s"hot shared para${SEP}own $i")
    val df = docs.toDF("doc_id", "text").repartition(5)
    def go(thr: Long) =
      ParagraphDedup.dedupParagraphs(df, "doc_id", "text", hotThreshold = thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
    // thr=10: the shared para (300 occurrences) rides the broadcast
    // tier; thr=100000: everything cold — identical output required
    assert(go(10) == go(100000))
    assert(go(10).count(_._3 == 1L) == 299) // dropped everywhere but first
  }

  test("an unexpectedly huge hot tier fails loudly before broadcast") {
    val docs = (1L to 40L).map(i => i -> s"dup a${SEP}dup b")
    intercept[IllegalArgumentException] {
      ParagraphDedup.dedupParagraphs(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        hotThreshold = 2, maxHotParagraphs = 1).collect()
    }
  }

  test("partitioning-insensitive: same output at 1, 4 and 13 partitions") {
    val docs = (1L to 60L).map { i =>
      val promo = if (i % 3 == 0) s"promo para$SEP" else ""
      i -> (s"universal header$SEP$promo" + s"body of doc $i${SEP}universal footer")
    }
    val base = run(docs, parts = 1)
    assert(run(docs, parts = 4) == base)
    assert(run(docs, parts = 13) == base)
  }
}
