package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class LineDedupSpec extends GraftSparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minDf: Long, parts: Int = 4) =
    LineDedup.removeBoilerplate(
      rows.toDF("doc_id", "text").repartition(parts), "doc_id", "text", minDf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("lines at df >= minDf vanish from EVERY doc; unique lines survive") {
    val docs = (1L to 6L).map { i =>
      val banner = if (i <= 3) "banner line\n" else ""
      i -> s"${banner}body $i\nfooter line"
    }
    val got = run(docs, minDf = 3)
    // footer (df 6) and banner (df 3) dropped everywhere incl. first doc
    assert(got(1L) == ((3L, 2L, "body 1")))
    assert(got(3L) == ((3L, 2L, "body 3")))
    assert(got(4L) == ((2L, 1L, "body 4")))
    assert(got(6L) == ((2L, 1L, "body 6")))
  }

  test("df = minDf - 1 is kept: the threshold is inclusive at minDf") {
    val docs = Seq(1L -> "rare\na1", 2L -> "rare\na2", 3L -> "b3")
    val got = run(docs, minDf = 3)
    assert(got(1L) == ((2L, 0L, "rare\na1")))
  }

  test("matching is on the space-trimmed line; output keeps the original") {
    val docs = Seq(
      1L -> "  footer  \nkeep1", 2L -> "footer\nkeep2", 3L -> "footer \nkeep3",
      4L -> "\tfooter\nkeep4") // tab is NOT trimmed: distinct line, df 1
    val got = run(docs, minDf = 3)
    assert(got(1L) == ((2L, 1L, "keep1")))
    assert(got(2L) == ((2L, 1L, "keep2")))
    assert(got(4L) == ((2L, 0L, "\tfooter\nkeep4")), "space-only trim: tab line distinct")
  }

  test("blank-trimmed lines are never counted and never removed") {
    val docs = (1L to 5L).map(i => i -> s"a $i\n   \n\nb $i")
    val got = run(docs, minDf = 2)
    assert(got(2L) == ((4L, 0L, "a 2\n   \n\nb 2")))
  }

  test("a doc counts once per distinct line; repeats within a doc do not inflate df") {
    val docs = Seq(1L -> "dup\ndup\ndup\nu1", 2L -> "dup\nu2", 3L -> "u3")
    // df(dup) = 2 docs < 3 -> kept everywhere
    assert(run(docs, minDf = 3)(1L) == ((4L, 0L, "dup\ndup\ndup\nu1")))
    // at minDf = 2 every occurrence goes, including the in-doc repeats
    assert(run(docs, minDf = 2)(1L) == ((4L, 3L, "u1")))
  }

  test("null text folds to '' (1 line, 0 dropped); trailing empties count") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null: String),
        org.apache.spark.sql.Row(2L, "x\n"),
        org.apache.spark.sql.Row(3L, "x\n")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val got = LineDedup.removeBoilerplate(df, "doc_id", "text", minDf = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((1L, 0L, "")))
    assert(got(2L) == ((2L, 1L, "")), "x dropped (df 2); trailing empty line kept")
  }

  test("partitioning-insensitive") {
    val docs = (1L to 40L).map { i =>
      i -> s"shared header\nbody ${i % 7}\nu$i\nshared footer"
    }
    val a = run(docs, minDf = 5, parts = 1)
    val b = run(docs, minDf = 5, parts = 7)
    assert(a == b)
  }

  test("join-based twin equals the broadcast form, including edge rows") {
    val docs = (1L to 60L).map { i =>
      val banner = if (i % 3 == 0) "promo banner\n" else ""
      i -> s"nav | home | about\n$banner  body ${i % 11}  \n\nu$i\nfooter (c)"
    } :+ (61L -> "") :+ (62L -> "x\n")
    val df = docs.toDF("doc_id", "text").repartition(5)
    val a = LineDedup.removeBoilerplate(df, "doc_id", "text", minDf = 10)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = LineDedup.removeBoilerplateJoin(df, "doc_id", "text", minDf = 10)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }

  test("boilerplate set larger than maxBoilerplateLines fails loudly") {
    val docs = (1L to 4L).flatMap(d => Seq(d -> "h1\nh2\nh3"))
    val e = intercept[IllegalArgumentException] {
      LineDedup.removeBoilerplate(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        minDf = 2, maxBoilerplateLines = 2)
    }
    assert(e.getMessage.contains("maxBoilerplateLines"))
  }
}
