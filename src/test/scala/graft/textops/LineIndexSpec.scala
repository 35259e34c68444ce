package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class LineIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def docs(ids: Range, banner: Long => String) =
    ids.map(i => (i.toLong, s"${banner(i.toLong)}body ${i % 7}\nu$i\nshared footer"))
      .toDF("doc_id", "text")

  private def plainDocs(ids: Range) = docs(ids, _ => "")

  private def hotOf(dir: String, minDf: Long): Set[Long] =
    LineDedup.lineIndexDf(spark, dir).filter(col("df") >= minDf)
      .select("lh").collect().map(_.getLong(0)).toSet

  private def directDf(union: DataFrame): Map[Long, Long] =
    union.select(col("doc_id"),
      explode(split(coalesce(col("text"), lit("")), "\n", -1)).as("raw"))
      .select(col("doc_id"), trim(col("raw")).as("t"))
      .filter(col("t") =!= "").distinct()
      .groupBy(xxhash64(col("t")).as("lh")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("append batches: index df counts equal the union recomputation; replay is a no-op") {
    val dir = Files.createTempDirectory("graft_lineidx").toString
    val b1 = plainDocs(1 to 20)
    val b2 = plainDocs(21 to 50)
    LineDedup.buildLineIndex(b1, "doc_id", "text", dir)
    LineDedup.appendToLineIndex(b2, "doc_id", "text", dir)
    val got = LineDedup.lineIndexDf(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == directDf(b1.union(b2)))
    // replayed batch (at-least-once delivery): nothing double-counts
    LineDedup.appendToLineIndex(b2, "doc_id", "text", dir)
    val replayed = LineDedup.lineIndexDf(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed == got)
  }

  test("cleanAgainstLineIndex equals the broadcast form run on the ingested union") {
    val dir = Files.createTempDirectory("graft_lineidx2").toString
    val b1 = plainDocs(1 to 30)
    val b2 = plainDocs(31 to 60)
    LineDedup.buildLineIndex(b1, "doc_id", "text", dir)
    LineDedup.appendToLineIndex(b2, "doc_id", "text", dir)
    val probe = plainDocs(200 to 220)
    val viaIndex = LineDedup.cleanAgainstLineIndex(
      probe, "doc_id", "text", dir, minDf = 10)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // broadcast form needs the hot set from the SAME corpus: run it on
    // union + probe won't match (probe lines add df) — instead rebuild
    // the hot set semantics by cleaning probe against union-derived
    // boilerplate via the join twin on union, then compare hot hashes
    val wantHot = directDf(b1.union(b2)).filter(_._2 >= 10).keySet
    assert(hotOf(dir, 10) == wantHot)
    // and the cleaned text drops exactly the hot lines
    val direct = probe.select(col("doc_id"),
      split(coalesce(col("text"), lit("")), "\n", -1).as("ls"))
      .collect().map { r =>
        val ls = r.getSeq[String](1)
        val kept = ls.filter(l => {
          val t = l.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
          t.isEmpty || !wantHot.contains(LineDedup.lineHash(t))
        })
        Seq(r.getLong(0), ls.length.toLong,
          (ls.length - kept.length).toLong, kept.mkString("\n"))
      }.sortBy(_.toString).toSeq
    assert(viaIndex == direct)
  }

  test("removeFromLineIndex decrements df; removal replay is a no-op; cooled lines survive cleaning") {
    val dir = Files.createTempDirectory("graft_lineidx3").toString
    // banner appears in docs 1..12 -> df 12
    val b = docs(1 to 30, i => if (i <= 12) "hot banner\n" else "")
    LineDedup.buildLineIndex(b, "doc_id", "text", dir)
    val bannerHash = LineDedup.lineHash("hot banner")
    assert(hotOf(dir, 10).contains(bannerHash))
    // remove 5 banner docs -> df 7 < 10: no longer hot
    val gone = docs(1 to 5, _ => "hot banner\n")
    LineDedup.removeFromLineIndex(gone, "doc_id", "text", dir)
    assert(!hotOf(dir, 10).contains(bannerHash))
    LineDedup.removeFromLineIndex(gone, "doc_id", "text", dir) // replay
    assert(LineDedup.lineIndexDf(spark, dir)
      .filter(col("lh") === bannerHash).collect()(0).getLong(1) == 7L)
    // a doc never ingested contributes no decrements
    LineDedup.removeFromLineIndex(
      docs(500 to 505, _ => "hot banner\n"), "doc_id", "text", dir)
    assert(LineDedup.lineIndexDf(spark, dir)
      .filter(col("lh") === bannerHash).collect()(0).getLong(1) == 7L)
    // cleaning a banner doc now keeps the cooled banner line
    val cleaned = LineDedup.cleanAgainstLineIndex(
      Seq((999L, "hot banner\nunique\nshared footer")).toDF("doc_id", "text"),
      "doc_id", "text", dir, minDf = 10).collect()(0)
    assert(cleaned.getLong(2) == 1L, "footer (still hot) drops; cooled banner stays")
    assert(cleaned.getString(3) == "hot banner\nunique")
  }

  test("compact merges deltas, preserves counts, bounds files, heals a half-swap") {
    val dir = Files.createTempDirectory("graft_lineidx4").toString
    LineDedup.buildLineIndex(plainDocs(1 to 20), "doc_id", "text", dir)
    for (b <- 0 until 4)
      LineDedup.appendToLineIndex(
        plainDocs((21 + b * 10) to (30 + b * 10)), "doc_id", "text", dir)
    LineDedup.removeFromLineIndex(plainDocs(1 to 3), "doc_id", "text", dir)
    val before = LineDedup.lineIndexDf(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    LineDedup.compactLineIndex(spark, dir, targetFiles = 2)
    val after = LineDedup.lineIndexDf(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before)
    // compacted: one net row per line hash
    val rows = spark.read.parquet(s"$dir/counts.parquet").count()
    assert(rows == after.size.toLong, "one net row per surviving hash")
    // crash healing: simulate live-missing/.bak-present, re-run
    val f = new java.io.File(s"$dir/counts.parquet")
    assert(f.renameTo(new java.io.File(s"$dir/counts.parquet.bak")))
    LineDedup.compactLineIndex(spark, dir, targetFiles = 2)
    val healed = LineDedup.lineIndexDf(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(healed == before)
  }
}
