package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Join-based decontamination against a persisted eval span index must
  * equal the broadcast form row-for-row — same flags, overlap counts,
  * and trimmed text.
  */
class DecontamIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private val probe = "held out benchmark question about nothing in particular today"

  test("decontaminateAgainstIndex equals the broadcast decontaminate") {
    val evals = Seq(probe, "another evaluation prompt with at least eight tokens inside")
      .map(Tuple1(_)).toDF("text")
    val corpus = Seq(
      1L -> ("intro " + probe + " outro"),
      2L -> "a perfectly clean document with no overlap whatsoever here",
      3L -> probe,
      4L -> "short doc").toDF("doc_id", "text")
    val dir = Files.createTempDirectory("decontam_idx").toString
    SpanDedup.buildSpanIndex(
      evals.withColumn("doc_id", monotonically_increasing_id()),
      "doc_id", "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4), r.getString(5))))
        .toMap
    val viaIndex = rows(SpanDedup.decontaminateAgainstIndex(
      corpus, "doc_id", "text", dir))
    val viaBroadcast = rows(SpanDedup.decontaminate(
      corpus, "doc_id", "text", evals, "text"))
    assert(viaIndex == viaBroadcast)
    assert(viaIndex(1L)._3 === true && viaIndex(1L)._5 === "intro outro")
    assert(viaIndex(3L)._5 === "")
    assert(viaIndex(2L)._3 === false && viaIndex(4L)._3 === false)
  }

  test("append-grown eval index (duplicate window rows) still equals broadcast; prune-off too") {
    val evalA = Seq(Tuple1(probe)).toDF("text").withColumn("doc_id", lit(0L))
    // second eval batch SHARES the probe window hashes (same text)
    val evalB = Seq(Tuple1(probe + " extra tail tokens")).toDF("text")
      .withColumn("doc_id", lit(1L))
    val dir = Files.createTempDirectory("decontam_idx3").toString
    SpanDedup.buildSpanIndex(evalA, "doc_id", "text", dir)
    SpanDedup.appendToSpanIndex(evalB, "doc_id", "text", dir)
    val corpus = Seq(1L -> ("intro " + probe + " outro")).toDF("doc_id", "text")
    val broadcastForm = SpanDedup.decontaminate(
      corpus, "doc_id", "text",
      evalA.select("text").unionByName(evalB.select("text")), "text")
      .collect().map(_.toSeq).toSet
    for (prune <- Seq(true, false)) {
      val viaIndex = SpanDedup.decontaminateAgainstIndex(
        corpus, "doc_id", "text", dir, bucketPrune = prune)
        .collect().map(_.toSeq).toSet
      assert(viaIndex == broadcastForm, s"bucketPrune=$prune")
    }
  }

  test("missing window file (ledger-only eval index) flags nothing") {
    val dir = Files.createTempDirectory("decontam_idx2").toString
    SpanDedup.buildSpanIndex(
      Seq(Tuple1(probe)).toDF("text").withColumn("doc_id", lit(0L)),
      "doc_id", "text", dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/windows.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val out = SpanDedup.decontaminateAgainstIndex(
      Seq(1L -> probe).toDF("doc_id", "text"), "doc_id", "text", dir)
      .collect().head
    assert(out.getBoolean(3) === false && out.getString(5).nonEmpty)
  }
}
