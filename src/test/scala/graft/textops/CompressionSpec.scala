package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class CompressionSpec extends GraftSparkSpec {
  import spark.implicits._

  private def sig(text: String): (Long, Long, Long) = {
    val r = Seq(Tuple1(text)).toDF("t")
      .select(Compression.compressionSignal(col("t")).as("s"))
      .select(col("s.raw_bytes"), col("s.deflate_bytes"), col("s.ratio_x10000"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("deflate length matches the independent stream-path scorer") {
    for (t <- Seq("", "a", "spam " * 200, "the quick brown fox jumps",
      (1 to 50).map(i => s"w$i").mkString(" "))) {
      val bos = new java.io.ByteArrayOutputStream()
      val dos = new java.util.zip.DeflaterOutputStream(
        bos, new java.util.zip.Deflater(6, true))
      dos.write(t.getBytes("UTF-8")); dos.close()
      val (raw, dl, ratio) = sig(t)
      assert(raw == t.getBytes("UTF-8").length.toLong)
      assert(dl == bos.size().toLong, s"text=${t.take(20)}")
      val expect = if (raw == 0) 0L else dl * 10000L / raw
      assert(ratio == expect)
    }
  }

  test("empty and null text score ratio 0 (nothing to judge)") {
    assert(sig("")._3 == 0L)
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(Compression.compressionSignal(col("t")).as("s"))
      .select(col("s.ratio_x10000")).collect()(0)
    assert(r.getLong(0) == 0L)
  }

  test("repetition compresses, base64 soup does not") {
    val spam = "buy now " * 100
    val soup = (0 until 20).map(i => java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"x$i".getBytes))).mkString
    assert(sig(spam)._3 < 1500)
    assert(sig(soup)._3 > 6000)
  }

  test("qualityVerdict deflate gate: off by default, flags both tails when on") {
    val docs = Seq(
      (1L, ("normal english text with the usual words and it reads fine " +
        "for a quality check today") * 3),
      (2L, "buy now " * 200),
      (3L, (0 until 30).map(i => java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"y$i".getBytes))).mkString)).toDF("id", "text")
    // off: struct shape unchanged (q52's contract) — no deflate field
    val off = docs.select(TextAnalysis.qualityVerdict(col("text")).as("v"))
    assert(!off.schema("v").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("deflate_ratio_x10000"))
    // on: planted tails flag; the field rides in the struct
    val on = docs.select(col("id"), TextAnalysis.qualityVerdict(col("text"),
      TextAnalysis.QualityThresholds(deflateBounds = Some((1500, 6000)))).as("v"))
      .select(col("id"), col("v.deflate_ratio_x10000"),
        col("v.fail_reasons")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(!on(1L).contains("compressible") && !on(1L).contains("incompressible"))
    assert(on(2L).contains("too_compressible"))
    assert(on(3L).contains("incompressible"))
  }
}
