package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[TextAnalysis.charEntropy]] (the codegen'd row-local fold,
  * q131's gate) bit-identical to q130's shuffle-based sorted-histogram
  * formulation — same addition order, same StrictMath log2 — and its
  * edge semantics (NULL on empty/null, multi-byte code points).
  */
class CharEntropySpec extends GraftSparkSpec {
  import spark.implicits._

  private def histogramEntropy(texts: Seq[(Long, String)]): Map[Long, Double] = {
    // q130's formulation: per-(doc, char) counts, fold n*log2(n) in
    // sorted-char order, H = log2(N) - acc/N
    val fx = texts.toDF("doc_id", "ftext")
    val pairs = fx
      .select(col("doc_id"), explode(split(col("ftext"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("n"))
    pairs.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("ch"), col("n")))).as("_a"),
        sum(col("n")).as("n_chars"))
      .select(col("doc_id"),
        (log2(col("n_chars").cast("double")) -
          aggregate(col("_a"), lit(0.0), (acc, x) =>
            acc + x.getField("n").cast("double") *
              log2(x.getField("n").cast("double"))) /
            col("n_chars").cast("double")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("bit-identical to the q130 sorted-histogram fold") {
    val texts: Seq[(Long, String)] = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a aa ab ba bb aab abb bab bba aaa bbb aabb abba baab babb",
      3L -> "aaaaaaaaaaaaaaaaaaaa",
      4L -> "café résumé naïve —•", // multi-byte code points
      5L -> "x",
      6L -> ("z" * 1000 + "q" * 3 + " mixed tail with words"),
      7L -> (0 until 200).map(i => ('a' + i % 26).toChar).mkString)
    val expected = histogramEntropy(texts)
    val got = texts.toDF("doc_id", "t")
      .select(col("doc_id"), TextAnalysis.charEntropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expected.keySet)
    for ((id, h) <- expected)
      assert(java.lang.Double.doubleToLongBits(got(id)) ===
        java.lang.Double.doubleToLongBits(h), s"doc $id")
  }

  test("NULL on empty and null input; single-char text is exactly 0") {
    val rows = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "bbbb"))
      .toDF("doc_id", "t")
      .select(col("doc_id"), TextAnalysis.charEntropy(col("t")).as("h"))
      .collect()
    assert(rows.filter(_.getLong(0) <= 2).forall(_.isNullAt(1)))
    assert(rows.find(_.getLong(0) == 3L).get.getDouble(1) === 0.0)
  }

  test("partitioning invariance") {
    val df = (0L until 200L).map(i => (i, s"doc $i " + ("ab" * (i % 17).toInt)))
      .toDF("doc_id", "t")
    val a = df.repartition(1)
      .select(col("doc_id"), TextAnalysis.charEntropy(col("t")).as("h"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = df.repartition(13)
      .select(col("doc_id"), TextAnalysis.charEntropy(col("t")).as("h"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a === b)
  }
}
