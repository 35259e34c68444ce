package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class QualityClassifierSpec extends GraftSparkSpec {
  import spark.implicits._

  private val goodTexts = Seq(
    "the quarterly report shows steady growth across all regions",
    "researchers published a detailed study of coastal erosion patterns",
    "the committee approved the updated budget after a long debate",
    "a new library branch opened downtown with extended evening hours",
    "engineers completed the bridge inspection ahead of schedule")
  private val spam = "buy cheap pills online now click here win free money"

  /** 200 labeled docs: every 4th is spam (label=false). */
  private def corpus() =
    (0 until 200).map { i =>
      if (i % 4 == 0) (i.toLong, (spam + " ") * 5, false)
      else (i.toLong, goodTexts(i % goodTexts.length) + s" item $i", true)
    }.toDF("id", "text", "label")

  test("separates planted spam from text on held-out docs") {
    val df = corpus()
    val wts = QualityClassifier.train(
      df.filter(col("id") % 10 < 3), "text", "label", "id")
    val got = df.select(col("id"), col("label"),
      QualityClassifier.quality_score(spark, col("text"), wts).as("q"))
      .select(col("id"), col("label"), col("q.pred").as("pred"))
      .collect().map(r => (r.getBoolean(1), r.getBoolean(2)))
    assert(got.nonEmpty)
    val acc = got.count { case (l, p) => l == p }.toDouble / got.length
    assert(acc == 1.0, s"classifier accuracy $acc < 1.0 on separable fixture")
  }

  test("training is deterministic and scoring is bit-reproducible") {
    val df = corpus()
    val slice = df.filter(col("id") % 10 < 3)
    val w1 = QualityClassifier.train(slice, "text", "label", "id")
    val w2 = QualityClassifier.train(slice, "text", "label", "id")
    assert(w1.bias == w2.bias)
    assert(w1.w.toSeq == w2.w.toSeq)
    def scores(w: QualityClassifier.Weights): Seq[(Long, Double)] =
      df.select(col("id"),
        QualityClassifier.quality_score(spark, col("text"), w).as("q"))
        .select(col("id"), col("q.score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(scores(w1) == scores(w2))
  }

  test("empty document scores sigmoid(bias); null text yields null") {
    val wts = QualityClassifier.train(corpus(), "text", "label", "id")
    val df = Seq((1L, ""), (2L, null)).toDF("id", "text")
    val got = df.select(col("id"),
      QualityClassifier.quality_score(spark, col("text"), wts).as("q"))
      .collect().sortBy(_.getLong(0))
    val expectedEmpty = 1.0 / (1.0 + math.exp(-wts.bias))
    assert(got(0).getStruct(1).getDouble(0) == expectedEmpty)
    assert(got(1).isNullAt(1))
  }

  test("oversized labeled slice fails loudly") {
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(corpus(), "text", "label", "id", maxDocs = 10)
    }
    assert(e.getMessage.contains("maxDocs"))
  }

  test("feature hashing: floorMod keeps negative hashes in range") {
    for (f <- Seq("a", "zz", "spam spam", "é中")) {
      val i = QualityClassifier.featureIndex(f, 1 << 16)
      assert(i >= 0 && i < (1 << 16))
    }
  }
}
