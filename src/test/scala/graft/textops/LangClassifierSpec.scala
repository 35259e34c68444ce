package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins the q135 trained language-ID contract: held-out confusion
  * matrix (train on one slice, evaluate on unseen docs), determinism
  * under repartitioning, and the degenerate-input edges.
  */
class LangClassifierSpec extends GraftSparkSpec {
  import spark.implicits._

  private val pools = graft.SparkEntry.langPools
  private val langs = graft.SparkEntry.langPoolOrder

  // synthetic labeled corpus straight from the shared pools: ids 0..399
  private lazy val labeled = (0L until 400L).map { id =>
    val (label, text) = graft.SparkEntry.langText(id)
    (id, label, text)
  }.toDF("doc_id", "label", "text")

  test("held-out confusion matrix: >= 95% accuracy, every class present") {
    val model = LangClassifier.train(
      labeled.filter(col("doc_id") % 7 < 5), "text", "label", "doc_id")
    assert(model.classes.toSeq === langs.sorted)
    val heldOut = labeled.filter(col("doc_id") % 7 >= 5)
      .select(col("doc_id"), col("label"),
        LangClassifier.lang_score(spark, col("text"), model).as("_s"))
      .select(col("label"), col("_s.pred").as("pred"))
    val confusion = heldOut.groupBy("label", "pred").count()
      .as[(String, String, Long)].collect()
      .map { case (l, p, n) => (l, p) -> n }.toMap
    val total = confusion.values.sum
    val correct = confusion.collect { case ((l, p), n) if l == p => n }.sum
    assert(total > 0)
    val acc = correct.toDouble / total
    assert(acc >= 0.95, s"held-out accuracy $acc; confusion=$confusion")
    for (l <- langs)
      assert(confusion.keys.exists(_._1 == l), s"class $l missing from held-out")
  }

  test("scoring is deterministic under repartitioning") {
    val model = LangClassifier.train(labeled, "text", "label", "doc_id")
    def run(parts: Int) = labeled.repartition(parts)
      .select(col("doc_id"),
        LangClassifier.lang_score(spark, col("text"), model).as("_s"))
      .select(col("doc_id"), col("_s.pred"), col("_s.score"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(13))
  }

  test("empty and null text score sigmoid-of-bias deterministically") {
    val model = LangClassifier.train(labeled, "text", "label", "doc_id")
    val rows = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        LangClassifier.lang_score(spark, col("text"), model).as("_s"))
      .select(col("doc_id"), col("_s.pred"), col("_s.score"))
      .collect()
    // empty text scores; null text is null-propagated by the expression
    assert(rows.length === 2)
    val empty = rows.find(_.getLong(0) == 1L).get
    assert(model.classes.contains(empty.getString(1)))
    assert(rows.find(_.getLong(0) == 2L).get.isNullAt(1) ||
      model.classes.contains(rows.find(_.getLong(0) == 2L).get.getString(1)))
  }

  test("rejects a single-class slice") {
    val one = labeled.filter(col("label") === "en")
    val e = intercept[IllegalArgumentException] {
      LangClassifier.train(one, "text", "label", "doc_id")
    }
    assert(e.getMessage.contains("classes"))
  }
}
