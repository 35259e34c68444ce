package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class DataChecksSpec extends GraftSparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("ok"), 5),
    (2L, None, 5),        // null text
    (3L, Some("ok"), -1), // bad score
    (4L, Some(""), 5))
    .map { case (i, t, s) => (i, t.orNull, s) }
    .toDF("id", "text", "score")

  private def run(rules: Seq[(String, org.apache.spark.sql.Column)]) =
    DataChecks.checkRules(df.repartition(3), "id", rules)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap

  test("violations count FALSE rows and the min violating id is reported") {
    val got = run(Seq(
      "score_positive" -> (col("score") > 0),
      "text_nonempty" -> (length(col("text")) > 0)))
    assert(got("score_positive") == ((4L, 1L, 2500L, 3L)))
    // row 2 (null text -> null predicate) AND row 4 (empty) violate
    assert(got("text_nonempty") == ((4L, 2L, 5000L, 2L)))
  }

  test("a NULL predicate is a violation — the null-escape contract") {
    val got = run(Seq("null_pred" -> (col("text") === "ok")))
    // rows 1,4? row 1 'ok' passes, row 4 '' FALSE, row 2 NULL -> both violate
    assert(got("null_pred")._2 == 2L)
  }

  test("a rule nothing violates reports zero and a null id") {
    val got = run(Seq("ids_positive" -> (col("id") > 0)))
    assert(got("ids_positive") == ((4L, 0L, 0L, -1L)))
  }

  test("rule names with dots and backticks are plain labels, not paths") {
    // positional internal aliases: a dotted name must not resolve as
    // a struct-field path (round-10 advice)
    val got = run(Seq("host.nonnull" -> (col("id") > 0),
      "weird`tick" -> (col("id") > 2)))
    assert(got("host.nonnull")._2 == 0L)
    assert(got("weird`tick")._1 == 4L)
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      DataChecks.checkRules(df, "id",
        Seq("r" -> (col("id") > 0), "r" -> (col("id") < 0)))
    }
  }
}
