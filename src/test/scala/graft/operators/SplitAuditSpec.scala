package graft.operators

import graft.GraftSparkSpec

/** Pins [[SplitAudit.exactDupLeakage]]: split-set grouping by content,
  * sorted set rendering, and clean-vs-leaky counting.
  */
class SplitAuditSpec extends GraftSparkSpec {

  import spark.implicits._

  test("content groups report their sorted split sets with counts") {
    val df = Seq(
      ("dup text", "train"), ("dup text", "test"), ("dup text", "train"),
      ("clean a", "train"), ("clean b", "test"),
      ("tri", "train"), ("tri", "val"), ("tri", "test")).toDF("text", "split")
    val got = SplitAudit.exactDupLeakage(df, $"text", $"split")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("test,train", 1L, 3L),      // the dup-text group leaks
      ("train", 1L, 1L), ("test", 1L, 1L),
      ("test,train,val", 1L, 3L))) // full straddle, sorted rendering
  }
}
