package graft.textops

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.GraftSparkSpec

class WinnowingSpec extends GraftSparkSpec {
  import spark.implicits._

  private def fps(s: String, k: Int = 5, w: Int = 4): Seq[Long] = {
    val a = Winnowing.eval(UTF8String.fromString(s), k, w)
    if (a == null) Seq.empty else a.toLongArray().toSeq
  }

  test("deterministic, case-insensitive, null under k chars") {
    assert(fps("Hello Winnowing World") == fps("hello winnowing world"))
    assert(fps("abcd", k = 5).isEmpty)
    assert(fps("abcde", k = 5).nonEmpty)
  }

  test("guarantee: docs sharing a long run share a fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val a = fps("AAAA " + shared + " BBBB").toSet
    val b = fps("XXXXXXX " + shared + " YYY").toSet
    assert((a & b).nonEmpty, "shared passage must yield a common fingerprint")
    val c = fps("totally unrelated content with no overlap at all zzz").toSet
    assert((a & c).isEmpty || (a & c).size < (a & b).size)
  }

  test("column API works over documents and is selective") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.select(Winnowing.winnow_fingerprints(col("text")).as("fp"))
      .selectExpr("size(fp) AS n").agg(min("n"), max("n")).head
    assert(n.getInt(0) > 0)
  }
}
