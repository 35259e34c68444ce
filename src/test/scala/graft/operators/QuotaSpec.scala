package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class QuotaSpec extends GraftSparkSpec {
  import spark.implicits._

  /** Reference semantics, built inline (not via Quota) so both library
    * paths are checked against an independent construction.
    */
  private def reference(df: DataFrame, k: Int): Seq[Seq[Any]] = {
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id").asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("key", "id", "score", "rk")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
  }

  private def capped(df: DataFrame, k: Int): Seq[Seq[Any]] =
    Quota.capPerKey(df, Seq(col("key")), Seq(col("score").desc), col("id"), k)
      .select("key", "id", "score", "rk")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)

  private def salted(df: DataFrame, k: Int, salts: Int): Seq[Seq[Any]] =
    Quota.capPerKeySalted(df, Seq(col("key")), Seq(col("score").desc), col("id"), k, salts)
      .select("key", "id", "score", "rk")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)

  test("capPerKey's plan carries the map-side WindowGroupLimit prune") {
    val df = (1 to 100).map(i => (s"k${i % 5}", i.toLong, i % 7)).toDF("key", "id", "score")
    val plan = Quota.capPerKey(df, Seq(col("key")), Seq(col("score").desc), col("id"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected InferWindowGroupLimit to fire; plan:\n$plan")
  }

  test("both forms equal the reference on a skewed key, any salts") {
    // one hot key with 500 rows, cold keys with fewer than k rows,
    // score ties everywhere (id tiebreak carries determinism)
    val df = ((1 to 500).map(i => ("hot", i.toLong, i % 7)) ++
      (1 to 40).map(i => (s"cold${i % 9}", 1000L + i, i % 3)))
      .toDF("key", "id", "score")
    val want = reference(df, 5)
    assert(capped(df, k = 5) == want)
    for (s <- Seq(1, 3, 16)) {
      assert(salted(df, k = 5, s) == want, s"salts=$s")
    }
  }

  test("keys with fewer than k rows keep all rows; ranks are 1..n") {
    val df = Seq(("a", 1L, 9), ("a", 2L, 8), ("b", 3L, 7)).toDF("key", "id", "score")
    val out = capped(df, k = 5)
    assert(out == reference(df, 5))
    assert(out == salted(df, 5, 4))
    assert(out.map(r => (r(0), r(3))).toSet ==
      Set(("a", 1), ("a", 2), ("b", 1)))
  }

  test("k=1 keeps exactly the best row per key") {
    val df = (1 to 100).map(i => (s"k${i % 10}", i.toLong, i)).toDF("key", "id", "score")
    val out = capped(df, k = 1)
    assert(out.length == 10)
    assert(out == reference(df, 1))
    assert(out == salted(df, 1, 8))
    // best = highest score; for k${j}, highest score is the largest i with i%10==j
    assert(out.forall(r => r(2).asInstanceOf[Int] > 90))
  }
}
