package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class HeavyHittersSpec extends GraftSparkSpec {
  import spark.implicits._

  test("capacity >= distinct: estimates are exact, any partitioning") {
    val terms = (1 to 2000).map(i => s"t${i % 17}").toDF("term")
    val exact = terms.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 5, 32)) {
      val got = HeavyHitters.topK(terms.repartition(parts), "term",
        capacity = 64, k = 100)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(got == exact, s"parts=$parts")
    }
  }

  test("rank order is (est desc, term asc); k caps the output") {
    val terms = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("c"))
      .toDF("term")
    val got = HeavyHitters.topK(terms, "term", capacity = 16, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "a", 5L), (2L, "b", 5L)))
  }

  test("over capacity: undercount bounded by n/(cap+1); heavy item survives") {
    // 1000 of "hot", 1 each of 400 noise terms -> n = 1400, cap = 9
    val terms = (Seq.fill(1000)("hot") ++ (1 to 400).map(i => s"noise$i"))
      .toDF("term")
    val got = HeavyHitters.topK(terms.repartition(7), "term", capacity = 9, k = 9)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val bound = 1400.0 / 10
    assert(got.contains("hot"), "true heavy hitter must be present")
    assert(got("hot") <= 1000L && got("hot") >= 1000L - bound,
      s"estimate ${got("hot")} must undercount by <= $bound")
    got.foreach { case (t, est) =>
      val truth = if (t == "hot") 1000L else 1L
      assert(est <= truth, s"$t overcounted: $est > $truth")
    }
  }
}
