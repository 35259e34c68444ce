package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[Funnel.report]]: waterfall attribution (first-fail sums to
  * the total drop), marginal unique-fail, the retention curve, the
  * FALSE-or-NULL fail contract, and the one-aggregation plan shape.
  */
class FunnelSpec extends GraftSparkSpec {

  import spark.implicits._

  // hand-computable fixture: columns a, b as Integer (nullable)
  //   id 1: a=5  b=5   -> passes both
  //   id 2: a=0  b=5   -> fails gateA only  (first=A, unique=A)
  //   id 3: a=5  b=0   -> fails gateB only  (first=B, unique=B)
  //   id 4: a=0  b=0   -> fails both        (first=A, unique none)
  //   id 5: a=null b=5 -> null-escape: fails gateA (first=A, unique=A)
  private val df = Seq(
    (1L, Option(5), Option(5)),
    (2L, Option(0), Option(5)),
    (3L, Option(5), Option(0)),
    (4L, Option(0), Option(0)),
    (5L, Option.empty[Int], Option(5))).toDF("id", "a", "b")

  test("waterfall, marginal, retention and null-escape on the hand fixture") {
    val rep = Funnel.report(df,
      Seq("gateA" -> ($"a" > 0), "gateB" -> ($"b" > 0)))
      .orderBy("gate_ord").collect()
    assert(rep.length === 2)
    val a = rep(0); val b = rep(1)
    assert(a.getString(1) === "gateA" && b.getString(1) === "gateB")
    assert(a.getLong(2) === 5L && b.getLong(2) === 5L) // n_rows
    assert(a.getLong(3) === 3L) // gateA n_fail: ids 2,4,5
    assert(b.getLong(3) === 2L) // gateB n_fail: ids 3,4
    assert(a.getLong(4) === 3L && b.getLong(4) === 1L) // first-fail
    // first-fail sums to the total drop count (4 dropped rows)
    assert(a.getLong(4) + b.getLong(4) === 4L)
    assert(a.getLong(5) === 2L) // unique to gateA: ids 2,5
    assert(b.getLong(5) === 1L) // unique to gateB: id 3
    assert(a.getLong(6) === 2L) // survive gateA: ids 1,3
    assert(b.getLong(6) === 1L) // survive both: id 1
  }

  test("single gate degenerates to a plain conditional count") {
    // fails: ids 2, 4 (a=0) and 5 (null-escape) -> 3; survives: ids 1, 3
    val rep = Funnel.report(df, Seq("pos" -> ($"a" > 0))).collect()
    assert(rep.length === 1)
    assert(rep(0).getLong(3) === 3L && rep(0).getLong(4) === 3L &&
      rep(0).getLong(5) === 3L && rep(0).getLong(6) === 2L)
  }

  test("one aggregation, no join, no window in the plan") {
    val rep = Funnel.report(df,
      Seq("gateA" -> ($"a" > 0), "gateB" -> ($"b" > 0)))
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    // exactly one aggregate pair (partial+final), counted loosely:
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan)
  }

  test("reportBy segments the same counts per group") {
    val seg = df.withColumn("src", when($"id" <= 2L, "s1").otherwise("s2"))
    val rep = Funnel.reportBy(seg, "src",
      Seq("gateA" -> ($"a" > 0), "gateB" -> ($"b" > 0)))
      .orderBy("src", "gate_ord").collect()
    assert(rep.length === 4)
    // s1 = ids 1,2: gateA fails id2 (first+unique), both survive gateB path: id1 only
    val s1a = rep(0)
    assert(s1a.getString(0) === "s1" && s1a.getLong(3) === 2L) // n_rows
    assert(s1a.getLong(4) === 1L && s1a.getLong(5) === 1L && s1a.getLong(6) === 1L)
    // s2 = ids 3,4,5: gateA fails 4,5; gateB fails 3,4
    val s2a = rep(2); val s2b = rep(3)
    assert(s2a.getString(0) === "s2" && s2a.getLong(4) === 2L) // n_fail gateA
    assert(s2b.getLong(4) === 2L)     // gateB n_fail
    assert(s2b.getLong(5) === 1L)     // first-fail gateB: id 3 only
    assert(s2b.getLong(7) === 0L)     // nobody survives both in s2
  }

  test("duplicate gate names are rejected") {
    intercept[IllegalArgumentException] {
      Funnel.report(df, Seq("g" -> ($"a" > 0), "g" -> ($"b" > 0)))
    }
  }
}
