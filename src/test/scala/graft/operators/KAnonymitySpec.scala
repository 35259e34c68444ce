package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class KAnonymitySpec extends GraftSparkSpec {
  import spark.implicits._

  private def ladder = Seq(
    "zip" -> Seq(col("zip"), substring(col("zip"), 1, 2), lit("*")),
    "age" -> Seq(col("age").cast("string"),
      ((col("age") / 10).cast("int") * 10).cast("string"), lit("*")))

  private def run(rows: Seq[(Long, String, Int)], k: Long, permille: Long) =
    KAnonymity.kAnonymize(
      rows.toDF("id", "zip", "age").repartition(4), "id", ladder,
      k, permille)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4), r.getLong(5))))
      .toMap

  test("level 0 is kept when raw classes already satisfy k") {
    val rows = (1L to 20L).map(i => (i, "z1", 30))
    val got = run(rows, k = 5, permille = 0)
    assert(got(1L) == (("z1", "30", 20L, false, 0L)))
  }

  test("generalization climbs until the suppression budget holds") {
    // 20 distinct zips of 1 row each -> level 0 suppresses all;
    // level 1 ('z1'/'z2' prefixes, 10 rows each) satisfies k = 5
    val rows = (1L to 20L).map(i =>
      (i, (if (i <= 10) "z1" else "z2") + s"x$i", 30))
    val got = run(rows, k = 5, permille = 0)
    assert(got.values.forall(v => v._5 == 1L && !v._4))
    assert(got(1L)._1 == "z1" && got(11L)._1 == "z2")
    assert(got(1L)._3 == 10L)
  }

  test("rows below k at the chosen level are suppressed, within budget") {
    // 9 rows 'aa*' + 1 row 'bb1': level 1 -> class aa (9 >= 5) and
    // class bb (1 < 5); 1/10 rows = 100 permille fits a 100 budget
    val rows = (1L to 9L).map(i => (i, s"aax$i", 40)) :+ ((10L, "bb1", 40))
    val got = run(rows, k = 5, permille = 100)
    assert(got(1L) == (("aa", "40", 9L, false, 1L)))
    // suppressed rows surface NULL quasi-identifiers: the default
    // output is safe to release even if the caller forgets to filter
    assert(got(10L) == ((null, null, 1L, true, 1L)))
  }

  test("an impossible budget lands on the ladder top (everything one class)") {
    val rows = (1L to 6L).map(i => (i, s"z$i", i.toInt))
    // k = 5: level 0/1 classes are singletons; level 2 pools all 6
    val got = run(rows, k = 5, permille = 0)
    assert(got.values.forall(v => v == (("*", "*", 6L, false, 2L))))
  }

  test("partitioning-insensitive") {
    val rows = (1L to 50L).map(i => (i, s"z${i % 7}q$i", (i % 9).toInt))
    def go(parts: Int) =
      KAnonymity.kAnonymize(
        rows.toDF("id", "zip", "age").repartition(parts), "id", ladder,
        k = 4, maxSuppressedPermille = 200)
        .collect().map(_.toSeq).toSet
    assert(go(1) == go(13))
  }
}
