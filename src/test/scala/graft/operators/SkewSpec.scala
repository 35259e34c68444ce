package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class SkewSpec extends GraftSparkSpec {
  import spark.implicits._

  test("salted join equals the plain inner join on a skewed key") {
    // one hot key (90% of rows), several cold ones
    val big = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"cold${i % 7}", i)))
      .toDF("k", "payload")
    val small = Seq(("hot", "H"), ("cold0", "C0"), ("cold3", "C3"), ("absent", "A"))
      .toDF("k", "dim")

    val plain = big.join(small, Seq("k")).select("k", "payload", "dim")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "payload", "dim")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
    assert(plain.nonEmpty) // the fixture actually joins
  }

  test("salts=1 degenerates to the plain join; duplicate big rows join once each") {
    val big = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v") // duplicate row
    val small = Seq(("a", "x"), ("b", "y")).toDF("k", "d")
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 1)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val plain = big.join(small, Seq("k"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain && salted.length == 3)
  }
}
