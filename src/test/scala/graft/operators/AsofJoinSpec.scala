package graft.operators

import graft.GraftSparkSpec

class AsofJoinSpec extends GraftSparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    (1L, "k1", 10L), (2L, "k1", 25L), (3L, "k1", 19L),
    (4L, "k2", 5L), (5L, "k3", 7L)).toDF("id", "k", "t")
  private def rightDf = Seq(
    ("k1", 9L, "a"), ("k1", 20L, "b"), ("k2", 6L, "c"), ("k2", 5L, "d"))
    .toDF("k", "rt", "v")

  private def run(strict: Boolean = false, tol: Option[Long] = None): Map[Long, String] =
    AsofJoin.asofBackward(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"),
      strict = strict, tolerance = tol)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap

  test("backward: most recent right at or before each left time") {
    val got = run()
    assert(got(1L) == "a") // t=10: a@9
    assert(got(3L) == "a") // t=19: still a (b is at 20)
    assert(got(2L) == "b") // t=25: b@20
    assert(got(4L) == "d") // t=5: tie rt=5 matches with >= semantics
    assert(got(5L) == null) // k3 has no right rows
  }

  test("strict excludes equal-time matches") {
    val got = run(strict = true)
    assert(got(4L) == null) // rt=5 == t=5 excluded, rt=6 is in the future
    assert(got(1L) == "a") // unaffected
  }

  test("tolerance nulls matches that are too far back") {
    val got = run(tol = Some(1L))
    assert(got(1L) == "a") // 10 - 9 = 1 <= tol
    assert(got(3L) == null) // 19 - 9 = 10 > tol
    assert(got(2L) == null) // 25 - 20 = 5 > tol
    assert(got(4L) == "d") // exact tie, distance 0
  }

  test("a matched right row with a null payload yields null, never an older row's value") {
    val r = Seq(("k1", 9L, Some("a")), ("k1", 20L, Option.empty[String]))
      .toDF("k", "rt", "v")
    val got = AsofJoin.asofBackward(leftDf, r, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(got(2L) == null) // t=25 matches the rt=20 row, whose v IS null
    assert(got(1L) == "a") // t=10 still matches rt=9
  }

  test("right rows tied on (key, time) resolve deterministically (greatest payload)") {
    val r = Seq(("k1", 9L, "a"), ("k1", 9L, "z"), ("k1", 9L, "m")).toDF("k", "rt", "v")
    (1 to 3).foreach { parts =>
      val got = AsofJoin.asofBackward(
        leftDf.repartition(parts), r.repartition(4 - parts), Seq("k"), "t", "rt", Seq("v"))
        .filter($"id" === 1L).select("v").collect()(0).getString(0)
      assert(got == "z", s"parts=$parts got $got")
    }
  }

  test("value-column collision with left is rejected") {
    val bad = rightDf.withColumnRenamed("v", "id")
    val e = intercept[IllegalArgumentException](
      AsofJoin.asofBackward(leftDf, bad, Seq("k"), "t", "rt", Seq("id")))
    assert(e.getMessage.contains("collide"))
  }

  private def chunkedEq(
      left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      strict: Boolean, tol: Option[Long], chunk: Long): Unit = {
    val mono = AsofJoin.asofBackward(
      left, right, Seq("k"), "t", "rt", Seq("v"), strict, tol)
    val chk = AsofJoin.asofBackwardChunked(
      left, right, Seq("k"), "t", "rt", Seq("v"), chunk, strict, tol)
    assert(chk.columns.toSeq == mono.columns.toSeq)
    val m = mono.orderBy("id").collect().map(_.toSeq).toSeq
    val c = chk.orderBy("id").collect().map(_.toSeq).toSeq
    assert(c == m, s"chunk=$chunk strict=$strict tol=$tol")
  }

  test("chunked twin equals monolithic on the fixtures for every chunk size") {
    for (chunk <- Seq(1L, 3L, 7L, 1000L); strict <- Seq(false, true); tol <- Seq(None, Some(1L)))
      chunkedEq(leftDf, rightDf, strict, tol, chunk)
  }

  test("chunked twin equals monolithic on a random hot-key frame") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 800).map(i =>
      (i.toLong, if (rnd.nextInt(10) < 8) "hot" else s"k${rnd.nextInt(5)}",
        rnd.nextInt(500).toLong)).toDF("id", "k", "t")
    val right = (1 to 300).map(i =>
      (if (rnd.nextInt(10) < 8) "hot" else s"k${rnd.nextInt(5)}",
        rnd.nextInt(500).toLong, s"v$i")).toDF("k", "rt", "v")
    for (chunk <- Seq(10L, 50L, 1000L); strict <- Seq(false, true))
      chunkedEq(left, right, strict, if (strict) Some(20L) else None, chunk)
  }

  test("chunked handles null left times and null keys like the monolithic") {
    val left = Seq(
      (1L, Some("k1"), Some(10L)), (2L, Option.empty[String], Some(9L)),
      (3L, Some("k1"), Option.empty[Long]), (4L, Option.empty[String], Some(3L)))
      .toDF("id", "k", "t")
    val right = Seq((Some("k1"), 9L, "a"), (Option.empty[String], 5L, "n"))
      .toDF("k", "rt", "v")
    // sanity: the monolithic groups null keys in one window partition,
    // so the null-key left row at t=9 matches the null-key right at 5
    val mono = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(mono(2L) == "n" && mono(4L) == null && mono(3L) == null)
    for (chunk <- Seq(2L, 100L)) chunkedEq(left, right, strict = false, None, chunk)
  }

  test("unorderable payload types are rejected up front") {
    val r = Seq(("k1", 9L, Map("a" -> 1))).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException](
      AsofJoin.asofBackward(leftDf, r, Seq("k"), "t", "rt", Seq("v")))
    assert(e.getMessage.contains("unorderable"))
  }

  test("null right times never match; left schema passes through") {
    val withNull = rightDf.union(Seq(("k3", null.asInstanceOf[Any], "z"))
      .map { case (k, _, v) => (k, Option.empty[Long], v) }
      .toDF("k", "rt", "v"))
    val got = AsofJoin.asofBackward(leftDf, withNull, Seq("k"), "t", "rt", Seq("v"))
    assert(got.columns.toSeq == leftDf.columns.toSeq :+ "v")
    assert(got.filter($"id" === 5L).select("v").collect()(0).isNullAt(0))
  }
}
