package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Snapshot diff (SnapshotDiff.diff / changedDocs): the four-way
  * classification, null-payload handling, hash columns for re-verify,
  * and the worklist join.
  */
class SnapshotDiffSpec extends GraftSparkSpec {
  import spark.implicits._

  private val oldDf = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
    .toDF("id", "text")
  private val newDf = Seq(
    (1L, "alpha"), (2L, "beta v2"), (4L, "delta"), (5L, "epsilon"))
    .toDF("id", "text")

  test("classifies added / removed / changed / unchanged") {
    val got = SnapshotDiff.diff(oldDf, newDf, "id", "text")
      .select(col("id"), col("status"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"),
      (4L, "unchanged"), (5L, "added")))
  }

  test("absent side's hash is null; present hashes are md5 of the payload") {
    val rows = SnapshotDiff.diff(oldDf, newDf, "id", "text")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(2)), Option(r.getString(3)))).sortBy(_._1)
    val byId = rows.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(3L)._2.isEmpty && byId(3L)._1.nonEmpty) // removed: no new hash
    assert(byId(5L)._1.isEmpty && byId(5L)._2.nonEmpty) // added: no old hash
    val md5Alpha = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId(1L)._1.contains(md5Alpha) && byId(1L)._2.contains(md5Alpha))
  }

  test("null payload hashes as empty string — a nulled doc reads as changed") {
    val o = Seq((1L, Option("x")), (2L, Option("y"))).toDF("id", "text")
    val n = Seq((1L, Option.empty[String]), (2L, Option("y"))).toDF("id", "text")
    val got = SnapshotDiff.diff(o, n, "id", "text")
      .select(col("id"), col("status"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "changed"), (2L, "unchanged")))
  }

  test("changedDocs returns exactly the added+changed payloads from the new side") {
    val got = SnapshotDiff.changedDocs(oldDf, newDf, "id", "text")
      .select(col("id"), col("text"), col("status"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((2L, "beta v2", "changed"), (5L, "epsilon", "added")))
  }
}
