package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins the ledger-first stage semantics: parquet before marker,
  * uncommitted (crashed) stages recompute, committed stages replay
  * without recomputation, and the resumed output equals the
  * single-run output.
  */
class StageLedgerSpec extends GraftSparkSpec {
  import spark.implicits._

  private def freshDir() = {
    val d = Files.createTempDirectory("ledger").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // a tiny 3-stage pipeline with an evaluation counter so the spec
  // can observe which stage bodies actually ran
  private def pipeline(
      ledger: StageLedger, ran: scala.collection.mutable.Buffer[String]) = {
    val a = ledger.stage("a") {
      ran += "a"; spark.range(10).select(col("id"))
    }
    val b = ledger.stage("b") {
      ran += "b"; a.filter(col("id") % 2 === 0)
    }
    ledger.stage("c") {
      ran += "c"; b.agg(sum(col("id")).as("s"), count(lit(1)).as("n"))
    }
  }

  test("single run commits every stage; re-run recomputes nothing") {
    val dir = freshDir()
    val ran = scala.collection.mutable.Buffer[String]()
    val out = pipeline(new StageLedger(spark, dir), ran)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((20L, 5L)))
    assert(ran.toSeq === Seq("a", "b", "c"))
    val ledger2 = new StageLedger(spark, dir)
    assert(ledger2.committedStages === Seq("a", "b", "c"))
    ran.clear()
    val out2 = pipeline(ledger2, ran).as[(Long, Long)].collect().toSeq
    assert(out2 === out)
    assert(ran.isEmpty, "committed stages must not recompute")
  }

  test("crash after each stage: resume runs only the tail, equal output") {
    for (kill <- Seq("a", "b", "c")) {
      val dir = freshDir()
      val ran = scala.collection.mutable.Buffer[String]()
      intercept[StageLedger.PlantedCrash] {
        pipeline(new StageLedger(spark, dir, failAfter = Some(kill)), ran)
      }
      val before = ran.toSeq
      ran.clear()
      val out = pipeline(new StageLedger(spark, dir), ran)
        .as[(Long, Long)].collect().toSeq
      assert(out === Seq((20L, 5L)), s"kill after $kill")
      // the resumed run executes exactly the stages the crash lost
      assert((before ++ ran).sorted === Seq("a", "b", "c"), s"kill after $kill")
      assert(before.intersect(ran.toSeq).isEmpty,
        s"stage recomputed after commit (kill after $kill)")
    }
  }

  test("a half-written stage (data, no marker) recomputes and overwrites") {
    val dir = freshDir()
    // simulate a crash mid-write: stage dir holds BOGUS parquet but no
    // _COMMIT marker
    spark.range(3).select(lit(-1L).as("id"))
      .write.parquet(s"$dir/a/data.parquet")
    val ran = scala.collection.mutable.Buffer[String]()
    val out = pipeline(new StageLedger(spark, dir), ran)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((20L, 5L)), "bogus uncommitted data must be overwritten")
    assert(ran.toSeq === Seq("a", "b", "c"))
  }

  test("clear() resets to a fresh run") {
    val dir = freshDir()
    val ran = scala.collection.mutable.Buffer[String]()
    pipeline(new StageLedger(spark, dir), ran).collect()
    val ledger = new StageLedger(spark, dir)
    ledger.clear()
    assert(ledger.committedStages.isEmpty)
    ran.clear()
    pipeline(ledger, ran).collect()
    assert(ran.toSeq === Seq("a", "b", "c"))
  }
}
