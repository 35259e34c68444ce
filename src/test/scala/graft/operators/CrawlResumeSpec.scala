package graft.operators

import java.nio.file.Files

import graft.GraftSparkSpec

/** The resumable crawl→corpus flagship: kill the run at EVERY stage
  * boundary, resume, and the final frame must equal the registry's
  * q131 output row-for-row (the round-10 verdict item 4 "done"
  * criterion).
  */
class CrawlResumeSpec extends GraftSparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("resume after a kill at every stage boundary equals q131's output") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val expected = collectSet(
      graft.SparkEntry.queries("q131_crawl_corpus")(spark, dir))
    for (kill <- CrawlResume.stageNames) {
      val ldir = Files.createTempDirectory(s"crawl-ledger-$kill").toFile
      ldir.deleteOnExit()
      intercept[StageLedger.PlantedCrash] {
        CrawlResume.run(spark, dir,
          new StageLedger(spark, ldir.getAbsolutePath, failAfter = Some(kill)))
          // s7_final's crash fires inside stage() before the frame
          // returns, so no action is needed for earlier kills either
      }
      val resumed = collectSet(CrawlResume.run(
        spark, dir, new StageLedger(spark, ldir.getAbsolutePath)))
      assert(resumed === expected, s"kill after $kill diverged")
    }
  }
}
