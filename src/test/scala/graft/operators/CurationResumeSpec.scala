package graft.operators

import java.nio.file.Files

import graft.GraftSparkSpec

/** The resumable curation flagship: kill the run at EVERY stage
  * boundary, resume, and the final frame must equal the registry's
  * q65 output row-for-row (the CrawlResume "done" criterion applied
  * to the second flagship).
  */
class CurationResumeSpec extends GraftSparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("resume after a kill at every stage boundary equals q65's output") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val expected = collectSet(
      graft.SparkEntry.queries("q65_curation_pipeline")(spark, dir))
    for (kill <- CurationResume.stageNames) {
      val ldir = Files.createTempDirectory(s"curation-ledger-$kill").toFile
      ldir.deleteOnExit()
      intercept[StageLedger.PlantedCrash] {
        CurationResume.run(spark, dir,
          new StageLedger(spark, ldir.getAbsolutePath, failAfter = Some(kill)))
      }
      val resumed = collectSet(CurationResume.run(
        spark, dir, new StageLedger(spark, ldir.getAbsolutePath)))
      assert(resumed === expected, s"kill after $kill diverged")
    }
  }
}
