package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[StorageLayout]]: the bucketed co-located join plans with
  * ZERO ShuffleExchange (differentially — the unbucketed twin of the
  * same join does shuffle) and is result-transparent; the partitioned
  * write prunes directories via PartitionFilters and is likewise
  * result-transparent; both layouts overwrite idempotently.
  */
class StorageLayoutSpec extends GraftSparkSpec {

  import spark.implicits._

  private val facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
  private val dims = (0L to 49L).map(i => (i, s"d$i")).toDF("k", "name")

  test("bucketed join: zero ShuffleExchange, same result as the shuffled twin") {
    val f = StorageLayout.writeBucketed(facts, "graft_spec_bkt_f",
      graft.SparkEntry.perProcessTmpDir("graft-spec-bkt-f"), 4, "k")
    val d = StorageLayout.writeBucketed(dims, "graft_spec_bkt_d",
      graft.SparkEntry.perProcessTmpDir("graft-spec-bkt-d"), 4, "k")

    // join + aggregate on the bucket key: the WHOLE chain is
    // exchange-free (the layout's amortized win)
    val j = StorageLayout.colocatedJoin(f, d, "k")
      .groupBy("k").agg(sum("v").as("sv"), first("name").as("name"))
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")

    // unbucketed twin: same result, but it DOES shuffle
    val t = facts.hint("merge").join(dims, "k")
      .groupBy("k").agg(sum("v").as("sv"), first("name").as("name"))
    val want = t.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(t.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(got.toSeq === want.toSeq)
  }

  test("bucketed write is overwrite-idempotent in one session") {
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-bkt-re")
    val a = StorageLayout.writeBucketed(facts, "graft_spec_bkt_re", path, 4, "k")
    assert(a.count() === 1000L)
    val b = StorageLayout.writeBucketed(
      facts.filter($"v" <= 10), "graft_spec_bkt_re", path, 4, "k")
    assert(b.count() === 10L)
  }

  test("partitioned write: PartitionFilters prune, result transparent") {
    val langs = Seq("en", "de", "fr", "es", "zh")
    val docs = (0L until 100L).map(i => (i, langs((i % 5).toInt), i * 2))
      .toDF("id", "lang", "w")
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-part")
    StorageLayout.writePartitioned(docs, path, "lang")
    val rd = StorageLayout.readPartitioned(spark, path)
      .filter(col("lang") === "en")
    val explained = rd.queryExecution.explainString(FormattedMode)
    assert(explained.contains("PartitionFilters") &&
      explained.contains("lang"), s"no partition pruning:\n$explained")
    assert(rd.collect().length === 20) // executes rd's own plan -> metrics live
    assert(rd.agg(sum("w")).collect().head.getLong(0) ===
      docs.filter($"lang" === "en").agg(sum("w")).collect().head.getLong(0))
    // the en-directory read touches only its own files: the executed
    // scan's numFiles metric must equal the on-disk lang=en file
    // count, not the full table's (inputFiles would lie here — it
    // lists the pre-pruning FileIndex)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val enFiles = new java.io.File(path, "lang=en").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val allFiles = new java.io.File(path).listFiles()
      .filter(_.isDirectory)
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val scanned = scans(rd.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(scanned === enFiles.toLong, s"scanned $scanned of $allFiles")
    assert(scanned < allFiles.toLong)
  }
}
