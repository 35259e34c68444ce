package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force FULL evaluation: a bare count() lets Catalyst prune every
    // projected column (q6_parse would "run" without parsing a line).
    // Hashing all columns into an aggregated checksum makes each query's
    // real work non-prunable while still collecting one row.
    // bit_xor, NOT sum: summing 64-bit hashes random-walks past Long range
    // and ANSI mode (Spark 4 default) aborts the job with ARITHMETIC_OVERFLOW.
    import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      val h = xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
      df.select(h.as("_h")).agg(expr("bit_xor(_h)")).collect()
      ()
    }
    // JVM/session warmup before the timed loop: one throwaway pass of
    // EVERY query at the smallest sf. The parquet schemas are identical
    // across sf dirs, so each query's generated code (whole-stage
    // codegen, custom-expression classes) hits the codegen cache and
    // its JIT compilation happens HERE — the first timed query (q10 in
    // sort order) previously absorbed multi-second one-time cost no
    // steady-state deployment would see (8.5s round 3 vs 7.5s round 2,
    // traced to warm-order variance, not its plan). Disable with
    // SPARK_GRAFT_WARM_DIR=none for cold-start diagnostics.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (warmDir != "none") {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try force(fn(spark, warmDir))
        catch { case _: Throwable => () }
      }
    }
    // SPARK_GRAFT_BENCH_REPEAT=n (diagnostic, default 1): run the whole
    // suite n times and report the LAST pass — separates steady-state
    // cost from per-query JIT when hunting regressions.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "1").toInt.max(1)
    // A failed query records -1 (never a plausible-looking elapsed time) and
    // lands in "failed" so benchmark regressions caused by exceptions are loud.
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    var results: Seq[(String, Double)] = Seq.empty
    for (_ <- 1 to repeat) {
      failed.clear()
      // sorted execution order: Map hash order would shuffle which
      // queries absorb residual JIT warmup between rounds, making
      // per-query timings incomparable across BENCH_r{N}.json files
      results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { force(fn(spark, sfDir)); true }
          catch {
            case e: Throwable =>
              System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
              false
          }
        if (!ok) failed += name
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
