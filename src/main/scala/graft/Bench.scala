package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Force FULL evaluation: a bare count() lets Catalyst prune every
    * projected column (q6_parse would "run" without parsing a line).
    * Hashing all columns into an aggregated checksum makes each query's
    * real work non-prunable while still collecting one row. bit_xor,
    * NOT sum: summing 64-bit hashes random-walks past Long range and
    * ANSI mode (Spark 4 default) aborts with ARITHMETIC_OVERFLOW.
    * Shared by Bench and ScaleSuite so the two surfaces can't diverge
    * in what "ran the query" means.
    */
  def force(df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
    val h = xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
    df.select(h.as("_h")).agg(expr("bit_xor(_h)")).collect()
    ()
  }

  /** One throwaway pass of every query at `warmDir` (the smallest sf:
    * identical schemas warm the codegen cache, and the generated
    * classes JIT here instead of inside the first timed query).
    * `warmDir = "none"` disables. Failures are counted and reported —
    * a silently absent warm dir would reintroduce exactly the
    * first-query warm-order variance this exists to remove.
    */
  def warmAll(spark: SparkSession, warmDir: String): Unit = {
    if (warmDir == "none") return
    var failures = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try force(fn(spark, warmDir))
      catch { case _: Throwable => failures += 1 }
    }
    if (failures > 0)
      System.err.println(s"[bench] WARNING: $failures warmup queries failed against " +
        s"$warmDir — first timed queries will absorb JIT/codegen cost " +
        "(set SPARK_GRAFT_WARM_DIR to a valid small sf dir)")
  }

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
    // warmup before the timed loop (see warmAll: the first timed query,
    // q10 in sort order, previously absorbed multi-second one-time
    // codegen/JIT cost — 8.5s round 3 vs 7.5s round 2 was warm-order
    // variance, not its plan)
    warmAll(spark, sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"))
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
