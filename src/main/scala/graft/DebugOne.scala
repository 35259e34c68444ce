package graft
import org.apache.spark.sql.SparkSession

/** Debug runner: run named `SparkEntry.queries` against an sf dir and
  * print row counts, with the full stack on failure — `Verify` swallows
  * per-query errors into one stderr line, which is right for the driver
  * gate but useless for diagnosing a broken query.
  * Usage: `runMain graft.DebugOne <sfDir> [query...]`.
  */
object DebugOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q6_parse")
    val spark = SparkSession.builder()
      // local-FS perf: no /bin/chmod forks (graft.util.NoForkLocalFileSystem)
      .config("spark.hadoop.fs.file.impl", "graft.util.NoForkLocalFileSystem")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(s"OK $n rows=$c")
      } catch { case e: Throwable =>
        println(s"FAIL $n: ${e.getClass.getName}: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
