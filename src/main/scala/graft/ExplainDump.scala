package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: dump formatted physical plans for plan review. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      // local-FS perf: no /bin/chmod forks (graft.util.NoForkLocalFileSystem)
      .config("spark.hadoop.fs.file.impl", "graft.util.NoForkLocalFileSystem")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"==== $name ====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
