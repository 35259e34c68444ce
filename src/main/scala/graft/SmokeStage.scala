package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Drive the staging layer end-to-end: parse synthetic logs, normalize,
  * stage to partitioned parquet, read back with pruning.
  */
object SmokeStage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      // local-FS perf: no /bin/chmod forks (graft.util.NoForkLocalFileSystem)
      .config("spark.hadoop.fs.file.impl", "graft.util.NoForkLocalFileSystem")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parsed = graft.sources.LineParser.parse(
      Flagship.syntheticLines(spark, "/root/testdata/sf0.001")).parsed
    val normalized = Pipeline.normalize(parsed)
    val dir = "/tmp/graft_stage_smoke"
    graft.sink.ParquetStage.write(normalized, dir)
    val day = graft.sink.ParquetStage.read(spark, dir)
      .filter(col("event_date") === "2024-01-05" && col("source") === "src1.log")
    println("STAGE DAY ROWS = " + day.count())
    println("STAGE PARTITIONS = " + new java.io.File(dir).listFiles().count(_.isDirectory))
    println(day.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters")).take(1).mkString)
    spark.stop()
  }
}
