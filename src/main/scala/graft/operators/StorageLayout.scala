package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical storage layout for shuffle-free reads — the two layout
  * moves that matter most at 100 TB:
  *
  *  - **Bucketed tables** ([[writeBucketed]]): both sides of a
  *    recurring equi-join written with the same bucket count on the
  *    join key make the join a zero-exchange sort-merge — the shuffle
  *    is paid ONCE at write time and amortized over every subsequent
  *    join/aggregation on that key (the classic warehouse fact/dim
  *    layout). `StorageLayoutSpec` plan-asserts the absence of
  *    `ShuffleExchange` on the joined read.
  *  - **Partitioned directories** ([[writePartitioned]]): low-
  *    cardinality filter columns as directory partitions turn
  *    predicate pushdown into file pruning — a `lang = 'en'` read
  *    touches 1/k of the files before a single row is decoded.
  *    `StorageLayoutSpec` asserts the pushed `PartitionFilters`.
  *
  * Spark-only mechanics worth noting: bucket metadata lives in the
  * session catalog, so bucketed data round-trips through
  * `saveAsTable`/`spark.table` (plain `parquet(path)` reads lose the
  * bucket spec); table names are caller-scoped and re-written with
  * overwrite semantics so repeated runs in one JVM are idempotent.
  */
object StorageLayout {

  /** Write `df` as a bucketed+sorted external parquet table (replacing
    * any previous incarnation) and return the re-read frame, which
    * carries the bucket spec for downstream join planning.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      numBuckets: Int,
      bucketCol: String): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
    spark.table(tableName)
  }

  /** Equi-join of two identically-bucketed tables on their bucket
    * key, pinned to sort-merge (a broadcast would also be
    * exchange-free but hides the layout win this operator exists
    * for). With equal bucket counts on both sides the planned join
    * has NO ShuffleExchange on either input.
    */
  def colocatedJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.hint("merge").join(right, key)

  /** Write `df` partitioned by a low-cardinality column; reads
    * through [[readPartitioned]] prune directories on that column.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
