package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times sub-plans of the heavy bench queries
  * so optimization targets the stage that actually costs, not the one
  * that looks expensive. Not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.cli.Prof"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // bit_xor agg (same as Bench): a bare count() would let Catalyst
    // prune the projections and time nothing.
    def force(df: DataFrame): Long = {
      val h = xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
      df.select(h.as("_h")).agg(expr("bit_xor(_h)"), count(lit(1))).collect()(0).getLong(1)
    }

    def time(name: String, mk: => DataFrame, reps: Int = 2): Unit = {
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        rows = force(mk)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[prof] $name%-28s $best%8.3f s  ($rows rows)")
    }

    import graft.textops.NearDup
    val planted = graft.SparkEntry.plantedDocs(spark, sfDir)

    // ---- q25 minhash stages ----
    val base = planted.select(col("doc_id").as("id"),
      NearDup.hashedShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("q25 base(shingles)", base)
    time("q25 base+sig", base.withColumn("sig",
      graft.textops.TokenShingles.minhash_sig_long(col("sh"), 32)))
    val exploded = base
      .withColumn("sig", graft.textops.TokenShingles.minhash_sig_long(col("sh"), 32))
      .select(col("id"),
        posexplode(graft.textops.TokenShingles.lsh_band_keys(col("sig"), 8, 4))
          .as(Seq("band_idx", "band_hash")))
    time("q25 exploded", exploded)
    val capped = exploded
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("_n") <= 100)
      .drop("_n")
    time("q25 capped", capped)
    val candidates = capped.toDF("id_a", "band_idx", "band_hash")
      .join(capped.toDF("id_b", "band_idx", "band_hash"), Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("q25 candidates", candidates)
    time("q25 full", NearDup.minhashPairs(planted, "doc_id", "text", threshold = 0.5))

    // ---- q24 stages ----
    val docs = graft.SparkEntry.eventsTable(spark, sfDir).sparkSession
      .read.parquet(s"$sfDir/documents.parquet")
    val base24 = docs.select(col("lang"), col("source"), expr("n_chars DIV 100").as("nb"),
      col("doc_id").as("id"),
      NearDup.hashedShingles(col("text"), 3).as("sh"))
    time("q24 base", base24)
    val pairs24 = base24.toDF("lang", "source", "nb", "id_a", "sh_a")
      .join(base24.toDF("lang", "source", "nb", "id_b", "sh_b"), Seq("lang", "source", "nb"))
      .filter(col("id_a") < col("id_b"))
    time("q24 pairs(no jaccard)", pairs24.select("id_a", "id_b"))
    time("q24 full", NearDup.ngramJaccardPairs(docs, "doc_id", "text",
      bucketCols = Seq(col("lang"), col("source"), expr("n_chars DIV 100")),
      shingleSize = 3, threshold = 0.05))

    spark.stop()
  }
}
