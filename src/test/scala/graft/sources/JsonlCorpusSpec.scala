package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSparkSpec

/** JSONL round-trip fidelity, the corrupt-record side channel, and the
  * sharded write layout.
  */
class JsonlCorpusSpec extends GraftSparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft_jsonl_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("tags", ArrayType(StringType))))

  test("round-trip: nulls, unicode, quotes, newlines-in-strings, arrays") {
    val dir = tmpDir("rt")
    val rows = Seq(
      (1L, "plain text", Seq("a", "b")),
      (2L, "quote \" backslash \\ tab \t newline \n done", Seq.empty[String]),
      (3L, "unicode é Ω 가 q̣̇", Seq("ü")),
      (4L, null.asInstanceOf[String], null.asInstanceOf[Seq[String]]))
    val df = rows.toDF("doc_id", "text", "tags")
      .withColumn("shard", (col("doc_id") % 2).cast("int"))
    JsonlCorpus.writeJsonl(df, "shard", col("doc_id"), dir)
    val (clean, corrupt) = JsonlCorpus.readJsonl(spark, dir, schema)
    assert(corrupt.count() == 0)
    val got = clean.select("doc_id", "text", "tags").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getSeq[String](2)).map(_.toList)))
      .toSet
    val want = rows.map { case (id, t, tg) =>
      (id, Option(t), Option(tg).map(_.toList))
    }.toSet
    assert(got == want)
  }

  test("corrupt lines land in the side channel; clean rows still parse") {
    val dir = tmpDir("corrupt")
    Files.write(Paths.get(dir, "part-0.json"),
      ("""{"doc_id": 1, "text": "ok", "tags": []}""" + "\n" +
        """not json at all""" + "\n" +
        """{"doc_id": 2, "text": "also ok", "tags": ["x"]}""" + "\n" +
        """{"doc_id": 3, "text": "trailing garbage"} extra""" + "\n")
        .getBytes("UTF-8"))
    val (clean, corrupt) = JsonlCorpus.readJsonl(spark, dir, schema)
    // PERMISSIVE: doc 3's trailing garbage is tolerated — the valid
    // object is salvaged clean and the line is NOT flagged; only the
    // line with no parseable object flags
    val cleanIds = clean.filter(col("doc_id").isNotNull)
      .select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L, 2L, 3L))
    val raws = corrupt.select("raw").as[String].collect().toSet
    assert(raws == Set("not json at all"))
    // fully malformed lines parse as all-null clean rows — the
    // required-key filter above is what dropped them
    assert(clean.count() == 4)
  }

  test("sharded layout: one directory per shard, training order within") {
    val dir = tmpDir("shards")
    val df = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .withColumn("shard", (col("doc_id") % 3).cast("int"))
    JsonlCorpus.writeJsonl(df, "shard", col("doc_id"), dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(shardDirs == Set("shard=0", "shard=1", "shard=2"))
    // read back one shard's files directly: rows are in doc_id order
    val shard0 = new java.io.File(dir, "shard=0").listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
      .map(l => ujsonId(l))
    assert(shard0.toSeq == shard0.sorted.toSeq)
    // reserved column rejected
    intercept[IllegalArgumentException] {
      JsonlCorpus.readJsonl(spark, dir,
        StructType(Seq(StructField("_corrupt", StringType))))
    }
  }

  /** Tiny extractor for the doc_id field (avoids a JSON dep in tests). */
  private def ujsonId(line: String): Long = {
    val m = """"doc_id"\s*:\s*(\d+)""".r.findFirstMatchIn(line)
    m.map(_.group(1).toLong).getOrElse(sys.error(s"no doc_id in $line"))
  }
}
