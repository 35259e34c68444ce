package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingestion and materialization — the interchange format
  * real text corpora arrive in (one JSON object per line) and the
  * format downstream training stacks read back out.
  *
  * Read side: schema is REQUIRED (never inferred — inference is a full
  * extra pass over 100 TB and makes the result depend on which files
  * the sampler touched), mode is PERMISSIVE with a `_corrupt` side
  * channel: malformed lines survive as rows carrying their raw text,
  * the [[graft.sources.ParseLogLine]] parse-error discipline applied to
  * JSON. `readJsonl` returns (clean, corrupt) so the caller decides the
  * policy; nothing is silently dropped.
  *
  * Write side: `writeJsonl` materializes per-shard JSONL files through
  * the same `partitionBy` layout [[graft.operators.Budget.writeTokenShards]]
  * uses for parquet, with optional gzip (the crawl-corpus convention).
  * Round-trip fidelity is spec-pinned (JsonlCorpusSpec), including
  * nulls, unicode, embedded quotes/newlines-in-strings, and arrays.
  */
object JsonlCorpus {

  /** Read JSONL under `path` with the given schema. Returns (clean,
    * corrupt): clean rows project the schema columns; corrupt rows are
    * (file, raw) — the flagged line verbatim with its source file for
    * triage. PERMISSIVE contract: trailing garbage after a valid JSON
    * object is tolerated (Jackson's stream parser stops at the object
    * end) — the salvaged fields populate a clean row and the line is
    * NOT flagged; only lines with no parseable object flag. A line
    * with per-field type mismatches may appear in both branches
    * (salvaged fields + flag) — a strict caller anti-joins clean
    * against corrupt on a key. Fully malformed lines yield an all-null
    * clean row (filter on a required key to drop them). Blank and
    * whitespace-only lines carry no object at all, so they appear in
    * the corrupt branch (and never in clean) — nothing is silently
    * dropped.
    */
  def readJsonl(
      spark: SparkSession, path: String, schema: StructType):
      (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt"),
      "readJsonl: _corrupt is the reserved corrupt-record column")
    val clean = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)
    // Spark refuses a query that references ONLY the corrupt-record
    // column of a json scan (SPARK-21610), so the corrupt branch reads
    // the lines as text and re-parses with from_json — same Jackson
    // parser, same PERMISSIVE semantics, and the text scan is the
    // cheaper of the two (no schema conversion on the malformed rows
    // we're after)
    val corruptSchema = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = from_json(col("raw"), corruptSchema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
    // `parsed.isNull` catches blank/whitespace-only lines: from_json
    // yields a NULL struct for them (no object, so no _corrupt field
    // either), and the clean scan skips them — without this disjunct
    // they'd vanish from BOTH branches, breaking the nothing-dropped
    // contract
    val corrupt = spark.read.text(path)
      .select(input_file_name().as("file"), col("value").as("raw"))
      .filter(parsed.isNull || parsed.getField("_corrupt").isNotNull)
    (clean, corrupt)
  }

  /** Write `df` as JSONL, one directory per value of `shardCol`
    * (`outDir/<shardCol>=N/part-*.json[.gz]`). Rows within a shard are
    * range-sorted by `orderCol` (`sortWithinPartitions` after a
    * shard-hash repartition: each shard's files read back in training
    * order without any global sort). Gzip halves crawl-text bytes at
    * negligible CPU; leave it off when downstream wants splittable
    * files.
    */
  def writeJsonl(
      df: DataFrame, shardCol: String, orderCol: Column, outDir: String,
      gzip: Boolean = false): Unit = {
    val w = df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), orderCol)
      .write.mode("overwrite")
      .partitionBy(shardCol)
    (if (gzip) w.option("compression", "gzip") else w).json(outDir)
  }
}
