package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[StorageLayout]]: the bucketed co-located join plans with
  * ZERO ShuffleExchange (differentially — the unbucketed twin of the
  * same join does shuffle) and is result-transparent; the partitioned
  * write prunes directories via PartitionFilters and is likewise
  * result-transparent; both layouts overwrite idempotently.
  */
class StorageLayoutSpec extends GraftSparkSpec {

  import spark.implicits._

  private val facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
  private val dims = (0L to 49L).map(i => (i, s"d$i")).toDF("k", "name")

  test("bucketed join: zero ShuffleExchange, same result as the shuffled twin") {
    val f = StorageLayout.writeBucketed(facts, "graft_spec_bkt_f",
      graft.SparkEntry.perProcessTmpDir("graft-spec-bkt-f"), 4, "k")
    val d = StorageLayout.writeBucketed(dims, "graft_spec_bkt_d",
      graft.SparkEntry.perProcessTmpDir("graft-spec-bkt-d"), 4, "k")

    // join + aggregate on the bucket key: the WHOLE chain is
    // exchange-free (the layout's amortized win)
    val j = StorageLayout.colocatedJoin(f, d, "k")
      .groupBy("k").agg(sum("v").as("sv"), first("name").as("name"))
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")

    // unbucketed twin: same result, but it DOES shuffle
    val t = facts.hint("merge").join(dims, "k")
      .groupBy("k").agg(sum("v").as("sv"), first("name").as("name"))
    val want = t.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(t.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(got.toSeq === want.toSeq)
  }

  test("bucketed write is overwrite-idempotent in one session") {
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-bkt-re")
    val a = StorageLayout.writeBucketed(facts, "graft_spec_bkt_re", path, 4, "k")
    assert(a.count() === 1000L)
    val b = StorageLayout.writeBucketed(
      facts.filter($"v" <= 10), "graft_spec_bkt_re", path, 4, "k")
    assert(b.count() === 10L)
  }

  test("partitioned write: PartitionFilters prune, result transparent") {
    val langs = Seq("en", "de", "fr", "es", "zh")
    val docs = (0L until 100L).map(i => (i, langs((i % 5).toInt), i * 2))
      .toDF("id", "lang", "w")
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-part")
    StorageLayout.writePartitioned(docs, path, "lang")
    val rd = StorageLayout.readPartitioned(spark, path)
      .filter(col("lang") === "en")
    val explained = rd.queryExecution.explainString(FormattedMode)
    assert(explained.contains("PartitionFilters") &&
      explained.contains("lang"), s"no partition pruning:\n$explained")
    assert(rd.collect().length === 20) // executes rd's own plan -> metrics live
    assert(rd.agg(sum("w")).collect().head.getLong(0) ===
      docs.filter($"lang" === "en").agg(sum("w")).collect().head.getLong(0))
    // the en-directory read touches only its own files: the executed
    // scan's numFiles metric must equal the on-disk lang=en file
    // count, not the full table's (inputFiles would lie here — it
    // lists the pre-pruning FileIndex)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val enFiles = new java.io.File(path, "lang=en").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val allFiles = new java.io.File(path).listFiles()
      .filter(_.isDirectory)
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val scanned = scans(rd.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(scanned === enFiles.toLong, s"scanned $scanned of $allFiles")
    assert(scanned < allFiles.toLong)
  }

  // rows DECODED by the executed parquet scan (post row-group
  // skipping, pre post-scan Filter re-eval)
  private def rowsDecoded(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    df.collect()
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("range clustering: band predicate skips row groups; unclustered twin decodes everything") {
    val n = 40000L
    val data = (0L until n).map(i => (i, (i * 2654435761L) % n))
      .toDF("x", "noise")
    val clustered = graft.SparkEntry.perProcessTmpDir("graft-spec-rc")
    val unclustered = graft.SparkEntry.perProcessTmpDir("graft-spec-rc-un")
    StorageLayout.writeRangeClustered(data, clustered, "x", numFiles = 8)
    // the ingest mess: hash-scattered, every file spans the full x range
    data.repartition(8, $"noise").write.mode("overwrite").parquet(unclustered)

    def band(path: String) = spark.read.parquet(path)
      .filter($"x" >= 1000L && $"x" < 3000L)
    val cRows = rowsDecoded(band(clustered))
    val uRows = rowsDecoded(band(unclustered))
    assert(band(clustered).count() === 2000L)
    assert(band(clustered).agg(sum("x")).head.getLong(0) ===
      band(unclustered).agg(sum("x")).head.getLong(0))
    // clustered: the band lives in ~1 of 8 files (5k rows); generous 4x slack
    assert(cRows <= n / 2, s"clustered scan decoded $cRows of $n")
    assert(uRows === n, s"unclustered twin should decode all rows, got $uRows")
    assert(cRows < uRows)
  }

  test("z-order: predicates on EITHER dimension skip; range-by-A cannot skip on B") {
    val n = 40000L
    // two independent dimensions (bit-reversal decorrelates b from a)
    val data = (0L until n).map { i =>
      (i, java.lang.Long.reverse(i) >>> (64 - 16))
    }.toDF("a", "b")
    val zPath = graft.SparkEntry.perProcessTmpDir("graft-spec-zo")
    val rPath = graft.SparkEntry.perProcessTmpDir("graft-spec-zo-r")
    StorageLayout.writeZOrdered(data, zPath, "a", "b", numFiles = 16, bits = 6)
    StorageLayout.writeRangeClustered(data, rPath, "a", numFiles = 16)

    val bMax = 1L << 16
    def bandA(path: String) = spark.read.parquet(path)
      .filter($"a" >= 1000L && $"a" < 1000L + n / 8)
    def bandB(path: String) = spark.read.parquet(path)
      .filter($"b" >= 1000L && $"b" < 1000L + bMax / 8)

    // result transparency on both dims
    assert(bandA(zPath).agg(sum("b")).head.getLong(0) ===
      bandA(rPath).agg(sum("b")).head.getLong(0))
    assert(bandB(zPath).agg(sum("a")).head.getLong(0) ===
      bandB(rPath).agg(sum("a")).head.getLong(0))

    val zA = rowsDecoded(bandA(zPath))
    val zB = rowsDecoded(bandB(zPath))
    val rB = rowsDecoded(bandB(rPath))
    // z-order skips on BOTH dims (1/8 band -> curve locality keeps the
    // decode well under the full table)
    assert(zA <= (n * 7) / 10, s"z-order failed to skip on dim A: $zA of $n")
    assert(zB <= (n * 7) / 10, s"z-order failed to skip on dim B: $zB of $n")
    // the one-dimensional layout serves only its own column
    assert(rB === n, s"range-by-A should decode everything for a B band, got $rB")
  }

  test("3-dim z-order: a band on ANY of the three dimensions skips") {
    val n = 40000L
    val data = (0L until n).map { i =>
      (i,
        (i * 2654435761L % 4294967296L) >> 16,
        (i * 1327217885L % 4294967296L) >> 16)
    }.toDF("a", "b", "c")
    val zPath = graft.SparkEntry.perProcessTmpDir("graft-spec-zo3")
    val sPath = graft.SparkEntry.perProcessTmpDir("graft-spec-zo3-s")
    StorageLayout.writeZOrderedN(data, zPath, Seq("a", "b", "c"), 16, bits = 6)
    data.repartition(16, $"b").sortWithinPartitions("b")
      .write.mode("overwrite").parquet(sPath)

    def band(path: String, colName: String, lo: Long, hi: Long) =
      spark.read.parquet(path).filter(col(colName) >= lo && col(colName) < hi)
    val bands = Seq(("a", 1000L, 1000L + n / 8),
      ("b", 8000L, 8000L + 65536L / 8), ("c", 20000L, 20000L + 65536L / 8))
    for ((cn, lo, hi) <- bands) {
      val z = band(zPath, cn, lo, hi)
      val s = band(sPath, cn, lo, hi)
      assert(z.agg(sum("a"), sum("b"), sum("c")).collect().head ===
        s.agg(sum("a"), sum("b"), sum("c")).collect().head, s"dim $cn results")
      val decoded = rowsDecoded(z)
      assert(decoded <= (n * 7) / 10, s"dim $cn failed to skip: $decoded of $n")
    }
  }

  test("compaction: file count drops, content identical, swap leaves no debris") {
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-compact")
    val data = (0L until 5000L).map(i => (i, s"v$i")).toDF("id", "v")
    data.repartition(40).write.mode("overwrite").parquet(path)
    val before = spark.read.parquet(path).orderBy("id").collect().toSeq
    val rep = StorageLayout.compactSmallFiles(spark, path, targetRowsPerFile = 1000L)
    assert(rep.filesBefore === 40L && rep.rows === 5000L)
    assert(rep.filesAfter === 5L, s"expected 5 files, got ${rep.filesAfter}")
    val after = spark.read.parquet(path).orderBy("id").collect().toSeq
    assert(after === before)
    // ledger-first swap: no tmp/old debris remains
    assert(!new java.io.File(path + ".compact.tmp").exists())
    assert(!new java.io.File(path + ".old").exists())
    // idempotent re-run: already at target -> file count unchanged
    val rep2 = StorageLayout.compactSmallFiles(spark, path, targetRowsPerFile = 1000L)
    assert(rep2.filesAfter === 5L && rep2.rows === 5000L)
  }

  test("deleteWhere: rewrite touches only files containing matches") {
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-delete")
    val data = (0L until 20000L).map(i => (i, s"v$i")).toDF("id", "v")
    // range-clustered on the delete key: matches land in few files
    StorageLayout.writeRangeClustered(data, path, "id", numFiles = 10)
    val rep = StorageLayout.deleteWhere(spark, path, col("id") < 3000L)
    assert(rep.rowsBefore === 20000L && rep.rowsDeleted === 3000L)
    assert(rep.filesTotal === 10L)
    assert(rep.filesRewritten <= 3L,
      s"clustered delete should touch few files, rewrote ${rep.filesRewritten}")
    val after = spark.read.parquet(path)
    assert(after.count() === 17000L)
    assert(after.filter($"id" < 3000L).count() === 0L)
    assert(after.agg(sum("id")).head.getLong(0) ===
      data.filter($"id" >= 3000L).agg(sum("id")).head.getLong(0))
    assert(!new java.io.File(path + ".delete.tmp").exists())
    assert(!new java.io.File(path + ".old").exists())
  }

  test("adviseLayout: partition / range_cluster / zorder_with / none roles") {
    val prof = Seq(
      ("lang", 100L, 0L, 5L, "a", "z"),     // low-card, no nulls -> partition
      ("id", 100L, 0L, 100L, "1", "99"),    // top clusterable -> range_cluster
      ("text", 100L, 0L, 95L, "a", "z"),    // high-card but NOT clusterable -> none
      ("score", 100L, 0L, 80L, "0", "9"),   // clusterable runner-up -> zorder_with
      ("flag", 100L, 2L, 2L, "0", "1"),     // nulls disqualify partition -> none
      ("const", 100L, 0L, 1L, "x", "x"))    // single value -> none
      .toDF("col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
    val roles = StorageLayout.adviseLayout(
      prof, clusterable = Seq("id", "score", "const"))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(roles === Map("lang" -> "partition", "id" -> "range_cluster",
      "text" -> "none", "score" -> "zorder_with", "flag" -> "none",
      "const" -> "none"))
  }

  test("deleteWhere: no-match no-op; all-match refused") {
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-delete-edge")
    val data = (0L until 100L).map(i => (i, i * 2)).toDF("id", "w")
    data.repartition(4).write.mode("overwrite").parquet(path)
    val before = spark.read.parquet(path).inputFiles.sorted.toSeq
    val rep = StorageLayout.deleteWhere(spark, path, col("id") < 0L)
    assert(rep.filesRewritten === 0L && rep.rowsDeleted === 0L)
    assert(spark.read.parquet(path).inputFiles.sorted.toSeq === before,
      "no-match delete must not touch any file")
    intercept[IllegalArgumentException] {
      StorageLayout.deleteWhere(spark, path, col("id") >= 0L)
    }
    assert(spark.read.parquet(path).count() === 100L, "refused delete must not mutate")
  }

  test("deleteWhere keeps rows whose predicate evaluates to NULL") {
    // nullable delete column: NULL rows did NOT match the predicate
    // and must survive the rewrite (bare !predicate is NULL for them
    // and would silently drop them; the rowsBefore-rowsDeleted
    // verification then catches nothing because both sides shrank)
    val path = graft.SparkEntry.perProcessTmpDir("graft-spec-delete-null")
    val data = (0L until 100L)
      .map(i => (i, if (i % 10 == 0) None else Some(i * 2)))
      .toDF("id", "w")
    data.repartition(2).write.mode("overwrite").parquet(path)
    val rep = StorageLayout.deleteWhere(spark, path, col("w") < 40L)
    // matched: w=2i<40, non-null → ids 1..19 except 10 → 18 rows
    val kept = spark.read.parquet(path)
    assert(rep.rowsDeleted === 18L)
    assert(kept.count() === 82L)
    assert(kept.where(col("w").isNull).count() === 10L,
      "all NULL-predicate rows must survive the delete")
  }
}
