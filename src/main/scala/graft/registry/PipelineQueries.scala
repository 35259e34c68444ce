package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Pipeline query registry — corpus assembly (sampling, mixtures, budgets, shards, packing, manifests) + mergeable sketches.
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // deterministic md5-bucket sampling (~12.5%): same kept set in any
    // engine/run/partitioning — the oracle recomputes the bucket in SQL
    "q48_sample" -> ((s, dir) => {
      graft.operators.Sampling.deterministicSample(
        table(s, dir, "documents"), col("doc_id"), keepBuckets = 32)
        .select(col("doc_id"), col("lang"))
    }),


    // per-row-probability importance resampling (round-11; the DSIR /
    // example-level reweighting primitive): every doc's acceptance
    // probability derives from its length — p_x10000 =
    // min(10000, n_chars*10000 div (n_chars+500)), a saturating
    // quality-ish curve — and the keep decision is the exact integral
    // hash gate hash60(salt||id) mod 10000 < p. One narrow codegen'd
    // filter; oracle replays hash + curve bit-for-bit (q82's hash60)
    "q161_importance_sample" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .withColumn("prob_x10000",
          least(lit(10000L),
            expr("CAST(n_chars * 10000 DIV (n_chars + 500) AS BIGINT)")))
      graft.operators.Sampling.importanceResample(
        docs, col("doc_id"), col("prob_x10000"))
        .select(col("doc_id"), col("lang"), col("prob_x10000"))
    }),


    // bucketed co-located join (round-11; the warehouse fact/dim
    // layout): orders and customer written as 8-bucket tables on the
    // customer key, then joined WITHOUT any ShuffleExchange (spec
    // plan-asserts it) — the shuffle is paid once at write time and
    // amortized across every later join on the key. Revenue in exact
    // integral cents so the sum is order-independent; oracle is the
    // plain join/agg over the base tables (the layout must be
    // result-transparent)
    "q172_colocated_join" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val o = graft.operators.StorageLayout.writeBucketed(
        table(s, dir, "orders").select(col("o_custkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("_sl_cents")),
        s"graft_bkt_orders_$sfx",
        perProcessTmpDir(s"graft-bkt-orders-$sfx"),
        numBuckets = 8, bucketCol = "o_custkey")
      val c = graft.operators.StorageLayout.writeBucketed(
        table(s, dir, "customer").select(
          col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        s"graft_bkt_customer_$sfx",
        perProcessTmpDir(s"graft-bkt-customer-$sfx"),
        numBuckets = 8, bucketCol = "o_custkey")
      graft.operators.StorageLayout.colocatedJoin(o, c, "o_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("_sl_cents")).as("revenue_cents"))
    }),


    // partition-pruned scan (round-11): documents written partitioned
    // by lang (5 directories), read back filtered to one lang — the
    // scan touches 1/5 of the files before decoding a row (spec
    // asserts the pushed PartitionFilters and the pruned file count).
    // Oracle is the plain filtered aggregate over the base table
    "q173_partition_prune" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-part-docs-$sfx")
      graft.operators.StorageLayout.writePartitioned(
        table(s, dir, "documents").select(col("doc_id"), col("source"),
          col("lang"),
          graft.textops.TextAnalysis.nTokens(col("text")).cast("long")
            .as("n_tokens")),
        path, "lang")
      graft.operators.StorageLayout.readPartitioned(s, path)
        .filter(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    }),


    // range-clustered scan (round-11): documents written range-
    // partitioned + sorted on the high-cardinality n_chars column (no
    // directory partitioning possible there), read back with a band
    // predicate — the pushed filter skips whole row groups via the
    // tight per-file min/max (spec pins the skip differentially).
    // Layout is result-transparent; oracle is the plain filtered agg
    "q175_range_cluster" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-rc-docs-$sfx")
      graft.operators.StorageLayout.writeRangeClustered(
        table(s, dir, "documents").select(
          col("doc_id"), col("lang"), col("n_chars")),
        path, "n_chars", numFiles = 8)
      s.read.parquet(path)
        .filter(col("n_chars").between(100L, 250L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),


    // z-order clustered scan (round-11): one cluster key serving
    // band predicates on EITHER of two numeric columns (doc_id,
    // n_chars) — the filter below is on the SECOND dimension, the one
    // plain range clustering on doc_id could not skip for. Result-
    // transparent; oracle is the plain filtered aggregate
    "q176_zorder" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-zo-docs-$sfx")
      graft.operators.StorageLayout.writeZOrdered(
        table(s, dir, "documents").select(
          col("doc_id"), col("lang"), col("n_chars")),
        path, "doc_id", "n_chars", numFiles = 8, bits = 6)
      s.read.parquet(path)
        .filter(col("doc_id").between(50L, 400L) &&
          col("n_chars").between(100L, 250L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),


    // small-file compaction (round-11): a 40-file ingest mess
    // coalesced (no shuffle) to ~4 row-targeted files and swapped in
    // ledger-first; the compacted table must read back identically —
    // oracle is the plain aggregate over the base table (spec pins
    // the file counts and the no-delete-window swap)
    "q177_compaction" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-cp-docs-$sfx")
      val base = table(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"))
      base.repartition(40).write.mode("overwrite").parquet(path)
      val total = base.count()
      graft.operators.StorageLayout.compactSmallFiles(
        s, path, targetRowsPerFile = math.max(1L, total / 4))
      s.read.parquet(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),


    // versioned-table history (round-11): the DESCRIBE HISTORY surface
    // over a create + retention-delete chain; footer-count reads, no
    // data scan. Oracle recomputes both versions' row counts
    "q187_table_history" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlog-hist-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents").select(col("doc_id"), col("n_chars")))
      graft.operators.TableLog.deleteWhere(s, path, col("n_chars") < 150L)
      graft.operators.TableLog.history(s, path)
    }),


    // key-skew diagnosis (round-11): top-20 event users by row count
    // with x10000 table share — the report that decides whether a join
    // needs salting BEFORE the long job finds out. Global top-k rides
    // the rank-limit pushdown, never a one-task sort
    "q188_key_skew" -> ((s, dir) => {
      graft.operators.Skew.keySkewReport(
        eventsTable(s, dir), col("user_id"), topK = 20)
    }),


    // ingest-volume anomaly report (round-11): per pseudo-day char
    // totals vs the trailing-7-day exact median — day 12 carries a
    // planted spike the robust baseline must flag without the spike
    // dragging later days' baselines
    "q186_ingest_anomaly" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(
        expr("doc_id DIV 20").as("day"),
        (col("n_chars") + when(expr("doc_id DIV 20") === 12, 100000L)
          .otherwise(0L)).as("m"))
      graft.operators.IngestMonitor.volumeAnomalies(
        docs, col("day"), col("m"))
    }),


    // 3-dim z-order (round-11): one cluster key serving bands on any
    // of (doc_id, n_chars, n_tokens); the query filters TWO of the
    // three. Result-transparent; oracle is the plain filtered agg
    // with the q173 token shape
    "q185_zorder3" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-zo3-docs-$sfx")
      graft.operators.StorageLayout.writeZOrderedN(
        table(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("n_chars"),
          graft.textops.TextAnalysis.nTokens(col("text")).cast("long")
            .as("n_tokens")),
        path, Seq("doc_id", "n_chars", "n_tokens"), numFiles = 8, bits = 5)
      s.read.parquet(path)
        .filter(col("doc_id").between(50L, 400L) &&
          col("n_tokens").between(20L, 70L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          sum(col("n_tokens")).as("sum_tokens"))
    }),


    // layout advisor (round-11): the q179 profile fed through
    // deterministic partition/cluster/zorder selection rules — the
    // stats→physical-design loop closed (lang/source become directory
    // partitions, the highest-cardinality column range-clusters, the
    // runner-up pairs into a z-order)
    "q184_layout_advisor" -> ((s, dir) => {
      graft.operators.StorageLayout.adviseLayout(
        graft.operators.TableProfile.profile(
          table(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars", "text")),
        clusterable = Seq("doc_id", "n_chars"))
    }),


    // funnel trend across snapshots (round-11; q174 × q85): the same
    // four gates run on the previous and current corpus snapshots
    // (q85's derivations: old drops %89 and carries "v1 "-prefixed
    // texts for %13, new drops %97), joined per gate with signed
    // deltas — the release-over-release gate-drift report
    "q183_funnel_trend" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 89 =!= 0)
        .select(when(col("doc_id") % 13 === 0,
          concat(lit("v1 "), coalesce(col("text"), lit(""))))
          .otherwise(col("text")).as("text"))
      val newSnap = docs.filter(col("doc_id") % 97 =!= 0).select(col("text"))
      val (so, go) = funnelScoredFrame(oldSnap, Seq.empty)
      val (sn, gn) = funnelScoredFrame(newSnap, Seq.empty)
      val fo = graft.operators.Funnel.report(so, go)
        .select(col("gate_ord"), col("gate"),
          col("n_rows").as("old_rows"), col("n_fail").as("old_fail"),
          col("n_survive").as("old_survive"))
      val fn = graft.operators.Funnel.report(sn, gn)
        .select(col("gate_ord"), col("gate"),
          col("n_rows").as("new_rows"), col("n_fail").as("new_fail"),
          col("n_survive").as("new_survive"))
      fo.join(fn, Seq("gate_ord", "gate"))
        .withColumn("d_fail", col("new_fail") - col("old_fail"))
        .withColumn("d_survive", col("new_survive") - col("old_survive"))
    }),


    // split-leakage audit (round-11): exact duplicates planted at
    // id+100000 carry DIFFERENT md5 split buckets, so per-row
    // bucketing scatters the copies across splits — the audit groups
    // by content hash and reports every observed split-set ("test,
    // train" rows are memorized-eval contamination). q93's split rule
    "q191_split_leakage" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.unionByName(
        docs.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      val split = graft.operators.Sampling.assignSplit(
        planted, col("doc_id"), valBuckets = 13, testBuckets = 26)
      graft.operators.SplitAudit.exactDupLeakage(
        split, col("text"), col("split"))
    }),


    // percentile-rank normalization (round-11): the en-stopword score
    // mapped to exact corpus percentiles — the comparability layer
    // between differently scaled quality signals. Global rank via the
    // chunked two-phase cumsum (no unpartitioned window over data
    // rows); ties spread by a salted hash so the oracle replays the
    // full deterministic order
    "q190_percentile_rank" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val toks = graft.textops.TextAnalysis.tokens(lower(col("text")))
      val scored = docs.select(col("doc_id"),
        graft.textops.TextAnalysis.stopwordCount(toks,
          graft.textops.TextAnalysis.stopwords("en")).cast("long").as("_st"),
        size(toks).cast("long").as("_nt"))
        .withColumn("score", expr(
          "CAST(10000 * _st DIV greatest(_nt, 1) AS BIGINT)"))
        .select(col("doc_id"), col("score"))
      graft.operators.Calibration.percentileRank(
        scored, col("doc_id"), col("score"))
    }),


    // water-fill applied (round-11): the q181 allocation plan joined
    // back (broadcast — #langs rows) and materialized by a per-lang
    // running-char cut at each lang's own allocation — plan →
    // training-mix rows in one shuffle
    "q189_water_fill_apply" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"))
      val totals = docs.groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("avail"))
        .withColumn("wgt", when(col("lang") === "zh", 8L).otherwise(1L))
      val b = totals.agg(sum(col("avail")).as("_tot"))
        .select(expr("_tot DIV 2").as("_mxb"))
      val plan = graft.operators.Mixture.waterFill(
        totals.crossJoin(broadcast(b)), "lang", "avail", "wgt", col("_mxb"))
        .select(col("lang"), col("allocated"))
      graft.operators.Budget.takeWhileBudgetPerGroupVar(
        docs.join(broadcast(plan), Seq("lang")),
        Seq(col("lang")), col("doc_id"), col("n_chars"),
        col("allocated"), cumCol = "cum_chars")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("cum_chars"))
    }),


    // OPTIMIZE as a committed version (round-12): documents created
    // hash-scattered in a TableLog store, reclustered by
    // optimizeRange (Delta's OPTIMIZE shape — time-travelable, old
    // version readable throughout), then a band served through
    // readBand: the file list is cut against the manifest's
    // footer-stats bounds BEFORE Spark plans the scan. Layout is
    // result-transparent — the oracle is the plain band filter
    "q192_optimize_range" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlopt-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartition(8))
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", numFiles = 8)
      graft.operators.TableLog.readBand(s, path, "doc_id", 100L, 400L)
    }),


    // z-order OPTIMIZE as a committed version (round-12): recluster
    // on (n_chars, doc_id), then a manifest-pruned band on n_chars —
    // the dimension a doc_id-ranged layout cannot serve — aggregated
    // per lang. Result-transparent again
    "q193_optimize_zorder" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlzo-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartition(8))
      graft.operators.TableLog.optimizeZOrder(
        s, path, Seq("n_chars", "doc_id"), numFiles = 8, bits = 6)
      graft.operators.TableLog.readBand(s, path, "n_chars", 150L, 300L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),


    // vacuum + history (round-12): create → retention delete →
    // compact, then vacuum to the last two versions — history reports
    // exactly the READABLE versions (the watermark guard keeps
    // vacuumed versions failing fast, spec-pinned); row counts are
    // recomputable from the base table, so the whole
    // maintenance chain is oracle-checked
    "q194_vacuum_history" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlvac-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartition(4))
      graft.operators.TableLog.deleteWhere(s, path, col("n_chars") < 150L)
      graft.operators.TableLog.compact(s, path, targetRowsPerFile = 100000L)
      graft.operators.TableLog.vacuum(s, path, keepVersions = 2)
      graft.operators.TableLog.history(s, path)
    }),


    // annealed multi-epoch mixture schedule (round-12): three epochs
    // from the natural-ish zh-8x mix to a uniform mix, each epoch
    // water-filling a sixth of the corpus from the availability the
    // previous epochs left behind (no data repetition across the
    // schedule — the two-stage/mid-training data-schedule shape).
    // Pure integer interpolation + the q181 arithmetic, so the oracle
    // replays all three chained epochs
    "q195_anneal_schedule" -> ((s, dir) => {
      val totals = table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("avail"))
        .withColumn("sw", when(col("lang") === "zh", 8L).otherwise(1L))
        .withColumn("ew", lit(1L))
      val b = totals.agg(sum(col("avail")).as("_tot"))
        .select(expr("_tot DIV 6").as("_mxb"))
      graft.operators.Mixture.annealSchedule(
        totals.crossJoin(broadcast(b)), "lang", "avail", "sw", "ew",
        epochs = 3, budgetPerEpoch = col("_mxb"))
    }),


    // manifest-pruned band delete (round-12): on a table clustered on
    // the delete key, the TTL/GDPR delete's match-discovery job scans
    // only the files whose manifest bounds overlap the band — the
    // whole-table `_metadata` pass becomes a band-proportional one.
    // Result-transparent: survivors' aggregate
    "q200_delete_band" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tldb-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartition(4))
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", numFiles = 8)
      graft.operators.TableLog.deleteBand(s, path, "doc_id", 100L, 200L)
      graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }),


    // DV SQL round-trip (round-16): the resurrection shapes the
    // round-15 judge caught — a DV'd table copied through CREATE
    // TABLE AS SELECT * and a BARE INSERT INTO ... SELECT * (no
    // Filter shielding the relation). Both SQL DELETEs route
    // merge-on-read under the conf; the copies must carry only LIVE
    // rows whether the optimizer rewrite or the DV-aware scan serves
    // the read. Result-transparent: the oracle replays the deletes
    // and doubles (CTAS copy + INSERT copy)
    "q232_dv_sql_roundtrip" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val src = perProcessTmpDir(s"graft-tldvsql-src-$sfx")
      val dst = perProcessTmpDir(s"graft-tldvsql-dst-$sfx")
      val fsys = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(src, dst).foreach(p =>
        fsys.delete(new org.apache.hadoop.fs.Path(p), true))
      graft.operators.TableLog.create(s, src,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartitionByRange(6, col("doc_id"))
          .sortWithinPartitions("doc_id"))
      s.conf.set("spark.graft.tablelog.deletionVectors", "true")
      try {
        s.sql(s"DELETE FROM tablelog.`$src` WHERE doc_id IN (7, 42, 99)")
        s.sql(s"DELETE FROM tablelog.`$src` WHERE n_chars < 110")
        s.sql(s"CREATE TABLE tablelog.`$dst` AS SELECT * FROM tablelog.`$src`")
        s.sql(s"INSERT INTO tablelog.`$dst` SELECT * FROM tablelog.`$src`")
      } finally s.conf.unset("spark.graft.tablelog.deletionVectors")
      s.sql(
        s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars,
           |  min(doc_id) AS min_id
           |FROM tablelog.`$dst` GROUP BY lang""".stripMargin)
    }),


    // merge-on-read MERGE (round-16): both merge shapes route to
    // deletion vectors under the conf — matched target rows die by
    // POSITION in one sidecar, update copies/inserts append; zero
    // data files rewritten (duel-pinned <1% of copy-on-write bytes).
    // merge() = whole-row upsert; mergeWhen() = conditional
    // delete + update + insert arms. Result-transparent: the oracle
    // replays both merges arithmetically over the base table
    "q233_dv_merge" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tldvm-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartitionByRange(6, col("doc_id"))
          .sortWithinPartitions("doc_id"))
      s.conf.set("spark.graft.tablelog.deletionVectors", "true")
      try {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        // whole-row upsert: periodic replacements + brand-new rows.
        // distinct(): merge requires unique source keys — a no-op on
        // the unique-doc_id testdata, an exact dedup under
        // ScaleSuite's replicated copies
        graft.operators.TableLog.merge(s, path,
          docs.where(col("doc_id") % 50L === 0L)
            .withColumn("lang", lit("up"))
            .withColumn("n_chars", col("n_chars") + 5L)
            .unionByName(docs.where(col("doc_id") < 20L)
              .select((col("doc_id") + 1000000000000L).as("doc_id"),
                lit("new").as("lang"), col("n_chars")))
            .distinct(),
          "doc_id")
        // general grammar: conditional delete, update, insert arms
        val src2 = docs.where(col("doc_id") % 30L === 0L)
          .select(col("doc_id"), col("doc_id").as("k"))
          .unionByName(docs.where(col("doc_id") % 500L === 0L)
            .select((col("doc_id") + 2000000000000L).as("doc_id"),
              (col("doc_id") + 2000000000000L).as("k")))
          .distinct()
        graft.operators.TableLog.mergeWhen(s, path, src2, "doc_id",
          matched = Seq(
            graft.operators.TableLog.MergeWhen.Delete(
              Some(col("_s_k") % 60L === 0L)),
            graft.operators.TableLog.MergeWhen.Update(None,
              Seq("n_chars" -> (col("n_chars") + 100L)))),
          notMatched = Seq(graft.operators.TableLog.MergeWhen.Insert(None,
            Seq("doc_id" -> col("_s_doc_id"), "lang" -> lit("ins"),
              "n_chars" -> lit(0L)))))
        ()
      } finally s.conf.unset("spark.graft.tablelog.deletionVectors")
      graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }),


    // equality deletes + streaming upsert (round-16): Iceberg's
    // equality-delete sidecar shape — a key delete commits ONE key
    // list with zero data files read or written (no discovery scan at
    // all), and each upsert epoch = delete batch keys from
    // pre-existing files + append the batch (the born-seq rule makes
    // the same commit's appends survive). Two stacked epochs pin
    // last-wins-by-key. Result-transparent: the oracle replays the
    // key algebra over the base table
    "q234_eq_upsert" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tleq-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.TableLog.create(s, path,
        docs.repartitionByRange(6, col("doc_id"))
          .sortWithinPartitions("doc_id"))
      // GDPR by key: one sidecar, zero data IO
      graft.operators.TableLog.deleteByKey(s, path,
        docs.where(col("doc_id") % 97L === 0L).select(col("doc_id")))
      // upsert epoch 0: periodic replacements + brand-new rows.
      // distinct(): one row per key per batch — a no-op on the
      // unique-doc_id testdata, an exact dedup under ScaleSuite's
      // replicated copies
      graft.operators.TableLog.upsertBatch(s, path,
        docs.where(col("doc_id") % 40L === 0L)
          .select(col("doc_id"), lit("u0").as("lang"),
            (col("n_chars") + 7L).as("n_chars"))
          .unionByName(docs.where(col("doc_id") < 15L)
            .select((col("doc_id") + 1000000000000L).as("doc_id"),
              lit("new0").as("lang"), col("n_chars")))
          .distinct(),
        Seq("doc_id"), "epoch-0")
      // upsert epoch 1: overlaps epoch 0 — last write wins per key
      graft.operators.TableLog.upsertBatch(s, path,
        docs.where(col("doc_id") % 80L === 0L)
          .select(col("doc_id"), lit("u1").as("lang"),
            (col("n_chars") + 11L).as("n_chars"))
          .unionByName(docs.where(col("doc_id") < 5L)
            .select((col("doc_id") + 1000000000000L).as("doc_id"),
              lit("u1n").as("lang"), lit(0L).as("n_chars")))
          .distinct(),
        Seq("doc_id"), "epoch-1")
      graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }),


    // equality-routed MERGE (round-16): under the eq conf an upsert
    // needs NO match discovery — the source keys die via one sidecar,
    // the source appends; two stacked merge epochs pin last-wins
    // through stacked sidecars. Result-transparent: the oracle
    // replays both epochs' key algebra
    "q235_eq_merge" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tleqm-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.TableLog.create(s, path,
        docs.repartitionByRange(6, col("doc_id"))
          .sortWithinPartitions("doc_id"))
      s.conf.set("spark.graft.tablelog.equalityDeletes", "true")
      try {
        graft.operators.TableLog.merge(s, path,
          docs.where(col("doc_id") % 45L === 0L)
            .withColumn("lang", lit("m0"))
            .withColumn("n_chars", col("n_chars") + 3L)
            .unionByName(docs.where(col("doc_id") < 12L)
              .select((col("doc_id") + 1000000000000L).as("doc_id"),
                lit("n0").as("lang"), col("n_chars")))
            .distinct(),
          "doc_id")
        graft.operators.TableLog.merge(s, path,
          docs.where(col("doc_id") % 90L === 0L)
            .withColumn("lang", lit("m1"))
            .withColumn("n_chars", col("n_chars") + 9L)
            .unionByName(docs.where(col("doc_id") < 4L)
              .select((col("doc_id") + 1000000000000L).as("doc_id"),
                lit("n1").as("lang"), lit(1L).as("n_chars")))
            .distinct(),
          "doc_id")
        ()
      } finally s.conf.unset("spark.graft.tablelog.equalityDeletes")
      graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }),


    // deletion vectors (round-15): the point-delete-heavy GDPR
    // workload merge-on-read was built for — three point deletes and a
    // sparse band delete land as (file, position) sidecars (ZERO data
    // files rewritten — spec-pinned counted IO), an UPDATE then folds
    // the touched files' vectors in. Reads/time-travel/CDC all
    // position-compensate. Result-transparent: the oracle replays the
    // delete predicates and the update over the base table
    "q229_deletion_vectors" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tldv-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartitionByRange(8, col("doc_id"))
          .sortWithinPartitions("doc_id"))
      // GDPR-style point deletes: each writes O(1 row), not O(file)
      graft.operators.TableLog.deleteWhereDV(s, path, col("doc_id") === 7L)
      graft.operators.TableLog.deleteWhereDV(s, path,
        col("doc_id").isin(42L, 99L, 123L))
      // sparse band: positions scattered across many files — still
      // zero rewrites
      graft.operators.TableLog.deleteWhereDV(s, path,
        col("n_chars") < 120L && col("doc_id") % 10L === 3L)
      // copy-on-write UPDATE over vectored files folds their vectors
      graft.operators.TableLog.updateWhere(s, path,
        Seq("lang" -> lit("xx")), col("doc_id").between(200L, 220L))
      // merge-on-read UPDATE: positions die, updated copies append
      graft.operators.TableLog.updateWhereDV(s, path,
        Seq("n_chars" -> (col("n_chars") + 1000L)),
        col("doc_id").between(300L, 310L))
      graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }),


    // schema evolution on append (round-12): the table's schema lives
    // in the manifest (Delta/Iceberg's move — readers never open a
    // footer to plan, and evolution is a LOG property): an appended
    // batch carries a NEW column, old rows read back NULL there, and
    // the pre-evolution version still reads with its own schema.
    // Result-transparent modulo the evolution rule the oracle replays
    "q201_schema_evolution" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlse-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
      graft.operators.TableLog.create(s, path,
        docs.where(col("doc_id") < 300L)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartition(2))
      graft.operators.TableLog.append(s, path,
        docs.where(col("doc_id") >= 300L)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
          .repartition(2))
      graft.operators.TableLog.read(s, path)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),


    // group-atomic split assignment (round-12): the constructive fix
    // to the q191 audit — splits keyed on CONTENT hash, so the
    // planted exact duplicates can never straddle train/val/test; the
    // output is the same audit, now showing only single-split groups
    "q202_group_split" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.unionByName(
        docs.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      val split = graft.operators.SplitAudit.assignSplitByContent(
        planted, col("text"), valBuckets = 13, testBuckets = 26)
      graft.operators.SplitAudit.exactDupLeakage(
        split, col("text"), col("split"))
    }),


    // near-dup-atomic split (round-12): the q36 component machinery
    // composed with the salted split bucket — a whole near-dup
    // CLUSTER (here the deterministic adjacent-id/same-length-bucket
    // edge rule the q36/q37 oracles replay) lands in one split, the
    // guarantee content-hash splitting cannot give when near-dups
    // differ byte-wise. Output: per-split component and doc counts
    "q203_component_split" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val edges = docs.select(col("doc_id").as("id_a"),
          expr("n_chars DIV 100").as("_ba"))
        .join(docs.select(col("doc_id").as("id_b"),
          expr("n_chars DIV 100").as("_bb")),
          col("id_b") === col("id_a") + 1 && col("_ba") === col("_bb"))
        .select("id_a", "id_b")
      graft.operators.SplitAudit.assignSplitByComponent(
        docs.select(col("doc_id")), "doc_id", edges,
        valBuckets = 13, testBuckets = 26)
        .groupBy(col("split"))
        .agg(countDistinct(col("component")).as("n_components"),
          count(lit(1)).as("n_docs"))
    }),


    // RESTORE as a committed version (round-12): a bad retention
    // delete rolled back by re-committing v1's manifest (zero data
    // IO), with the bad version still readable — the report joins
    // the restored state and the bad state, both oracle-recomputed
    "q207_restore" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlres-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartition(4))
      graft.operators.TableLog.deleteWhere(s, path, col("n_chars") < 150L)
      graft.operators.TableLog.restore(s, path, 1L)
      val restored = graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val bad = graft.operators.TableLog.read(s, path, Some(2L))
        .groupBy(col("lang")).agg(count(lit(1)).as("_nb"))
      restored.join(bad, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("sum_chars"),
          coalesce(col("_nb"), lit(0L)).as("n_docs_bad"))
    }),


    // annealed schedule with per-epoch QUALITY FLOORS (round-13;
    // q170's threshold sweep composed into q195's epoch windows):
    // epoch e fills only from documents whose stopword score clears
    // ITS floor (1200 / 600 / 0, relaxing — the "high-quality data
    // first" schedule), minus what earlier epochs consumed; budget a
    // sixth of the corpus per epoch. Epoch 0's cleared pool is
    // SCARCER than the budget (every stratum saturates — the whole
    // quality tier is taken), epoch 1 water-fills normally. One
    // corpus pass builds all three cleared pools (one conditional
    // sum per floor); the schedule itself runs on #strata rows
    "q208_anneal_floors" -> ((s, dir) => {
      val toks = graft.textops.TextAnalysis.tokens(lower(col("text")))
      val scored = table(s, dir, "documents").select(
        col("lang"), col("n_chars").cast("long").as("n_chars"),
        graft.textops.TextAnalysis.stopwordCount(toks,
          graft.textops.TextAnalysis.stopwords("en"))
          .cast("long").as("_gf_stop"),
        size(toks).cast("long").as("_gf_ntok"))
        .withColumn("_gf_score", expr(
          "CAST(10000 * _gf_stop DIV greatest(_gf_ntok, 1) AS BIGINT)"))
      val cleared = scored.groupBy(col("lang")).agg(
        coalesce(sum(when(col("_gf_score") >= 1200L, col("n_chars"))),
          lit(0L)).as("_c0"),
        coalesce(sum(when(col("_gf_score") >= 600L, col("n_chars"))),
          lit(0L)).as("_c1"),
        coalesce(sum(col("n_chars")), lit(0L)).as("_c2"))
      val perEpoch = cleared
        .select(col("lang"),
          expr("stack(3, 0, _c0, 1, _c1, 2, _c2) AS (epoch, cleared)"))
        .withColumn("sw", when(col("lang") === "zh", 8L).otherwise(1L))
        .withColumn("wgt",
          col("sw") * (lit(2L) - col("epoch")) + col("epoch").cast("long"))
      val b = table(s, dir, "documents")
        .agg(sum(col("n_chars")).as("_tot"))
        .select(expr("_tot DIV 6").as("_mxb"))
      graft.operators.Mixture.annealScheduleGated(
        perEpoch.crossJoin(broadcast(b)), "lang", "epoch", "cleared",
        "wgt", col("_mxb"))
    }),


    // hive-partitioned TableLog store (round-13): per-file partition
    // VALUES recorded in the manifest (the Iceberg partition record),
    // appended to with appendPartitioned, then a partition-equality +
    // stats-band read — both prunings decided from ONE manifest read
    // (the spec pins files_planned == the partition's pruned set).
    // Result-transparent: the oracle is the plain filtered aggregate
    // over base + appended rows
    "q209_partitioned_log" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlpart-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      graft.operators.TableLog.createPartitioned(
        s, path, docs.repartition(4), Seq("lang"))
      graft.operators.TableLog.appendPartitioned(s, path,
        docs.where(col("doc_id") < 50L)
          .select((col("doc_id") + 300000L).as("doc_id"),
            col("lang"), col("source"), col("n_chars")))
      // per-partition OPTIMIZE: recluster en's files on the band
      // column (other partitions carry over by name), so the
      // band-read below prunes files WITHIN the partition too
      graft.operators.TableLog.optimizePartition(
        s, path, Map("lang" -> "en"), "n_chars", numFiles = 4)
      graft.operators.TableLog.readPartitionBand(
        s, path, Map("lang" -> "en"), "n_chars", 100L, 300L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),


    // change feed (round-13): the version-stamped CDC chain over a
    // maintenance sequence — retention delete, append, second delete —
    // per-version changes aggregated; each version's diff reads only
    // that commit's changed files. Result-transparent: the oracle
    // recomputes all three change sets from the base table, including
    // the second delete catching the APPENDED rows in its band
    "q210_change_feed" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlcf-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      // materialized CDC (round-14): the rewrite commits below also
      // write their change sets at commit, so changes() serves the
      // range from change files with zero exceptAll recompute (the
      // append's version reconstructs exchange-free); the spec pins
      // multiset equality of both paths
      s.conf.set("spark.graft.tablelog.writeChangeFiles", "true")
      try {
        graft.operators.TableLog.create(s, path, docs.repartition(4))
        graft.operators.TableLog.optimizeRange(s, path, "n_chars", numFiles = 8)
        graft.operators.TableLog.deleteBand(s, path, "n_chars", 0L, 149L)
        graft.operators.TableLog.append(s, path,
          docs.where(col("doc_id") < 50L)
            .select((col("doc_id") + 400000L).as("doc_id"),
              col("lang"), col("n_chars")))
        graft.operators.TableLog.deleteBand(s, path, "n_chars", 150L, 199L)
      } finally s.conf.unset("spark.graft.tablelog.writeChangeFiles")
      graft.operators.TableLog.changes(s, path, 2L, 5L)
        .groupBy(col("_commit_version"), col("change"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),


    // MERGE / upsert (round-13): on a doc_id-clustered store, upsert
    // a source that UPDATES the first 50 ids (n_chars + 100000) and
    // INSERTS 50 shifted ones — candidate files come from the
    // manifest bounds against the source key range, only files
    // containing matches are rewritten, the rest carry over by name.
    // Result-transparent: the oracle replays the upsert over the
    // base table
    "q211_merge_upsert" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlmrg-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.TableLog.create(s, path, docs.repartition(4))
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", numFiles = 8)
      val src = docs.where(col("doc_id") < 50L)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 100000L).as("n_chars"))
        .unionByName(docs.where(col("doc_id") < 50L)
          .select((col("doc_id") + 500000L).as("doc_id"), col("lang"),
            col("n_chars").cast("long").as("n_chars")))
      graft.operators.TableLog.merge(s, path, src, "doc_id")
      graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
    }),


    // partition retention (round-13): the zero-IO partition drop —
    // a whole lang leaves the table as a pure manifest edit
    // (ALTER TABLE DROP PARTITION), then a partitioned upsert lands
    // post-drop rows; the read aggregates the surviving state.
    // Result-transparent: drop = filter, append = union
    "q213_partition_drop" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlpdrop-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      graft.operators.TableLog.createPartitioned(
        s, path, docs.repartition(4), Seq("lang"))
      graft.operators.TableLog.deletePartition(s, path, Map("lang" -> "de"))
      graft.operators.TableLog.appendPartitioned(s, path,
        docs.where(col("doc_id") < 30L)
          .select((col("doc_id") + 600000L).as("doc_id"),
            lit("de").as("lang"), col("source"), col("n_chars")))
      graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }),


    // bloom point lookups (round-13): a hash-scattered key no
    // clustering serves — every file's bounds span the domain —
    // rewritten with parquet-native blooms (optimizeBloom), then five
    // equality probes through readPoint (the Eq predicate reaches
    // parquet's bloom row-group filter; duel-measured 8x decode cut
    // in the spec). Result-transparent: the oracle replays the key
    // arithmetic and the IN-list
    "q212_point_lookup" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlblm-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("k", expr("(doc_id * 2654435761) % 1000000007"))
      graft.operators.TableLog.create(s, path, docs.repartition(8))
      graft.operators.TableLog.optimizeBloom(
        s, path, Seq("k"), numFiles = 8, expectedNdv = 100000L)
      val keys = Seq(7L, 19L, 23L, 31L, 42L)
        .map(i => (i * 2654435761L) % 1000000007L)
      keys.map(k => graft.operators.TableLog.readPoint(s, path, "k", k))
        .reduce(_ unionByName _)
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"), col("k"))
    }),


    // SQL surface (round-13): the whole lifecycle through plain Spark
    // SQL against the DSv2 catalog — CREATE TABLE ... PARTITIONED BY,
    // two INSERT INTOs (each a committed version), then a
    // partition+band SELECT on latest UNIONed with the same read at
    // VERSION AS OF 2 (pre-second-insert). The WHERE reaches the
    // manifest: partition equality and n_chars bounds cut the file
    // list before Spark plans the scan (spec pins counted files).
    // Result-transparent: the oracle replays both states over the
    // base table
    "q214_sql_surface" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlsql-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      s.sql(s"CREATE TABLE tablelog.`$path` " +
        "(doc_id BIGINT, source STRING, n_chars BIGINT, lang STRING) " +
        "PARTITIONED BY (lang)")
      table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        .createOrReplaceTempView("q214_docs")
      s.sql(s"INSERT INTO tablelog.`$path` " +
        "SELECT doc_id, source, n_chars, lang FROM q214_docs")
      s.sql(s"INSERT INTO tablelog.`$path` " +
        "SELECT doc_id + 700000, source, n_chars, lang FROM q214_docs " +
        "WHERE doc_id < 40")
      s.sql(
        s"""SELECT 'latest' AS at, source, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM tablelog.`$path`
           |WHERE lang = 'en' AND n_chars BETWEEN 100 AND 300
           |GROUP BY source
           |UNION ALL
           |SELECT 'v2' AS at, source, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM tablelog.`$path` VERSION AS OF 2
           |WHERE lang = 'en' AND n_chars BETWEEN 100 AND 300
           |GROUP BY source""".stripMargin)
    }),


    // metadata tables (round-13): the log's own state as JOIN-able
    // relations — $partitions (per-partition file/row rollup from the
    // partition record) joined with a $history count, all answered
    // from manifests with zero data IO. Deterministic layout: a
    // single-task insert writes exactly one file per partition.
    // Result-transparent: the oracle derives the rollup from the
    // base table
    "q224_metadata_tables" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlmeta-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      s.sql(s"CREATE TABLE tablelog.`$path` " +
        "(doc_id BIGINT, n_chars BIGINT, lang STRING) PARTITIONED BY (lang)")
      table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
        .repartition(1)
        .createOrReplaceTempView("q224_docs")
      s.sql(s"INSERT INTO tablelog.`$path` " +
        "SELECT doc_id, n_chars, lang FROM q224_docs")
      s.sql(
        s"""SELECT p.partition, p.n_files, p.n_rows,
           |  (SELECT max(version) FROM tablelog.`$path$$history`) AS at_version
           |FROM tablelog.`$path$$partitions` p""".stripMargin)
    }),


    // general-shape SQL MERGE (round-13): the CDC-apply pattern — a
    // change batch with an op column lands through ONE MERGE with
    // conditional DELETE / partial UPDATE / conditional INSERT
    // actions (first applicable wins), routed to TableLog.mergeWhen;
    // candidate files stay manifest-bounded by the source key range.
    // Result-transparent: the oracle replays the three ops
    "q223_sql_merge_when" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlmw-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      graft.operators.TableLog.create(s, path, docs.repartition(4))
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", numFiles = 8)
      docs.where(col("doc_id") < 30L)
        .select(col("doc_id"), col("lang"), col("n_chars"), lit("D").as("op"))
        .unionByName(docs.where(col("doc_id") >= 30L && col("doc_id") < 60L)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 77L).as("n_chars"), lit("U").as("op")))
        .unionByName(docs.where(col("doc_id") < 20L)
          .select((col("doc_id") + 600000L).as("doc_id"), col("lang"),
            col("n_chars"), lit("I").as("op")))
        .createOrReplaceTempView("q223_src")
      s.sql(
        s"""MERGE INTO tablelog.`$path` t USING q223_src s
           |ON t.doc_id = s.doc_id
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET n_chars = s.n_chars
           |WHEN NOT MATCHED AND s.op = 'I' THEN
           |  INSERT (doc_id, lang, n_chars) VALUES (s.doc_id, s.lang, s.n_chars)
           |""".stripMargin)
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM tablelog.`$path`
           |GROUP BY lang""".stripMargin)
    }),


    // dynamic partition overwrite (round-14): the idempotent
    // partition-reload shape — INSERT OVERWRITE under
    // partitionOverwriteMode=dynamic replaces exactly the partitions
    // PRESENT in the batch (their files leave the manifest, every
    // other partition carries over by name, zero IO), committed as a
    // version. Result-transparent: the oracle swaps the en partition
    "q228_insert_overwrite" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlovw-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      graft.operators.TableLog.createPartitioned(
        s, path, docs.repartition(4), Seq("lang"))
      docs.where(col("lang") === "en" && col("doc_id") < 100L)
        .select(col("doc_id"), (col("n_chars") + 7L).as("n_chars"),
          col("lang"))
        .createOrReplaceTempView("q228_reload")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try s.sql(s"INSERT INTO tablelog.`$path` SELECT * FROM q228_reload")
      finally s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      // the INSERT INTO above appended; the overwrite is the point:
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try s.sql(s"INSERT OVERWRITE tablelog.`$path` SELECT * FROM q228_reload")
      finally s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM tablelog.`$path`
           |GROUP BY lang""".stripMargin)
    }),


    // multi-table transaction (round-14; root pointer round-15): each
    // ingest batch lands in the RAW table and its DERIVED per-lang
    // rollup as ONE logical commit (write-ahead intent +
    // tag-idempotent per-table CAS + roll-forward recovery), and every
    // commit CAS-bumps the shared ROOT pointer — the source->derived
    // pair can never be torn by a crash, and a root-resolved reader
    // (the final read here) can never see one table's new version with
    // the other's old one. Result-transparent: the derived sums equal
    // the full-corpus rollup the oracle computes
    "q227_txn_pipeline" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val raw = perProcessTmpDir(s"graft-tltxn-raw-$sfx")
      val der = perProcessTmpDir(s"graft-tltxn-der-$sfx")
      val root = perProcessTmpDir(s"graft-tltxn-root-$sfx")
      Seq(raw, der, root).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      }
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      def rollup(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
      graft.operators.TableLog.create(s, raw, docs.repartition(4))
      graft.operators.TableLog.create(s, der, rollup(docs))
      Seq(300000L, 600000L).zip(Seq(30L, 50L)).foreach { case (shift, cut) =>
        val batch = docs.where(col("doc_id") < cut)
          .select((col("doc_id") + shift).as("doc_id"), col("lang"),
            col("n_chars"))
        graft.operators.TableLog.transaction(s, Seq(
          raw -> batch, der -> rollup(batch)), root = Some(root))
      }
      // the consistent-pair read: both tables resolve through ONE
      // pinned root snapshot (also sanity-pinned against raw)
      val pinned = graft.operators.TableLog.rootSnapshot(s, root)
      require(pinned.keySet == Set(raw, der),
        s"root must register both participants, got ${pinned.keySet}")
      graft.operators.TableLog.readAtRoot(s, root, der)
        .groupBy(col("lang"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("sum_chars")).cast("long").as("sum_chars"))
    }),


    // SQL-only streaming pipeline (round-14): readStream.table ->
    // transform -> writeStream.toTable — the TableLog change stream
    // feeds the catalog's STREAMING_WRITE (executors write parquet
    // into data/, the driver's epoch commit publishes one tagged
    // version; exactly-once via the stable-queryId tag). A SQL-first
    // user never leaves the catalog. Result-transparent: the oracle
    // replays the filter over base + appended batch
    "q226_stream_table_pipeline" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val src = perProcessTmpDir(s"graft-tlsw-src-$sfx")
      val dst = perProcessTmpDir(s"graft-tlsw-dst-$sfx")
      val ck = perProcessTmpDir(s"graft-tlsw-ck-$sfx")
      Seq(src, dst, ck).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      }
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      graft.operators.TableLog.create(s, src, docs.repartition(4))
      graft.operators.TableLog.append(s, src,
        docs.where(col("doc_id") < 40L)
          .select((col("doc_id") + 900000L).as("doc_id"), col("lang"),
            col("n_chars")))
      s.sql(s"CREATE TABLE tablelog.`$dst` " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT)")
      val q = s.readStream.option("fromVersion", "0")
        .table(s"tablelog.`$src`")
        .where(col("n_chars") >= 100L)
        .writeStream.option("checkpointLocation", ck)
        .toTable(s"tablelog.`$dst`")
      try q.processAllAvailable() finally q.stop()
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  min(doc_id) AS min_id
           |FROM tablelog.`$dst`
           |GROUP BY lang""".stripMargin)
    }),


    // MERGE with NOT MATCHED BY SOURCE (round-14): the full Delta
    // WHEN grammar — one statement applies a feed snapshot as
    // deletes-by-absence: matched rows take the feed's value,
    // feed-only rows insert, and target rows the feed no longer
    // carries DELETE under a guard condition (rows outside the
    // feed's id domain survive untouched). Routed to
    // TableLog.mergeWhen's by-source actions. Result-transparent:
    // the oracle replays the three dispositions over the base table
    "q225_merge_by_source" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlnmbs-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      graft.operators.TableLog.create(s, path, docs.repartition(4))
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", numFiles = 8)
      docs.where(col("doc_id") >= 20L && col("doc_id") < 80L)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 55L).as("n_chars"))
        .unionByName(docs.where(col("doc_id") < 10L)
          .select((col("doc_id") + 800000L).as("doc_id"), col("lang"),
            col("n_chars")))
        .createOrReplaceTempView("q225_src")
      s.sql(
        s"""MERGE INTO tablelog.`$path` t USING q225_src s
           |ON t.doc_id = s.doc_id
           |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
           |WHEN NOT MATCHED THEN
           |  INSERT (doc_id, lang, n_chars) VALUES (s.doc_id, s.lang, s.n_chars)
           |WHEN NOT MATCHED BY SOURCE AND t.doc_id < 100 THEN DELETE
           |""".stripMargin)
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM tablelog.`$path`
           |GROUP BY lang""".stripMargin)
    }),


    // null statistics (round-13): per-file null counts recorded at
    // write (Delta/Iceberg's null_count) serve COUNT(col) and the
    // all-null-file-aware MIN/MAX from ONE manifest read, and prune
    // files under IS [NOT] NULL predicates (spec pins counted files).
    // Result-transparent: the oracle replays the planted-null rule
    "q222_null_stats" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlnull-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          when(col("doc_id") % 3 === 0, lit(null).cast("long"))
            .otherwise(col("n_chars").cast("long")).as("x"))
      graft.operators.TableLog.create(s, path, docs.repartition(4))
      s.sql(
        s"""SELECT count(*) AS n_rows, count(x) AS n_vals,
           |  min(x) AS lo, max(x) AS hi
           |FROM tablelog.`$path`
           |UNION ALL
           |SELECT count(*) AS n_rows, count(x) AS n_vals,
           |  min(x) AS lo, max(x) AS hi
           |FROM tablelog.`$path` WHERE x IS NOT NULL""".stripMargin)
    }),


    // SQL MERGE (round-13): q211's whole-row upsert through MERGE INTO
    // text — the injected resolution rule routes the SET */INSERT *
    // shape to TableLog.merge (manifest-bounded candidate files).
    // Result-transparent: same oracle derivation as q211
    "q221_sql_merge" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlsqlmrg-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      graft.operators.TableLog.create(s, path, docs.repartition(4))
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", numFiles = 8)
      docs.where(col("doc_id") < 50L)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 100000L).as("n_chars"))
        .unionByName(docs.where(col("doc_id") < 50L)
          .select((col("doc_id") + 500000L).as("doc_id"), col("lang"),
            col("n_chars")))
        .createOrReplaceTempView("q221_src")
      s.sql(
        s"""MERGE INTO tablelog.`$path` t USING q221_src s
           |ON t.doc_id = s.doc_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(max(n_chars) AS BIGINT) AS max_chars
           |FROM tablelog.`$path`
           |GROUP BY lang""".stripMargin)
    }),


    // SQL UPDATE (round-13): copy-on-write of exactly the files
    // containing matches — UPDATE ... SET ... WHERE through the
    // injected resolution rule (UpdateTable -> runnable command ->
    // TableLog.updateWhere), on a doc_id-clustered store so the
    // narrow key band touches few files. Result-transparent: the
    // oracle applies the same assignment conditionally
    "q220_sql_update" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlupd-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      graft.operators.TableLog.create(s, path, docs.repartition(4))
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", numFiles = 8)
      s.sql(s"UPDATE tablelog.`$path` " +
        "SET n_chars = n_chars + 1000000, lang = concat(lang, '-upd') " +
        "WHERE doc_id < 60")
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(max(n_chars) AS BIGINT) AS max_chars
           |FROM tablelog.`$path`
           |GROUP BY lang""".stripMargin)
    }),


    // SQL-only curation pipeline (round-13): the whole flow in SQL
    // text — graft_ntokens/graft_quality (injected functions) compute
    // the signals inside the INSERT, the quality floor is a DELETE,
    // the readout a partition-grouped aggregate; every step a
    // committed version. quality rounds to 4 decimals inside the
    // expression (q21-pinned), so the 0.5 floor compares identically
    // in both engines. Result-transparent: the oracle replays the
    // q21 quality formula and inverts the floor
    "q219_sql_pipeline" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlpipe-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      s.sql(s"CREATE TABLE tablelog.`$path` " +
        "(doc_id BIGINT, n_tokens BIGINT, quality DOUBLE, lang STRING) " +
        "PARTITIONED BY (lang)")
      table(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
        .createOrReplaceTempView("q219_docs")
      s.sql(s"INSERT INTO tablelog.`$path` " +
        "SELECT doc_id, CAST(graft_ntokens(text) AS BIGINT), " +
        "graft_quality(text), lang FROM q219_docs")
      s.sql(s"DELETE FROM tablelog.`$path` WHERE quality < 0.5")
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           |  CAST(sum(CAST(floor(quality * 10000 + 0.5) AS BIGINT)) AS BIGINT)
           |    AS sum_q4
           |FROM tablelog.`$path`
           |GROUP BY lang""".stripMargin)
    }),


    // SQL maintenance lifecycle (round-13): every step through plain
    // SQL — CREATE (v1, empty), INSERT (v2), CALL compact (v3, content
    // identical), DELETE (v4) — then CALL history reads the per-version
    // row counts FROM THE MANIFESTS (zero data IO). Result-transparent:
    // each version's count derives from the base table
    "q217_sql_maintenance" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlproc-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      s.sql(s"CREATE TABLE tablelog.`$path` " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT)")
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
        .createOrReplaceTempView("q217_docs")
      s.sql(s"INSERT INTO tablelog.`$path` " +
        "SELECT doc_id, lang, n_chars FROM q217_docs")
      s.sql(s"CALL tablelog.optimize('$path', 'n_chars', 8)")
      s.sql(s"DELETE FROM tablelog.`$path` WHERE n_chars < 150")
      s.sql(s"CALL tablelog.history('$path')")
    }),


    // manifest-only SQL aggregates (round-13): COUNT/MIN/MAX and the
    // per-partition GROUP BY answer from ONE manifest read — the scan
    // builder serves the complete aggregate from per-file row counts,
    // column bounds, and partition records as a LocalScan; the plan
    // collapses to a LocalTableScan with ZERO data files opened
    // (spec-pinned). At a 100k-file table this is the DESCRIBE-style
    // dashboard query for free. Result-transparent: the oracle
    // replays both aggregates over the base table
    "q216_metadata_agg" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlagg-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      s.sql(s"CREATE TABLE tablelog.`$path` " +
        "(doc_id BIGINT, n_chars BIGINT, lang STRING) PARTITIONED BY (lang)")
      table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
        .createOrReplaceTempView("q216_docs")
      s.sql(s"INSERT INTO tablelog.`$path` " +
        "SELECT doc_id, n_chars, lang FROM q216_docs")
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  min(n_chars) AS lo, max(n_chars) AS hi,
           |  min(doc_id) AS first_id, max(doc_id) AS last_id
           |FROM tablelog.`$path`
           |GROUP BY lang
           |UNION ALL
           |SELECT '_all' AS lang, count(*) AS n_docs,
           |  min(n_chars) AS lo, max(n_chars) AS hi,
           |  min(doc_id) AS first_id, max(doc_id) AS last_id
           |FROM tablelog.`$path`""".stripMargin)
    }),


    // DV maintenance lifecycle (round-15): a point-delete-heavy
    // sequence (five sidecar commits), the sidecar COMPACTION
    // (compact_dvs via SQL CALL — one merged sidecar, zero data IO),
    // a retention-0 vacuum sweeping the superseded sidecars, then
    // OPTIMIZE folding the survivors into clean files. Every read in
    // between position-compensates. Result-transparent: the oracle
    // inverts the delete predicates
    "q231_dv_maintenance" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tldvm-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartitionByRange(6, col("doc_id"))
          .sortWithinPartitions("doc_id"))
      (1L to 5L).foreach { k =>
        graft.operators.TableLog.deleteWhereDV(s, path,
          col("doc_id") === k * 50L)
      }
      s.sql(s"CALL tablelog.compact_dvs('$path')")
      s.conf.set("spark.graft.tablelog.retentionMs", "0")
      try s.sql(s"CALL tablelog.vacuum('$path', 1)")
      finally s.conf.unset("spark.graft.tablelog.retentionMs")
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", 6)
      graft.operators.TableLog.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }),


    // string MIN/MAX manifest pushdown (round-15): the footer's
    // is_min/max_value_exact flags (parquet-format 2.10) classify
    // every string bound at harvest — exact bounds ("s") serve
    // `min(lang)`-style aggregates straight from the manifest (the
    // require pins the zero-data-IO plan), possibly-truncated ones
    // ("t") prune but never serve. Result-transparent: the oracle is
    // the plain base-table aggregate (both engines compare strings in
    // binary order)
    "q230_string_bounds" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlsb-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"))
          .repartitionByRange(6, col("doc_id")))
      val out = s.sql(
        s"""SELECT min(lang) AS min_lang, max(lang) AS max_lang,
           |  min(source) AS min_source, max(source) AS max_source,
           |  count(*) AS n
           |FROM tablelog.`$path`""".stripMargin)
      out.queryExecution.executedPlan // force the scan build
      require(graft.sql.TableLogSql.tookAggServed(path),
        "q230: string MIN/MAX must serve from the manifest")
      out
    }),


    // SQL DELETE (round-13): retention expressed as plain SQL —
    // CREATE/INSERT, a length-floor DELETE, then a targeted per-lang
    // DELETE, read back as the surviving aggregate. Each DELETE is a
    // committed version rewriting only the files whose bounds overlap
    // its predicate. Result-transparent: the oracle inverts both
    // predicates over the base table
    "q215_sql_delete" -> ((s, dir) => {
      graft.sql.TableLogSql.register(s)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlsqldel-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      s.sql(s"CREATE TABLE tablelog.`$path` " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT)")
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
        .createOrReplaceTempView("q215_docs")
      s.sql(s"INSERT INTO tablelog.`$path` " +
        "SELECT doc_id, lang, n_chars FROM q215_docs")
      s.sql(s"DELETE FROM tablelog.`$path` WHERE n_chars < 150")
      s.sql(s"DELETE FROM tablelog.`$path` WHERE lang = 'de' AND n_chars > 400")
      s.sql(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  min(n_chars) AS min_chars
           |FROM tablelog.`$path`
           |GROUP BY lang""".stripMargin)
    }),


    // version diff / CDC between table versions (round-12): a
    // retention delete then an append, diffed v1 -> v3 — shared
    // manifest files cancel WITHOUT being read (immutability makes
    // name equality content equality), so the diff's IO is the
    // changed files. Result-transparent: the oracle recomputes both
    // change sets from the base table
    "q206_version_diff" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tldiff-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.TableLog.create(s, path, docs.repartition(4))
      graft.operators.TableLog.optimizeRange(s, path, "n_chars", numFiles = 8)
      graft.operators.TableLog.deleteBand(s, path, "n_chars", 0L, 149L)
      graft.operators.TableLog.append(s, path,
        docs.where(col("doc_id") < 50L)
          .select((col("doc_id") + 200000L).as("doc_id"),
            col("lang"), col("n_chars")))
      graft.operators.TableLog.diff(s, path, 2L, 4L)
        .groupBy(col("change"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),


    // near-dup-atomic split over REAL minhash edges (round-12): the
    // q25 LSH pair machinery feeds the component split — planted
    // byte-DIFFERENT twins (" graftdup" suffix) land in the same
    // split, which content-hash splitting (q202) cannot do. Oracle is
    // generated: engine-supplied shingles/bands, pairs + CC + bucket
    // all replayed in SQL (OracleGen.neardupSplitOracle)
    "q205_neardup_split" -> ((s, dir) => {
      val base = plantedDocs(s, dir)
      val pairs = graft.textops.NearDup.minhashPairs(
        base, "doc_id", "text", threshold = 0.5)
      graft.operators.SplitAudit.assignSplitByComponent(
        base.select(col("doc_id")), "doc_id",
        pairs.select(col("id_a"), col("id_b")),
        valBuckets = 13, testBuckets = 26)
        .groupBy(col("split"))
        .agg(countDistinct(col("component")).as("n_components"),
          count(lit(1)).as("n_docs"))
    }),


    // incremental OPTIMIZE (round-12; Delta's OPTIMIZE WHERE): the
    // steady-state ingest shape — a clustered head, a messy appended
    // tail, then a recluster that touches ONLY the files overlapping
    // the tail band (clustered head files carry over by name,
    // spec-pinned); a band through the healed region is then
    // manifest-pruned. Result-transparent as always
    "q199_incremental_optimize" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlinc-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.operators.TableLog.create(s, path,
        docs.where(col("doc_id") < 300L).repartition(4))
      graft.operators.TableLog.optimizeRange(s, path, "doc_id", numFiles = 4)
      graft.operators.TableLog.append(s, path,
        docs.where(col("doc_id") >= 300L).repartition(2))
      graft.operators.TableLog.optimizeRangeWhere(
        s, path, "doc_id", 300L, Long.MaxValue, numFiles = 2)
      graft.operators.TableLog.readBand(s, path, "doc_id", 350L, 450L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),


    // advisor loop closed (round-12): profile the logged table's
    // current version, let adviseLayout pick the physical design
    // (range_cluster doc_id + zorder_with n_chars on this schema),
    // APPLY it as a committed optimize version, then serve a band
    // through the new layout — decision and content both oracled
    "q197_auto_optimize" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlauto-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .repartition(8))
      val (_, mode, cols) = graft.operators.TableLog.autoOptimize(
        s, path, clusterable = Seq("doc_id", "n_chars"), numFiles = 8)
      graft.operators.TableLog.readBand(s, path, cols.head, 100L, 400L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .withColumn("mode", lit(mode))
        .withColumn("applied_cols", lit(cols.mkString(",")))
    }),


    // annealed schedule MATERIALIZED (round-12; q195 × q189): each
    // doc labeled with the epoch whose cumulative allocation window
    // its per-lang running-char total falls into — one shuffle, the
    // windows a broadcast #langs x epochs frame
    "q198_anneal_apply" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"))
      val totals = docs.groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("avail"))
        .withColumn("sw", when(col("lang") === "zh", 8L).otherwise(1L))
        .withColumn("ew", lit(1L))
      val b = totals.agg(sum(col("avail")).as("_tot"))
        .select(expr("_tot DIV 6").as("_mxb"))
      val plan = graft.operators.Mixture.annealSchedule(
        totals.crossJoin(broadcast(b)), "lang", "avail", "sw", "ew",
        epochs = 3, budgetPerEpoch = col("_mxb"))
      graft.operators.Mixture.annealAssign(
        docs, plan, "lang", col("doc_id"), col("n_chars"),
        cumCol = "cum_chars")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("epoch"), col("cum_chars"))
    }),


    // temperature-smoothed allocation WITHOUT repetition (round-12):
    // the XLM-R-style alpha=0.5 rebalance as a water-fill — weights
    // floor(sqrt(avail)) upsample rare langs against a third-corpus
    // budget, capped at availability. sqrt is IEEE
    // correctly-rounded, so floor(sqrt(BIGINT)) is bit-identical
    // cross-engine and the plan replays exactly
    "q196_temperature_fill" -> ((s, dir) => {
      val totals = table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("avail"))
        .withColumn("wgt",
          greatest(lit(1L), floor(sqrt(col("avail"))).cast("long")))
      val b = totals.agg(sum(col("avail")).as("_tot"))
        .select(expr("_tot DIV 3").as("_mxb"))
      graft.operators.Mixture.waterFill(
        totals.crossJoin(broadcast(b)), "lang", "avail", "wgt", col("_mxb"))
    }),


    // versioned-table time travel (round-11): documents committed as
    // table v1, a delete committed as v2 (untouched files carry over
    // by NAME, zero rewrite IO), then ONE report reads BOTH versions —
    // the audit a curation team runs after a retention pass. The log
    // layer is result-transparent: the oracle computes both versions
    // from the base table
    "q182_time_travel" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-tlog-docs-$sfx")
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      graft.operators.TableLog.create(s, path,
        table(s, dir, "documents").select(
          col("doc_id"), col("lang"), col("n_chars")))
      graft.operators.TableLog.deleteWhere(s, path, col("n_chars") < 150L)
      val v1 = graft.operators.TableLog.read(s, path, Some(1L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs_v1"), sum(col("n_chars")).as("chars_v1"))
      val v2 = graft.operators.TableLog.read(s, path, Some(2L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("_n2"), sum(col("n_chars")).as("_c2"))
      // left join from v1 (every lang exists pre-delete): a lang whose
      // docs ALL fall to the retention pass reports 0, not a lost row
      v1.join(v2, Seq("lang"), "left")
        .select(col("lang"), col("n_docs_v1"), col("chars_v1"),
          coalesce(col("_n2"), lit(0L)).as("n_docs_v2"),
          coalesce(col("_c2"), lit(0L)).as("chars_v2"))
    }),


    // water-filling mixture allocation (round-11): how many chars to
    // take per lang toward a half-corpus budget under skewed target
    // weights (zh 8x) WITHOUT repeating data — strata that run dry cap
    // at availability, surplus redistributes. Integer saturation tests
    // and floor-DIV shares; the one double is the sort key, replayed
    // identically by the oracle
    "q181_water_fill" -> ((s, dir) => {
      val totals = table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("avail"))
        .withColumn("wgt", when(col("lang") === "zh", 8L).otherwise(1L))
      val b = totals.agg(sum(col("avail")).as("_tot"))
        .select(expr("_tot DIV 2").as("_mxb"))
      graft.operators.Mixture.waterFill(
        totals.crossJoin(broadcast(b)), "lang", "avail", "wgt", col("_mxb"))
    }),


    // file-granular delete-where (round-11): documents written
    // range-clustered on n_chars, then the short tail deleted — the
    // rewrite touches only the files containing matches (spec pins
    // that), the swap is ledger-first. Result-transparent: oracle is
    // the plain survivor aggregate over the base table
    "q180_delete_where" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = perProcessTmpDir(s"graft-dw-docs-$sfx")
      graft.operators.StorageLayout.writeRangeClustered(
        table(s, dir, "documents").select(
          col("doc_id"), col("lang"), col("n_chars")),
        path, "n_chars", numFiles = 8)
      graft.operators.StorageLayout.deleteWhere(
        s, path, col("n_chars") < 150L)
      s.read.parquet(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"))
    }),


    // filter-funnel accounting (round-11): four quality gates in
    // pipeline order, ONE pass — per gate the unconditional fail
    // count, the first-fail waterfall attribution, the marginal
    // unique-fail count ("drop this gate, recover N docs") and the
    // retention curve. All gate scores exact-integral so the oracle
    // replays them verbatim (q170's stopword shape, q173's token
    // shape, an ASCII-alpha ratio)
    "q174_filter_funnel" -> ((s, dir) => {
      val (scored, gates) = funnelScored(s, dir, Seq.empty)
      graft.operators.Funnel.report(scored, gates)
    }),


    // per-source funnel (round-11): the q174 waterfall segmented by
    // the source column — which ingest feed loses how much, and to
    // which gate first. One grouped aggregation; the shuffle carries
    // #sources summary rows
    "q178_funnel_by_source" -> ((s, dir) => {
      val (scored, gates) = funnelScored(s, dir, Seq(col("source")))
      graft.operators.Funnel.reportBy(scored, "source", gates)
    }),


    // one-pass table profile (round-11): ANALYZE-style column stats
    // (nulls, exact distinct, min/max as strings) — the report that
    // feeds broadcast-threshold and clustering-column decisions. At
    // 100 TB the distinct counter swaps to the q139 HLL sketch, same
    // report schema
    "q179_table_profile" -> ((s, dir) => {
      graft.operators.TableProfile.profile(
        table(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars", "text"))
    }),


    // filter-threshold calibration sweep (round-11): retention vs
    // threshold for the en-stopword-ratio quality score over an
    // 11-point integral grid — the report a curation team reads
    // before picking a cutoff. ONE corpus scan answers the whole
    // grid (a conditional-aggregate pair per threshold, map-side
    // combined to a 1-row frame, unpivoted driver-free); weight =
    // whitespace token count, so both doc and token retention land
    "q170_threshold_sweep" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val toks = graft.textops.TextAnalysis.tokens(lower(col("text")))
      val scored = docs.select(
        graft.textops.TextAnalysis.stopwordCount(toks,
          graft.textops.TextAnalysis.stopwords("en"))
          .cast("long").as("_cal_stop"),
        size(toks).cast("long").as("n_tokens"))
        .withColumn("stop_x10000", expr(
          "CAST(10000 * _cal_stop DIV greatest(n_tokens, 1) AS BIGINT)"))
      graft.operators.Calibration.thresholdSweep(
        scored, "stop_x10000", "n_tokens", (0L to 10000L by 1000L))
    }),


    // token-budget corpus cut: keep documents in doc_id order while
    // the running whitespace-token total stays within budget — the
    // "fill the training mix" step, via the two-phase range-partitioned
    // cumsum (no unpartitioned window anywhere in the plan)
    "q56_budget_cut" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.Budget.takeWhileBudget(
        docs, col("doc_id"), col("n_tokens"), budget = 20000L,
        cumCol = "cum_tokens", chunkSize = 1000L)
    }),


    // per-(lang, source) quota — the anti-over-representation cap of a
    // corpus mix; one hash shuffle on the group key
    "q57_source_quota" -> ((s, dir) => {
      graft.operators.Budget.quotaPerGroup(
        table(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        Seq(col("lang"), col("source")), col("doc_id"), quota = 20)
    }),


    // stratified deterministic sample: downweight the over-represented
    // lang (en keeps 32/256), keep the rare ones whole (zh 256), drop
    // strata with no rate (default 0) — same md5 bucket as q48, so the
    // oracle recomputes row fates exactly
    "q59_stratified" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedSample(
        table(s, dir, "documents").select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        Map("en" -> 32, "de" -> 128, "zh" -> 256), defaultKeepBuckets = 64)
    }),


    // per-language token budget (the mix-spec form): one hash shuffle,
    // per-group windowed cumsum, same alias discipline as q56
    "q60_budget_per_lang" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("lang"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.Budget.takeWhileBudgetPerGroup(
        docs, Seq(col("lang")), col("doc_id"), col("n_tokens"),
        budget = 5000L, cumCol = "cum_tokens")
    }),


    // the curation-pipeline FLAGSHIP: the full staged chain a real
    // training-data run executes — clean → lang-id → quality filter →
    // content gate (blocked phrases) → exact dedup → near-dup
    // keep-best → span dedup → decontaminate → global token-budget
    // cut → training-shard assignment — composed
    // from the individually-oracled
    // operators into ONE query with ONE generated oracle that
    // recomputes every stage (engine supplies only the stage-4 minhash
    // keys; ExplainAudit records the whole-chain plan in PLANS.md)
    "q65_curation_pipeline" -> ((s, dir) => {
      // three consumers reference stage 4 (edge generation, keep-best,
      // the final lang join) — checkpoint it once instead of
      // recomputing the clean+verdict+dedup subtree per consumer (the
      // parquet-staging shape a production pipeline uses between
      // phases; eager, so the cost lands inside this query's timing)
      val s4 = curationStage4(s, dir).localCheckpoint()
      val edges = graft.textops.NearDup.minhashPairs(
        s4, "doc_id", "text", threshold = 0.5, maxBucketSize = 100)
        .select("id_a", "id_b")
      // project the score early: the component join + keep-best window
      // shuffle (doc_id, len), not the text payload
      val s5 = graft.operators.Dedup.dropNearDupsBy(
        s4.select(col("doc_id"), col("text"), length(col("text")).as("_len")),
        "doc_id", col("_len"), edges).drop("_len")
      val s6 = graft.textops.SpanDedup.dedupSpans(s5, "doc_id", "text", k = 8)
        .select(col("doc_id"), col("text_dedup").as("text"))
      val s7 = graft.textops.SpanDedup.decontaminate(
        s6, "doc_id", "text", evalCorpus(s, dir), "text", k = 8)
        .filter(!col("flagged"))
        .select(col("doc_id"), col("text_clean").as("text"), col("n_tokens"))
      val s8 = graft.operators.Budget.takeWhileBudget(
        s7, col("doc_id"), col("n_tokens"), budget = 15000L, cumCol = "cum_tokens")
      // stage 9: training-shard assignment over the kept prefix — the
      // materialize-for-training tail (write with writeTokenShards);
      // a row-local DIV on the cumsum stage 8 already computed
      s8.join(s4.select(col("doc_id"), col("lang_pred")), Seq("doc_id"))
        .select(col("doc_id"), col("lang_pred"), col("text"),
          col("n_tokens"), col("cum_tokens"))
        .withColumn("shard_id", expr("greatest(cum_tokens - 1L, 0L) div 2000L"))
    }),


    // the crawl->corpus flagship (round-10 verdict item 1): ONE run
    // from raw WARC bytes to manifested training shards. Fixture:
    // every document renders as an HTML page inside a WARC record
    // (q109's planted corruption: %13==5 under-declares
    // Content-Length, %13==9 drops the header; the parser must flag
    // both and salvage the rest byte-exact). Pipeline: streaming WARC
    // ingest -> main-content block extraction (q111) -> mojibake
    // repair (q121) -> lang/quality/gopher/entropy gates
    // (q20/q52/q128/q130) -> canonical-URL exact dedup (q72) ->
    // minhash keep-best (q51) -> eval decontamination (q61) -> global
    // token budget (q56) -> deterministic shuffle-shard (q71) ->
    // writeWithManifest (q83). ONE generated oracle recomputes every
    // stage from the documents table; engine supplies only minhash
    // shingle keys + xxhash64 shuffle keys (OracleGen
    // .crawlCorpusOracle). The WARC byte round-trip has no oracle-side
    // shortcut: a single corrupted payload byte breaks the md5 match
    "q131_crawl_corpus" -> ((s, dir) => {
      import graft.sources.WarcCorpus
      val fixDir = crawlFixtureDir(dir, "crawl-warc")
      val pages = crawlPages(s, dir)
      val plen = length(col("html").cast("binary"))
      val declared = when(col("doc_id") % 13 === 5, plen - 4).otherwise(plen)
      val clHeader = when(col("doc_id") % 13 === 9, lit(""))
        .otherwise(concat(lit("Content-Length: "), declared.cast("string"),
          lit("\r\n")))
      val rec = concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        col("page_url"), lit("\r\n"),
        lit("WARC-Record-ID: urn:graft:doc:"), col("doc_id").cast("string"),
        lit("\r\n"),
        lit("WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: text/html\r\n"),
        clHeader, lit("\r\n"), col("html"), lit("\r\n\r\n"))
      // widen the fixture WRITE: writeRecords emits one .warc file per
      // input partition, and the 1-partition documents scan otherwise
      // produces ONE file — binaryFiles then plans ONE split and the
      // whole WARC parse + content extraction chain runs serialized
      // (readWarc's RDD frame carries no plan stats, so the widen
      // inside crawlGated fails closed and cannot help). Splitting the
      // fixture at write time is the honest fix: real crawls arrive as
      // many WARC files.
      WarcCorpus.writeRecords(
        graft.operators.Widen.widen(pages.select(rec.as("rec"))),
        col("rec"), fixDir)
      val ingested = WarcCorpus.readWarc(s, fixDir)
        .filter(col("reason").isNull)
        .select(
          regexp_extract(col("record_id"), "urn:graft:doc:([0-9]+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri"),
          decode(col("payload"), "UTF-8").as("html"))
      // stages 2-7 (narrow gates + one url-dedup window); checkpoint:
      // the minhash edge generation, keep-best, and decontaminate all
      // re-consume this frame (the q65 staging discipline)
      // widen before the checkpoint: the url-dedup window coalesces to
      // one partition at bench bytes, and three consumers (minhash
      // edges, keep-best, decontaminate) would all start serialized
      // from a 1-wide checkpoint
      val deduped = graft.operators.Widen.widen(
        crawlUrlDeduped(crawlGated(ingested))).localCheckpoint()
      val edges = graft.textops.NearDup.minhashPairs(
        deduped, "doc_id", "text", threshold = 0.5, maxBucketSize = 100)
        .select("id_a", "id_b")
      val kept = graft.operators.Dedup.dropNearDupsBy(
        deduped.withColumn("_len", length(col("text"))),
        "doc_id", col("_len"), edges).drop("_len")
      val dec = graft.textops.SpanDedup.decontaminate(
        kept, "doc_id", "text", evalCorpus(s, dir), "text", k = 8)
        .filter(!col("flagged"))
        .select(col("doc_id"), col("text_clean").as("text"),
          col("n_tokens"))
      val bud = graft.operators.Budget.takeWhileBudget(
        dec, col("doc_id"), col("n_tokens"), budget = 12000L,
        cumCol = "_cum_budget")
        .drop("_cum_budget")
      // checkpoint before the triple fan-out (shard write, manifest
      // aggregation, the returned frame) — without the cut each
      // consumer would replay the whole crawl lineage
      val sharded = graft.operators.CorpusOrder.shuffleShard(
        bud, seed = 42L, idCol = col("doc_id"),
        weightCol = col("n_tokens"), shardBudget = 2500L)
        .localCheckpoint()
      // materialize: real shard parquet + _manifest commit marker
      graft.operators.ShardManifest.writeWithManifest(
        sharded, "shard_id", col("shuffle_key"), "doc_id", "n_tokens",
        crawlFixtureDir(dir, "crawl-shards"))
      sharded
        .join(kept.select(col("doc_id"), col("lang_pred")), Seq("doc_id"))
        .select(col("doc_id"), col("lang_pred"),
          col("n_tokens"), col("shuffle_key"), col("cum_tokens"),
          col("shard_id"), md5(col("text")).as("text_md5"))
    }),


    // token-bounded output sharding — the materialize-for-training
    // last stage: cut the corpus (in doc_id order) into contiguous
    // <=5000-token shards (a doc never splits; an oversized doc gets
    // its own shard); rides q56's chunked cumsum — ONE full-data
    // shuffle, the shard assignment is a row-local integral DIV
    "q70_token_shards" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.Budget.shardByTokenBudget(
        docs, col("doc_id"), col("n_tokens"), shardBudget = 5000L,
        shardCol = "shard_id", cumCol = "cum_tokens", chunkSize = 1000L)
    }),


    // deterministic global corpus shuffle composed with sharding: the
    // seeded xxhash64 permutation defines the training order, the
    // token cumsum runs in THAT order, shards cut the shuffled stream
    // — shuffle-then-shard, still ONE full-data shuffle. Oracle is
    // generated: engine emits only (doc_id, shuffle_key); DuckDB
    // independently recomputes tokens, the (key, id) order, the
    // cumsum, and the shard assignment
    "q71_shuffle_shard" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.CorpusOrder.shuffleShard(
        docs, seed = 42L, idCol = col("doc_id"), weightCol = col("n_tokens"),
        shardBudget = 5000L)
    }),


    // temperature-weighted mixture with repetition (the mT5/XLM-R
    // alpha-smoothing recipe): chars-weighted lang rebalancing against
    // a 400k-char budget at alpha=0.5 — rare langs upsample (epochs
    // repeat whole docs), the dominant lang downweights. Oracle is
    // generated: an independent driver implementation recomputes the
    // per-stratum (n_full, thr) plan from the raw columns; DuckDB
    // recomputes the per-doc 24-bit md5 coin and the epoch explosion
    "q75_mixture" -> ((s, dir) => {
      graft.operators.Mixture.temperatureMix(
        table(s, dir, "documents"), col("doc_id"), col("lang"), col("n_chars"),
        alpha = 0.5, budget = 400000L)
        .select(col("id").as("doc_id"), col("stratum").as("lang"), col("epoch"))
    }),


    // per-source quota cap (the C4/RefinedWeb per-host cap): keep the
    // 8 longest docs per source, rank in rk. ONE window + rank filter
    // — the plan Catalyst bounds map-side via InferWindowGroupLimit
    // (each scan task forwards <= k rows per key before the exchange;
    // ScaleBench phase 1f measures it against both the salted
    // two-phase and the rule-disabled truly-naive window)
    "q76_quota" -> ((s, dir) => {
      graft.operators.Quota.capPerKey(
        table(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        key = Seq(col("source")), order = Seq(col("n_chars").desc),
        id = col("doc_id"), k = 8)
        .select(col("doc_id"), col("source"), col("n_chars"), col("rk").cast("long").as("rk"))
    }),


    // shard-write manifest: the integrity record a materialized
    // training corpus carries — per shard, doc count, token sum, id
    // range, and an ORDER-INDEPENDENT bit_xor checksum of md5-60-bit
    // id:weight hashes, so any engine can re-verify a copy. Composes
    // q71's shuffle-shard assignment; generated oracle recomputes the
    // permutation order, the cumsum, the shard DIV, and the checksum
    "q83_shard_manifest" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      val sharded = graft.operators.CorpusOrder.shuffleShard(
        docs, seed = 42L, idCol = col("doc_id"),
        weightCol = col("n_tokens"), shardBudget = 5000L)
      graft.operators.ShardManifest.manifest(
        sharded, "shard_id", "doc_id", "n_tokens")
    }),


    // sequence packing — the step after sharding: the corpus token
    // stream (docs concatenated in doc_id order) cut into fixed
    // 512-token training sequences; documents SPLIT across sequence
    // boundaries (the dual of q70's never-split shards), one row per
    // (doc, sequence) overlap. Rides the q56 chunked cumsum — ONE
    // full-data shuffle, the slice explosion is a row-local Generate
    "q84_pack_sequences" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"))
      graft.operators.Packing.packSequences(
        docs, col("doc_id"), col("n_tokens"), seqLen = 512L, chunkSize = 1000L)
    }),


    // weighted sample without replacement (Efraimidis–Spirakis A-ES,
    // md5-derived uniforms): 100 docs weight-proportional by size —
    // the oracle recomputes u, ln(u)/w, and the top-k cut in DuckDB
    "q95_weighted_sample" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), (coalesce(col("n_chars"), lit(0L)) + 1).as("w"))
      graft.operators.Sampling.weightedSample(docs, col("doc_id"), col("w"), k = 100)
    }),


    // per-stratum weighted sample: 20 docs per language, weight = doc
    // size — q95's A-ES key through the plain-window form that
    // InferWindowGroupLimit prunes map-side (the q76 lesson applied to
    // sampling); oracle recomputes key and per-lang rank in DuckDB
    "q103_weighted_per_lang" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (coalesce(col("n_chars"), lit(0L)) + 1).as("w"))
      graft.operators.Sampling.weightedSamplePerKey(
        docs, col("doc_id"), col("w"), col("lang"), k = 20)
    }),


    // heavy hitters via a Misra-Gries TypedImperativeAggregate:
    // capacity-bounded summary per task, pairwise-merged — the shuffle
    // carries <= capacity rows per task instead of one per distinct
    // term. Capacity (256) exceeds the corpus vocabulary (31 at every
    // sf), so every estimate is EXACT (the MG no-decrement regime) and
    // the exact group-count oracle applies; the bounded-error regime
    // is spec-pinned (HeavyHittersSpec)
    "q80_heavy_hitters" -> ((s, dir) => {
      val terms = table(s, dir, "documents").select(
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      graft.operators.HeavyHitters.topK(terms, "term", capacity = 256, k = 20)
    }),


    // KMV distinct-count sketch (TypedImperativeAggregate): per-lang
    // distinct-token estimates with k = 16 minima of the md5-derived
    // 60-bit hash — the shuffle carries <= k longs per (task, lang)
    // instead of one row per distinct value. The ESTIMATOR itself is
    // oracle-checked: DuckDB recomputes the same md5 hashes, takes the
    // k-th smallest, and evaluates the same integer (k-1)*2^60/h_k —
    // both the exact (c < k) and estimating (c >= k) regimes
    "q82_distinct_sketch" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      graft.operators.DistinctSketch.estimateByKey(
        toks, Seq(col("lang")), col("term"), k = 16)
    }),


    // declarative data-quality checks (the dbt-test shape): four
    // row-level rules over a fixture with PLANTED violations (%13
    // nulled text, %17 corrupted n_chars, %41 unknown lang) evaluated
    // in ONE aggregation pass; a rule violates on FALSE or NULL (the
    // null-escape contract). Oracle: per-rule SELECTs over the same
    // fixture, unioned
    "q152_data_checks" -> ((s, dir) => {
      val id = col("doc_id")
      val fix = table(s, dir, "documents").select(id,
        when(id % 13 === 0, lit(null: String)).otherwise(col("text")).as("text"),
        when(id % 41 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
        when(id % 17 === 0, col("n_chars") + 7).otherwise(col("n_chars"))
          .as("n_chars"))
      graft.operators.DataChecks.checkRules(fix, "doc_id", Seq(
        "text_not_null" -> col("text").isNotNull,
        "n_chars_consistent" -> (col("n_chars") === length(col("text"))),
        "lang_known" -> col("lang").isin("en", "de", "fr", "es", "zh"),
        "id_non_negative" -> (col("doc_id") >= 0)))
    }),


    // differentially-private count release (Dwork et al. 2006) — the
    // privacy family's aggregate arm: per-lang counts + seeded
    // Laplace(1/ε) noise via inverse-CDF over the md5-uniform (the
    // no-PRNG rule makes the release deterministic and hash-gated;
    // production swaps in a secret per-release seed, same mechanism).
    // true_n rides along for the gate — documented drop-on-publish
    "q150_dp_counts" -> ((s, dir) => {
      graft.operators.DpRelease.laplaceNoisyCounts(
        table(s, dir, "documents"), Seq(col("lang")),
        epsilonX1000 = 1000, seed = "dp9")
    }),


    // k-anonymity by global recoding (Sweeney 2002) — the
    // metadata-side privacy gate beside q45's content scrubbing:
    // planted (zip, age) quasi-identifiers generalize uniformly up a
    // 3-rung ladder until below-k rows fit the 10% suppression
    // budget; the whole decision is integral, so the oracle unrolls
    // the ladder, picks the SAME level, and recomputes class sizes
    // and suppression flags
    "q149_k_anonymity" -> ((s, dir) => {
      val id = col("doc_id")
      val zipRungs = Seq(
        concat(lit("z"), (id % 97).cast("string")),
        concat(lit("z"), expr("CAST((doc_id % 97) DIV 10 AS STRING)")),
        lit("*"))
      val ageRungs = Seq(
        (id % 61).cast("string"),
        expr("CAST((doc_id % 61) DIV 10 * 10 AS STRING)"),
        lit("*"))
      graft.operators.KAnonymity.kAnonymize(
        table(s, dir, "documents").select(id),
        "doc_id", Seq("zip" -> zipRungs, "age" -> ageRungs),
        k = 5, maxSuppressedPermille = 100)
    }),


    // HyperLogLog distinct sketch — KMV's register-merge companion
    // (q82 is exact below k and ~1/sqrt(k) above; HLL's 64 6-bit
    // registers max-merge, the rollup-cube property). Estimator runs
    // the raw integer formula (alpha_64 x1000, DECIMAL(38,0) DIV), so
    // DuckDB recomputes registers AND quotient bit-for-bit
    "q139_hll_distinct" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      graft.operators.Hll.estimateByKey(toks, Seq(col("lang")), col("term"))
    }),


    // HLL time-rollup — the mergeability property made ORACLE-CHECKED
    // instead of spec-asserted: distinct users per day computed twice,
    // (a) directly and (b) by pointwise max-merging the per-HOUR
    // register tables (the rollup-cube path: per-day sketches
    // max-merge into months without re-reading data). Both columns
    // must hash-match the oracle's single direct recompute — a broken
    // merge diverges column (b)
    "q154_hll_rollup" -> ((s, dir) => {
      import graft.operators.Hll
      val ev = eventsTable(s, dir).select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("user_id"))
      val hourly = Hll.registersByKey(
        ev, Seq(col("day"), col("hour")), col("user_id"))
      val merged = hourly.groupBy(col("day"), col("_hll_reg"))
        .agg(max(col("_hll_m")).as("_hll_m"), sum(col("_hll_c")).as("_hll_c"))
      val viaMerge = Hll.estimateFromRegisters(merged, Seq("day"))
        .select(col("day"), col("est_x1000").as("est_merged_x1000"))
      val direct = Hll.estimateByKey(ev, Seq(col("day")), col("user_id"))
        .select(col("day"), col("n_values"),
          col("est_x1000").as("est_direct_x1000"))
      val nh = ev.select("day", "hour").distinct()
        .groupBy("day").agg(count(lit(1)).as("n_hours"))
      direct.join(viaMerge, "day").join(nh, "day")
        .select("day", "n_hours", "n_values",
          "est_direct_x1000", "est_merged_x1000")
    }),


    // count-min sketch point estimates — Misra-Gries' companion (q80
    // answers WHICH keys are hot; this answers HOW OFTEN for any
    // probed key) in one pass with depth*width fixed memory per task.
    // Buckets are md5-derived ("d:term" % width), so the DuckDB
    // oracle rebuilds the identical sketch from raw counts and takes
    // the same min-over-rows — the estimator itself is hash-checked
    "q89_count_min" -> ((s, dir) => {
      val terms = table(s, dir, "documents").select(col("doc_id"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      val probes = terms.filter(col("doc_id") < 3).select(col("term"))
      graft.operators.CountMin.estimateProbes(
        terms, col("term"), probes, "term", depth = 4, width = 1024)
    }),


    // Bloom membership sketch — the seen-set prefilter: ONE fixed-size
    // aggregation over the corpus vocabulary (m/64 longs per task),
    // probes answered against the broadcast one-row sketch frame by
    // pure Column arithmetic. Probes mix present terms (must all be
    // true — no false negatives) with planted absent keys (false
    // unless a real double-hash collision fills all 5 bits — the
    // oracle recomputes the exact set-bit set, so even a false
    // positive must MATCH)
    "q91_bloom" -> ((s, dir) => {
      val terms = table(s, dir, "documents").select(col("doc_id"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      val present = terms.filter(col("doc_id") < 3).select(col("term"))
      val absent = s.range(0, 8)
        .select(concat(lit("zzz_absent_"), col("id").cast("string")).as("term"))
      graft.operators.Bloom.mightContainProbes(
        terms, col("term"), present.union(absent), "term",
        m = 1 << 17, k = 5)
    }),


    // mergeable quantile sketch: per-source token-length p50/p90/p99
    // via the bottom-k value-count sketch (multiset-pure — unlike
    // KLL/GK its output is independent of stream and merge order, so
    // the oracle recomputes it EXACTLY in both regimes: ORDER BY
    // (hash, value) LIMIT k, then a cumulative-sum lower quantile
    // over the retained histogram). k=16 so corpus sources (whose
    // distinct token-length count exceeds it) run the estimator
    // regime, not just the exact one
    "q110_quantile_sketch" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("source"),
        graft.textops.TextAnalysis.nTokens(col("text")).cast("long").as("ntok"))
      graft.operators.QuantileSketch.quantilesByKey(
        docs, Seq(col("source")), col("ntok"), k = 16)
    })
  )

  /** q174/q178 shared oracle: the four gate flags replayed exactly
    * (q170's stopword integral, q173's token shape, RE2 alpha strip),
    * then the waterfall/marginal/retention counts re-derived per gate
    * — optionally per segment column — and stacked by UNION ALL.
    */
  private def funnelOracleSql(
      segment: Option[String],
      fromSql: String = "SELECT * FROM documents"): String = {
    val en = graft.textops.TextAnalysis.stopwords("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val segSel = segment.map(s => s"$s, ").getOrElse("")
    val segGroup = segment.map(s => s"\nGROUP BY $s").getOrElse("")
    val names = Seq("min_len", "min_tokens", "stopword", "alpha")
    val perGate = names.zipWithIndex.map { case (name, i) =>
      val surv = (0 to i).map(j => s"g$j").mkString(" AND ")
      s"""SELECT ${segSel}CAST($i AS BIGINT) AS gate_ord, '$name' AS gate,
         |  count(*) AS n_rows,
         |  CAST(sum(CASE WHEN NOT g$i THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fail,
         |  CAST(sum(CASE WHEN ff = $i THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_first_fail,
         |  CAST(sum(CASE WHEN nfail = 1 AND NOT g$i THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_unique_fail,
         |  CAST(sum(CASE WHEN $surv THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_survive
         |FROM m$segGroup""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "")
    s"""WITH d AS (
       |  SELECT $segSel
       |    CAST(length(trim(text)) AS BIGINT) AS lt,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |      ELSE len(string_split_regex(trim(text),
       |             '[ \\t\\n\\x0b\\f\\r]+')) END AS BIGINT) AS ntok,
       |    CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
       |      ELSE string_split_regex(trim(lower(text)),
       |             '[ \\t\\n\\x0b\\f\\r]+') END AS toks,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
       |      AS BIGINT) AS alpha,
       |    greatest(CAST(length(text) AS BIGINT), 1) AS chars
       |  FROM ($fromSql)),
       |g AS (
       |  SELECT $segSel
       |    coalesce(lt >= 200, false) AS g0,
       |    coalesce(ntok >= 55, false) AS g1,
       |    coalesce(10000 * CAST(len(list_filter(toks,
       |        x -> list_contains($en, x))) AS BIGINT)
       |      // greatest(CAST(len(toks) AS BIGINT), 1) >= 400,
       |      false) AS g2,
       |    coalesce(10000 * alpha // chars >= 8200, false) AS g3
       |  FROM d),
       |m AS (
       |  SELECT $segSel g0, g1, g2, g3,
       |    (CASE WHEN NOT g0 THEN 1 ELSE 0 END
       |     + CASE WHEN NOT g1 THEN 1 ELSE 0 END
       |     + CASE WHEN NOT g2 THEN 1 ELSE 0 END
       |     + CASE WHEN NOT g3 THEN 1 ELSE 0 END) AS nfail,
       |    (CASE WHEN NOT g0 THEN 0 WHEN NOT g1 THEN 1
       |          WHEN NOT g2 THEN 2 WHEN NOT g3 THEN 3
       |          ELSE -1 END) AS ff
       |  FROM g)
       |$perGate""".stripMargin
  }

  /** The q174/q178 shared gate-score projection. */
  private def funnelScored(
      s: org.apache.spark.sql.SparkSession, dir: String,
      extraCols: Seq[org.apache.spark.sql.Column])
      : (org.apache.spark.sql.DataFrame,
         Seq[(String, org.apache.spark.sql.Column)]) =
    funnelScoredFrame(table(s, dir, "documents"), extraCols)

  /** [[funnelScored]] over an arbitrary docs frame (q183 snapshots). */
  private def funnelScoredFrame(
      docs: org.apache.spark.sql.DataFrame,
      extraCols: Seq[org.apache.spark.sql.Column])
      : (org.apache.spark.sql.DataFrame,
         Seq[(String, org.apache.spark.sql.Column)]) = {
    val toksLow = graft.textops.TextAnalysis.tokens(lower(col("text")))
    val scored = docs.select(extraCols ++ Seq(
      length(trim(col("text"))).cast("long").as("_fu_len"),
      graft.textops.TextAnalysis.nTokens(col("text")).cast("long")
        .as("_fu_ntok"),
      graft.textops.TextAnalysis.stopwordCount(toksLow,
        graft.textops.TextAnalysis.stopwords("en")).cast("long")
        .as("_fu_stop"),
      size(toksLow).cast("long").as("_fu_ntok_low"),
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long")
        .as("_fu_alpha"),
      greatest(length(col("text")).cast("long"), lit(1L)).as("_fu_chars")): _*)
    val gates = Seq(
      "min_len" -> (col("_fu_len") >= 200L),
      "min_tokens" -> (col("_fu_ntok") >= 55L),
      "stopword" -> (expr(
        "CAST(10000 * _fu_stop DIV greatest(_fu_ntok_low, 1L) AS BIGINT)")
        >= 400L),
      "alpha" -> (expr(
        "CAST(10000 * _fu_alpha DIV _fu_chars AS BIGINT)") >= 8200L))
    (scored, gates)
  }

  /** One water-fill plan replay as a parenthesized subquery with
    * LOCAL CTEs (DuckDB scopes them to the parens, so several steps
    * can sit in one statement — the q183 twin-replay idiom): same
    * sort key (one IEEE division), same integer saturation test, same
    * floor-DIV shares as [[graft.operators.Mixture.waterFill]].
    * `totSql` must yield (lang, avail, wgt); `budRel` names a
    * relation with a `bud` column visible at the use site.
    */
  private def waterFillStepSql(totSql: String, budRel: String): String =
    s"""(WITH tot AS ($totSql),
        |ord AS (
        |  SELECT t.*, b.bud,
        |    coalesce(sum(avail) OVER (ORDER BY avail * 1.0 / wgt, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS satprefix,
        |    sum(wgt) OVER (ORDER BY avail * 1.0 / wgt, lang
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS wsuffix
        |  FROM tot t, $budRel b),
        |f AS (
        |  SELECT *,
        |    (avail * wsuffix <= (bud - satprefix) * wgt) AS saturated
        |  FROM ord),
        |g AS (
        |  SELECT *,
        |    sum(CASE WHEN saturated THEN avail ELSE 0 END) OVER () AS sattotal,
        |    sum(CASE WHEN saturated THEN 0 ELSE wgt END) OVER () AS wu
        |  FROM f)
        |SELECT lang, wgt, avail,
        |  CAST(CASE WHEN saturated THEN avail
        |       ELSE wgt * (bud - sattotal) // wu END AS BIGINT) AS allocated,
        |  saturated
        |FROM g)""".stripMargin

  /** q195/q198 shared oracle CTE block: three chained water-fill
    * epochs over documents — epoch e's availability is the base minus
    * the previous epochs' allocations, weights walk the integer
    * lattice sw*(2-e) + 1*e, budget a sixth of the corpus per epoch.
    */
  private val annealOracleCtes: String = {
    val base =
      """SELECT lang, CAST(sum(n_chars) AS BIGINT) AS avail,
        |    CAST(CASE WHEN lang = 'zh' THEN 8 ELSE 1 END AS BIGINT) AS sw
        |  FROM documents GROUP BY lang""".stripMargin
    def w(e: Int) = s"CAST(sw * ${2 - e} + 1 * $e AS BIGINT)"
    val e0 = waterFillStepSql(
      s"SELECT lang, avail, ${w(0)} AS wgt FROM ann_base", "ann_bud")
    val e1 = waterFillStepSql(
      s"""SELECT t.lang, t.avail - p0.allocated AS avail,
         |${w(1)} AS wgt
         |FROM ann_base t JOIN ann_e0 p0 USING (lang)""".stripMargin,
      "ann_bud")
    val e2 = waterFillStepSql(
      s"""SELECT t.lang,
         |t.avail - p0.allocated - p1.allocated AS avail,
         |${w(2)} AS wgt
         |FROM ann_base t JOIN ann_e0 p0 USING (lang)
         |  JOIN ann_e1 p1 USING (lang)""".stripMargin,
      "ann_bud")
    s"""ann_base AS ($base),
       |ann_bud AS (SELECT CAST(sum(avail) // 6 AS BIGINT) AS bud
       |            FROM ann_base),
       |ann_e0 AS (SELECT * FROM $e0 z0),
       |ann_e1 AS (SELECT * FROM $e1 z1),
       |ann_e2 AS (SELECT * FROM $e2 z2)""".stripMargin
  }

  /** q181/q189 shared oracle: the documents-table water-fill (zh 8x,
    * half-corpus budget) through [[waterFillStepSql]].
    */
  private val waterFillOracleSql: String =
    s"""WITH docwf_base AS (
        |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS avail,
        |    CAST(CASE WHEN lang = 'zh' THEN 8 ELSE 1 END AS BIGINT) AS wgt
        |  FROM documents GROUP BY lang),
        |docwf_bud AS (
        |  SELECT CAST(sum(avail) // 2 AS BIGINT) AS bud FROM docwf_base)
        |SELECT * FROM ${waterFillStepSql(
             "SELECT lang, avail, wgt FROM docwf_base", "docwf_bud")} wf""".stripMargin

  /** q179/q184 shared oracle: per-column stats stacked by UNION ALL. */
  private val profileOracleSql: String =
    Seq("doc_id", "lang", "source", "n_chars", "text").map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_str,
         |  CAST(max($c) AS VARCHAR) AS max_str
         |FROM documents""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "")

  val oracleSql: Map[String, String] = Map(

    // q172: the layout is result-transparent — the oracle is the
    // plain join/agg with the same exact-cents conversion
    "q172_colocated_join" ->
      """SELECT c.c_mktsegment AS c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS revenue_cents
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_mktsegment""".stripMargin,


    // q173: pruning is result-transparent — plain filtered aggregate
    "q173_partition_prune" -> {
      s"""SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text),
         |             '[ \\t\\n\\x0b\\f\\r]+')) END) AS BIGINT) AS n_tokens
         |FROM documents WHERE lang = 'en'
         |GROUP BY source""".stripMargin
    },


    // q175/q176/q177: layouts are result-transparent — plain filtered
    // aggregates over the base table
    "q175_range_cluster" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars BETWEEN 100 AND 250
        |GROUP BY lang""".stripMargin,

    "q176_zorder" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id BETWEEN 50 AND 400 AND n_chars BETWEEN 100 AND 250
        |GROUP BY lang""".stripMargin,

    "q177_compaction" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY lang""".stripMargin,

    // q187: both versions' row counts from the base table
    "q187_table_history" ->
      """SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows
        |FROM documents
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), count(*) FROM documents
        |WHERE NOT (n_chars < 150)""".stripMargin,

    // q188: top-20 with numeric tie-break, key rendered as string
    "q188_key_skew" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |t AS (SELECT count(*) AS total FROM events),
        |r AS (SELECT c.*, t.total,
        |    row_number() OVER (ORDER BY n DESC, user_id ASC) AS rank
        |  FROM c, t)
        |SELECT CAST(user_id AS VARCHAR) AS key, n,
        |  CAST(n * 10000 // total AS BIGINT) AS share_x10000,
        |  CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 20""".stripMargin,

    // q186: trailing-median anomaly flags replayed (list window +
    // 1-based sorted middle element, integer deviation)
    "q186_ingest_anomaly" ->
      """WITH d AS (
        |  SELECT doc_id // 20 AS bucket,
        |    CAST(n_chars + CASE WHEN doc_id // 20 = 12
        |      THEN 100000 ELSE 0 END AS BIGINT) AS m
        |  FROM documents),
        |b AS (SELECT bucket, CAST(sum(m) AS BIGINT) AS metric
        |      FROM d GROUP BY bucket),
        |t AS (SELECT *, list(metric) OVER (ORDER BY bucket
        |  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail FROM b),
        |f AS (SELECT bucket, metric,
        |  -- an empty window frame yields a NULL list, not []
        |  (coalesce(len(trail), 0) = 7) AS has_history,
        |  CASE WHEN coalesce(len(trail), 0) = 7 THEN list_sort(trail)[4] END
        |    AS trailing_median FROM t)
        |SELECT bucket, metric, trailing_median,
        |  CASE WHEN has_history AND trailing_median > 0
        |    THEN abs(metric - trailing_median) * 1000 // trailing_median
        |  END AS deviation_x1000,
        |  has_history,
        |  coalesce(CASE WHEN has_history AND trailing_median > 0
        |    THEN abs(metric - trailing_median) * 1000 // trailing_median
        |  END > 300, false) AS anomaly
        |FROM f""".stripMargin,

    // q185: layout-transparent filtered aggregate (q173's token shape)
    "q185_zorder3" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text),
        |             '[ \t\n\x0b\f\r]+')) END AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM d
        |WHERE doc_id BETWEEN 50 AND 400 AND n_tokens BETWEEN 20 AND 70
        |GROUP BY lang""".stripMargin,

    // q183: two funnel replays (parameterized snapshot sources) joined
    // per gate
    "q183_funnel_trend" -> {
      val oldFrom =
        """SELECT doc_id, CASE WHEN doc_id % 13 = 0
          |  THEN 'v1 ' || coalesce(text, '') ELSE text END AS text
          |FROM documents WHERE doc_id % 89 <> 0""".stripMargin
      val newFrom =
        "SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0"
      s"""SELECT o.gate_ord, o.gate,
         |  o.n_rows AS old_rows, o.n_fail AS old_fail,
         |  o.n_survive AS old_survive,
         |  n.n_rows AS new_rows, n.n_fail AS new_fail,
         |  n.n_survive AS new_survive,
         |  (n.n_fail - o.n_fail) AS d_fail,
         |  (n.n_survive - o.n_survive) AS d_survive
         |FROM (${funnelOracleSql(None, oldFrom)}) o
         |JOIN (${funnelOracleSql(None, newFrom)}) n
         |  USING (gate_ord, gate)""".stripMargin
    },

    // q182: both versions recomputed from the base table (the log
    // layer must be result-transparent)
    "q182_time_travel" ->
      """SELECT lang,
        |  count(*) AS n_docs_v1,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_v1,
        |  CAST(sum(CASE WHEN NOT (n_chars < 150) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_docs_v2,
        |  CAST(sum(CASE WHEN NOT (n_chars < 150) THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS chars_v2
        |FROM documents GROUP BY lang""".stripMargin,

    // q181: the water-filling plan replayed — same sort key (one IEEE
    // division), same integer saturation test, same floor-DIV shares
    "q181_water_fill" -> waterFillOracleSql,

    // q192: layout + log are result-transparent — the band itself
    "q192_optimize_range" ->
      """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 400""".stripMargin,

    // q208: the gated anneal replayed — per-epoch cleared pools (the
    // q170 stopword score against relaxing floors 1200/600/0), then
    // the q195 chained water-fill machinery with epoch e's
    // availability = its cleared pool minus earlier allocations
    "q208_anneal_floors" -> {
      val en = graft.textops.TextAnalysis.stopwords("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      def w(e: Int) = s"CAST(sw * ${2 - e} + 1 * $e AS BIGINT)"
      val e0 = waterFillStepSql(
        s"SELECT lang, c0 AS avail, ${w(0)} AS wgt FROM gf_base", "gf_bud")
      val e1 = waterFillStepSql(
        s"""SELECT t.lang, t.c1 - p0.allocated AS avail, ${w(1)} AS wgt
           |FROM gf_base t JOIN gf_e0 p0 USING (lang)""".stripMargin, "gf_bud")
      val e2 = waterFillStepSql(
        s"""SELECT t.lang, t.c2 - p0.allocated - p1.allocated AS avail,
           |${w(2)} AS wgt
           |FROM gf_base t JOIN gf_e0 p0 USING (lang)
           |  JOIN gf_e1 p1 USING (lang)""".stripMargin, "gf_bud")
      s"""WITH gf_t AS (
         |  SELECT lang, CAST(n_chars AS BIGINT) AS n_chars,
         |    CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
         |      ELSE string_split_regex(trim(lower(text)),
         |             '[ \\t\\n\\x0b\\f\\r]+') END AS toks
         |  FROM documents),
         |gf_sc AS (
         |  SELECT lang, n_chars,
         |    10000 * CAST(len(list_filter(toks, x -> list_contains($en, x)))
         |      AS BIGINT) // greatest(CAST(len(toks) AS BIGINT), 1) AS score
         |  FROM gf_t),
         |gf_base AS (
         |  SELECT lang,
         |    CAST(coalesce(sum(CASE WHEN score >= 1200 THEN n_chars END), 0)
         |      AS BIGINT) AS c0,
         |    CAST(coalesce(sum(CASE WHEN score >= 600 THEN n_chars END), 0)
         |      AS BIGINT) AS c1,
         |    CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS c2,
         |    CAST(CASE WHEN lang = 'zh' THEN 8 ELSE 1 END AS BIGINT) AS sw
         |  FROM gf_sc GROUP BY lang),
         |gf_bud AS (SELECT CAST(sum(n_chars) // 6 AS BIGINT) AS bud
         |           FROM gf_sc),
         |gf_e0 AS (SELECT * FROM $e0 z0),
         |gf_e1 AS (SELECT * FROM $e1 z1),
         |gf_e2 AS (SELECT * FROM $e2 z2)
         |SELECT 0 AS epoch, lang, wgt, avail, allocated, saturated
         |FROM gf_e0
         |UNION ALL
         |SELECT 1 AS epoch, lang, wgt, avail, allocated, saturated
         |FROM gf_e1
         |UNION ALL
         |SELECT 2 AS epoch, lang, wgt, avail, allocated, saturated
         |FROM gf_e2""".stripMargin
    },

    // q209: partition layout + log are result-transparent — the
    // filtered aggregate over base + appended rows
    "q209_partitioned_log" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT source, n_chars FROM documents WHERE lang = 'en'
        |  UNION ALL
        |  SELECT source, n_chars FROM documents
        |  WHERE doc_id < 50 AND lang = 'en') u
        |WHERE n_chars BETWEEN 100 AND 300
        |GROUP BY source""".stripMargin,

    // q210: the three change sets recomputed from the base table —
    // v3 removes the short band, v4 adds the shifted rows, v5's
    // delete catches base AND appended rows in its band
    "q210_change_feed" ->
      """WITH cf_base AS (
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        |  FROM documents),
        |cf_add AS (
        |  SELECT doc_id + 400000 AS doc_id, lang, n_chars
        |  FROM cf_base WHERE doc_id < 50),
        |cf_v5rm AS (
        |  SELECT * FROM cf_base WHERE n_chars BETWEEN 150 AND 199
        |  UNION ALL
        |  SELECT * FROM cf_add WHERE n_chars BETWEEN 150 AND 199)
        |SELECT CAST(3 AS BIGINT) AS _commit_version, 'removed' AS change,
        |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM cf_base WHERE n_chars BETWEEN 0 AND 149 GROUP BY lang
        |UNION ALL
        |SELECT CAST(4 AS BIGINT) AS _commit_version, 'added' AS change,
        |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM cf_add GROUP BY lang
        |UNION ALL
        |SELECT CAST(5 AS BIGINT) AS _commit_version, 'removed' AS change,
        |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM cf_v5rm GROUP BY lang""".stripMargin,

    // q211: the upsert replayed — ids < 50 replaced with the bumped
    // n_chars, the shifted rows inserted, everything else untouched
    "q211_merge_upsert" ->
      """WITH mrg AS (
        |  SELECT doc_id, lang, n_chars + 100000 AS n_chars
        |  FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, lang, n_chars
        |  FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id >= 50)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM mrg GROUP BY lang""".stripMargin,

    // q213: drop = filter, post-drop append = union
    "q213_partition_drop" ->
      """WITH st AS (
        |  SELECT doc_id, lang, n_chars FROM documents WHERE lang <> 'de'
        |  UNION ALL
        |  SELECT doc_id + 600000 AS doc_id, 'de' AS lang, n_chars
        |  FROM documents WHERE doc_id < 30)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM st GROUP BY lang""".stripMargin,

    // q212: the key arithmetic + IN-list replayed (collisions with
    // other doc_ids mapping to a probed key would surface here too —
    // the point read returns every row carrying the key)
    "q212_point_lookup" -> {
      val keys = Seq(7L, 19L, 23L, 31L, 42L)
        .map(i => (i * 2654435761L) % 1000000007L).mkString(", ")
      s"""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         |  (doc_id * 2654435761) % 1000000007 AS k
         |FROM documents
         |WHERE (doc_id * 2654435761) % 1000000007 IN ($keys)""".stripMargin
    },

    // q214: both SQL states replayed — latest = base 'en' rows plus
    // the shifted second insert, v2 = base 'en' rows only, same
    // partition + band predicate
    "q214_sql_surface" ->
      """WITH sq_base AS (
        |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
        |  FROM documents WHERE lang = 'en'),
        |sq_add AS (
        |  SELECT doc_id + 700000 AS doc_id, source, n_chars
        |  FROM sq_base WHERE doc_id < 40)
        |SELECT 'latest' AS at, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT * FROM sq_base UNION ALL SELECT * FROM sq_add) u
        |WHERE n_chars BETWEEN 100 AND 300
        |GROUP BY source
        |UNION ALL
        |SELECT 'v2' AS at, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM sq_base
        |WHERE n_chars BETWEEN 100 AND 300
        |GROUP BY source""".stripMargin,

    // q224: one file per partition (single-task insert), rows from
    // the base table, version 2 (empty CREATE + one INSERT)
    "q224_metadata_tables" ->
      """SELECT 'lang=' || lang AS partition,
        |  CAST(1 AS BIGINT) AS n_files,
        |  count(*) AS n_rows,
        |  CAST(2 AS BIGINT) AS at_version
        |FROM documents GROUP BY lang""".stripMargin,

    // q223: the CDC batch replayed — deletes drop, updates bump,
    // inserts append
    "q223_sql_merge_when" ->
      """WITH st AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id >= 30 AND doc_id < 60
        |         THEN CAST(n_chars AS BIGINT) + 77
        |         ELSE CAST(n_chars AS BIGINT) END AS n_chars
        |  FROM documents WHERE doc_id >= 30
        |  UNION ALL
        |  SELECT doc_id + 600000 AS doc_id, lang, CAST(n_chars AS BIGINT)
        |  FROM documents WHERE doc_id < 20)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM st GROUP BY lang""".stripMargin,

    // q228: the en partition swapped for the reload batch, every
    // other partition untouched
    "q228_insert_overwrite" ->
      """WITH st AS (
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) + 7 AS n_chars
        |  FROM documents WHERE lang = 'en' AND doc_id < 100
        |  UNION ALL
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        |  FROM documents WHERE lang <> 'en')
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM st GROUP BY lang""".stripMargin,

    // q227: the transactional derived rollup equals the full-corpus
    // rollup (base + both shifted batches)
    "q227_txn_pipeline" ->
      """WITH st AS (
        |  SELECT lang, CAST(n_chars AS BIGINT) AS n_chars FROM documents
        |  UNION ALL
        |  SELECT lang, CAST(n_chars AS BIGINT) FROM documents WHERE doc_id < 30
        |  UNION ALL
        |  SELECT lang, CAST(n_chars AS BIGINT) FROM documents WHERE doc_id < 50)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM st GROUP BY lang""".stripMargin,

    // q226: the streamed filter replayed over base + appended batch
    "q226_stream_table_pipeline" ->
      """WITH st AS (
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 900000 AS doc_id, lang, CAST(n_chars AS BIGINT)
        |  FROM documents WHERE doc_id < 40)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM st WHERE n_chars >= 100 GROUP BY lang""".stripMargin,

    // q225: the three dispositions replayed — matched ids take the
    // feed value, ids outside the feed but under the guard drop,
    // ids >= 100 survive, feed-only ids insert
    "q225_merge_by_source" ->
      """WITH st AS (
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) + 55 AS n_chars
        |  FROM documents WHERE doc_id >= 20 AND doc_id < 80
        |  UNION ALL
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        |  FROM documents WHERE doc_id >= 100
        |  UNION ALL
        |  SELECT doc_id + 800000 AS doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        |  FROM documents WHERE doc_id < 10)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM st GROUP BY lang""".stripMargin,

    // q222: the planted-null rule replayed; the second row restricts
    // to non-null values (same n_vals/lo/hi, n_rows = n_vals)
    "q222_null_stats" ->
      """WITH nx AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN NULL
        |              ELSE CAST(n_chars AS BIGINT) END AS x
        |  FROM documents)
        |SELECT count(*) AS n_rows, count(x) AS n_vals,
        |  CAST(min(x) AS BIGINT) AS lo, CAST(max(x) AS BIGINT) AS hi
        |FROM nx
        |UNION ALL
        |SELECT count(*) AS n_rows, count(x) AS n_vals,
        |  CAST(min(x) AS BIGINT) AS lo, CAST(max(x) AS BIGINT) AS hi
        |FROM nx WHERE x IS NOT NULL""".stripMargin,

    // q221: the q211 upsert derivation, reached through MERGE INTO
    "q221_sql_merge" ->
      """WITH mrg AS (
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) + 100000 AS n_chars
        |  FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, lang, CAST(n_chars AS BIGINT)
        |  FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) FROM documents
        |  WHERE doc_id >= 50)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM mrg GROUP BY lang""".stripMargin,

    // q220: the conditional assignment replayed over the base table
    "q220_sql_update" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id < 60 THEN lang || '-upd' ELSE lang END AS lang,
        |    CASE WHEN doc_id < 60 THEN CAST(n_chars AS BIGINT) + 1000000
        |         ELSE CAST(n_chars AS BIGINT) END AS n_chars
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM u GROUP BY lang""".stripMargin,

    // q219: the q21 quality formula replayed (4-decimal rounding
    // inside, so the 0.5 floor is engine-stable), floor inverted,
    // per-lang aggregate with the quality sum in exact integral
    // ten-thousandths
    "q219_sql_pipeline" -> {
      val toks = "string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')"
      val en = graft.textops.TextAnalysis.stopwords("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END AS n_tokens,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS DOUBLE) / length(text)
         |         END AS praw,
         |    CASE WHEN len($toks) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter($toks, t -> list_contains($en, t))) AS DOUBLE)
         |              / len($toks) END AS sraw
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang, n_tokens,
         |    round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |        + least(sraw * 5.0, 1.0) * 0.3
         |        + (1.0 - least(praw * 10.0, 1.0)) * 0.3, 4) AS quality
         |  FROM base)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(CAST(floor(quality * 10000 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS sum_q4
         |FROM q
         |WHERE NOT (quality < 0.5)
         |GROUP BY lang""".stripMargin
    },

    // q217: the four versions' row counts derived from the base table
    // (v1 CREATE empty, v2 INSERT all, v3 OPTIMIZE content-identical,
    // v4 the length-floor delete)
    "q217_sql_maintenance" ->
      """SELECT CAST(1 AS BIGINT) AS version, CAST(0 AS BIGINT) AS n_rows
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), count(*) FROM documents
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), count(*) FROM documents
        |UNION ALL
        |SELECT CAST(4 AS BIGINT), count(*) FROM documents
        |WHERE NOT (n_chars < 150)""".stripMargin,

    // q216: both aggregates replayed over the base table
    "q216_metadata_agg" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS lo,
        |  CAST(max(n_chars) AS BIGINT) AS hi,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT '_all' AS lang, count(*) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS lo,
        |  CAST(max(n_chars) AS BIGINT) AS hi,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM documents""".stripMargin,

    // q231: the maintenance ops are content-preserving modulo the
    // deletes — the oracle inverts them
    "q231_dv_maintenance" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM documents
        |WHERE doc_id NOT IN (50, 100, 150, 200, 250)
        |GROUP BY lang""".stripMargin,

    // q230: the string bounds the manifest serves are the base
    // table's plain min/max (binary string order in both engines)
    "q230_string_bounds" ->
      """SELECT min(lang) AS min_lang, max(lang) AS max_lang,
        |  min(source) AS min_source, max(source) AS max_source,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents""".stripMargin,

    // q215: both deletes inverted over the base table (no NULLs in
    // either predicate column, so NOT() is exact)
    "q215_sql_delete" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars
        |FROM documents
        |WHERE NOT (n_chars < 150)
        |  AND NOT (lang = 'de' AND n_chars > 400)
        |GROUP BY lang""".stripMargin,

    // q193: the n_chars band aggregated per lang
    "q193_optimize_zorder" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars BETWEEN 150 AND 300
        |GROUP BY lang""".stripMargin,

    // q194: the maintenance chain replayed as counts — v2 (post
    // retention delete) and v3 (compact, content-identical) survive
    // the keep-2 vacuum; v1 is vacuumed away
    "q194_vacuum_history" ->
      """WITH k AS (
        |  SELECT count(*) AS n FROM documents WHERE NOT (n_chars < 150))
        |SELECT 2 AS version, CAST(n AS BIGINT) AS n_rows FROM k
        |UNION ALL
        |SELECT 3 AS version, CAST(n AS BIGINT) AS n_rows FROM k""".stripMargin,

    // q195: three chained water-fill epochs — epoch e's availability
    // is the base minus the previous epochs' allocations, weights
    // walk the integer lattice sw*(2-e) + 1*e, budget a sixth of the
    // corpus each epoch
    "q195_anneal_schedule" ->
      s"""WITH $annealOracleCtes
         |SELECT 0 AS epoch, lang, wgt, avail, allocated, saturated
         |FROM ann_e0
         |UNION ALL
         |SELECT 1 AS epoch, lang, wgt, avail, allocated, saturated
         |FROM ann_e1
         |UNION ALL
         |SELECT 2 AS epoch, lang, wgt, avail, allocated, saturated
         |FROM ann_e2""".stripMargin,

    // q198: the schedule materialized — per-lang running-char cumsum
    // against the chained epochs' cumulative allocation windows; a
    // doc lands in the epoch whose window its inclusive cumsum falls
    // into, rows past the total allocation are never emitted
    "q198_anneal_apply" ->
      s"""WITH $annealOracleCtes,
         |ann_plan AS (
         |  SELECT 0 AS epoch, lang, allocated FROM ann_e0
         |  UNION ALL SELECT 1, lang, allocated FROM ann_e1
         |  UNION ALL SELECT 2, lang, allocated FROM ann_e2),
         |wins AS (
         |  SELECT lang, epoch, allocated,
         |    CAST(sum(allocated) OVER (PARTITION BY lang ORDER BY epoch
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS hi
         |  FROM ann_plan),
         |w2 AS (
         |  SELECT lang, epoch, hi - allocated AS lo, hi
         |  FROM wins WHERE allocated > 0),
         |adocs AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
         |          FROM documents),
         |ac AS (
         |  SELECT d.*,
         |    sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM adocs d)
         |SELECT ac.doc_id, ac.lang, ac.n_chars, w2.epoch,
         |  CAST(ac.cum AS BIGINT) AS cum_chars
         |FROM ac JOIN w2 ON w2.lang = ac.lang
         |  AND ac.cum > w2.lo AND ac.cum <= w2.hi""".stripMargin,

    // q203: the q36 reach replay + the salted bucket on the component
    // label, aggregated per split
    "q203_component_split" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM documents a JOIN documents b
        |    ON b.doc_id = a.doc_id + 1 AND a.n_chars // 100 = b.n_chars // 100),
        |sym AS (SELECT id_a, id_b FROM edges UNION SELECT id_b, id_a FROM edges),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.id_b, reach.r FROM reach JOIN sym s ON s.id_a = reach.id),
        |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
        |d AS (
        |  SELECT doc_id, component,
        |    CASE WHEN b < 26 THEN 'test'
        |         WHEN b < 39 THEN 'val'
        |         ELSE 'train' END AS split
        |  FROM (SELECT doc_id, component,
        |    CAST(('0x' || substr(md5('split:' || CAST(component AS VARCHAR)),
        |      1, 2)) AS BIGINT) AS b FROM comp))
        |SELECT split, count(DISTINCT component) AS n_components,
        |  count(*) AS n_docs
        |FROM d GROUP BY split""".stripMargin,

    // q207: the restored state is the base table; the bad state is
    // the survivor count
    "q207_restore" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(CASE WHEN NOT (n_chars < 150) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_docs_bad
        |FROM documents GROUP BY lang""".stripMargin,

    // q206: both change sets recomputed from the base table (removed
    // = the retention band, added = the re-keyed append)
    "q206_version_diff" ->
      """SELECT 'removed' AS change, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars BETWEEN 0 AND 149 GROUP BY lang
        |UNION ALL
        |SELECT 'added' AS change, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id < 50 GROUP BY lang""".stripMargin,

    // q200: survivors of the band delete
    "q200_delete_band" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM documents WHERE NOT (doc_id BETWEEN 100 AND 200)
        |GROUP BY lang""".stripMargin,

    // q232: the two SQL deletes replayed, every surviving row copied
    // TWICE (the CTAS copy + the bare INSERT copy)
    "q232_dv_sql_roundtrip" ->
      """SELECT lang, CAST(2 * count(*) AS BIGINT) AS n_docs,
        |  CAST(2 * sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM documents
        |WHERE doc_id NOT IN (7, 42, 99) AND n_chars >= 110
        |GROUP BY lang""".stripMargin,

    // q233: both merges replayed arithmetically — step 1 replaces
    // doc_id%50=0 rows and appends the +1000000 'new' rows; step 2
    // deletes matched doc_id%60=0, adds 100 to the surviving matched
    // doc_id%30=0, and inserts the +2000000 'ins' rows
    "q233_dv_merge" ->
      """WITH t1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 50 = 0 THEN 'up' ELSE lang END AS lang,
        |    CASE WHEN doc_id % 50 = 0 THEN n_chars + 5 ELSE n_chars END
        |      AS n_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000000, 'new', n_chars FROM documents
        |  WHERE doc_id < 20),
        |t2 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id < 1000000000000 AND doc_id % 30 = 0
        |         THEN n_chars + 100 ELSE n_chars END AS n_chars
        |  FROM t1 WHERE NOT (doc_id < 1000000000000 AND doc_id % 60 = 0)
        |  UNION ALL
        |  SELECT doc_id + 2000000000000, 'ins', 0 FROM documents
        |  WHERE doc_id % 500 = 0)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM t2 GROUP BY lang""".stripMargin,

    // q234: the key algebra replayed — the %97 delete, then each
    // upsert epoch removes its key set and appends its rows
    "q234_eq_upsert" ->
      """WITH e0 AS (
        |  SELECT doc_id, 'u0' AS lang, n_chars + 7 AS n_chars
        |  FROM documents WHERE doc_id % 40 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000000, 'new0', n_chars FROM documents
        |  WHERE doc_id < 15),
        |e1 AS (
        |  SELECT doc_id, 'u1' AS lang, n_chars + 11 AS n_chars
        |  FROM documents WHERE doc_id % 80 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000000, 'u1n', 0 FROM documents
        |  WHERE doc_id < 5),
        |s1 AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id % 97 <> 0 AND doc_id % 40 <> 0
        |  UNION ALL SELECT doc_id, lang, n_chars FROM e0),
        |s2 AS (
        |  SELECT doc_id, lang, n_chars FROM s1
        |  WHERE doc_id NOT IN (SELECT doc_id FROM e1)
        |  UNION ALL SELECT doc_id, lang, n_chars FROM e1)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM s2 GROUP BY lang""".stripMargin,

    // q235: two eq-routed merge epochs replayed — each epoch removes
    // its key set from the running state and appends its rows
    "q235_eq_merge" ->
      """WITH e0 AS (
        |  SELECT doc_id, 'm0' AS lang, n_chars + 3 AS n_chars
        |  FROM documents WHERE doc_id % 45 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000000, 'n0', n_chars FROM documents
        |  WHERE doc_id < 12),
        |e1 AS (
        |  SELECT doc_id, 'm1' AS lang, n_chars + 9 AS n_chars
        |  FROM documents WHERE doc_id % 90 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000000, 'n1', 1 FROM documents
        |  WHERE doc_id < 4),
        |s1 AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id % 45 <> 0
        |  UNION ALL SELECT doc_id, lang, n_chars FROM e0),
        |s2 AS (
        |  SELECT doc_id, lang, n_chars FROM s1
        |  WHERE doc_id NOT IN (SELECT doc_id FROM e1)
        |  UNION ALL SELECT doc_id, lang, n_chars FROM e1)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM s2 GROUP BY lang""".stripMargin,

    // q229: the DV delete predicates and the fold-triggering update
    // replayed over the base table (deletes apply before the update,
    // and the update only sees survivors — same as the WHERE-then-CASE
    // order here)
    "q229_deletion_vectors" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN doc_id BETWEEN 200 AND 220 THEN 'xx' ELSE lang END
        |      AS lang,
        |    CASE WHEN doc_id BETWEEN 300 AND 310 THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars
        |  FROM documents
        |  WHERE doc_id NOT IN (7, 42, 99, 123)
        |    AND NOT (n_chars < 120 AND doc_id % 10 = 3))
        |GROUP BY lang""".stripMargin,

    // q201: the evolution rule replayed — pre-evolution rows carry
    // NULL in the added column
    "q201_schema_evolution" ->
      """SELECT CASE WHEN doc_id < 300 THEN NULL ELSE source END AS source,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,

    // q202: q191's audit with the bucket keyed on md5(text) — every
    // content group is split-atomic by construction
    "q202_group_split" ->
      """WITH p AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents),
        |d AS (
        |  SELECT text,
        |    CASE WHEN b < 26 THEN 'test'
        |         WHEN b < 39 THEN 'val'
        |         ELSE 'train' END AS split
        |  FROM (SELECT text,
        |    CAST(('0x' || substr(md5('split:' || md5(text)), 1, 2))
        |      AS BIGINT) AS b FROM p)),
        |g AS (
        |  SELECT md5(text) AS grp,
        |    array_to_string(list_sort(list(DISTINCT split)), ',') AS splits,
        |    count(*) AS n
        |  FROM d GROUP BY md5(text))
        |SELECT splits, count(*) AS n_groups, CAST(sum(n) AS BIGINT) AS n_docs
        |FROM g GROUP BY splits""".stripMargin,

    // q199: the maintenance chain is result-transparent — the healed
    // band's aggregate
    "q199_incremental_optimize" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id BETWEEN 350 AND 450
        |GROUP BY lang""".stripMargin,

    // q197: the advisor's decision replayed (q184's role rules over
    // the 3-column profile) + the band aggregate the rewritten table
    // serves — decision AND content both oracle-checked
    "q197_auto_optimize" ->
      """WITH prof AS (
        |  SELECT 'doc_id' AS col_name, count(DISTINCT doc_id) AS n_distinct,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_null FROM documents
        |  UNION ALL
        |  SELECT 'lang', count(DISTINCT lang),
        |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', count(DISTINCT n_chars),
        |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM documents),
        |r AS (SELECT *,
        |  (n_distinct > 1 AND n_distinct <= 20 AND n_null = 0) AS is_part
        |  FROM prof),
        |r2 AS (SELECT *,
        |  CASE WHEN is_part THEN 'p'
        |       WHEN col_name IN ('doc_id', 'n_chars') THEN 'c'
        |       ELSE 'n' END AS grp FROM r),
        |r3 AS (SELECT *,
        |  row_number() OVER (PARTITION BY grp
        |    ORDER BY n_distinct DESC, col_name) AS rk FROM r2),
        |roles AS (SELECT col_name,
        |  CASE WHEN is_part THEN 'partition'
        |       WHEN grp = 'c' AND rk = 1 THEN 'range_cluster'
        |       WHEN grp = 'c' AND rk = 2 THEN 'zorder_with'
        |       ELSE 'none' END AS role FROM r3),
        |m AS (SELECT
        |  CASE WHEN count(CASE WHEN role = 'zorder_with' THEN 1 END) > 0
        |    THEN 'zorder' ELSE 'range' END AS mode,
        |  (SELECT col_name FROM roles WHERE role = 'range_cluster') ||
        |    coalesce(',' ||
        |      (SELECT col_name FROM roles WHERE role = 'zorder_with'), '')
        |    AS applied_cols
        |  FROM roles),
        |band AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents WHERE doc_id BETWEEN 100 AND 400 GROUP BY lang)
        |SELECT m.mode, m.applied_cols, band.lang, band.n_docs, band.sum_chars
        |FROM m, band""".stripMargin,

    // q196: the sqrt-weighted (alpha = 0.5 temperature) water-fill —
    // floor(sqrt(BIGINT)) is bit-identical cross-engine
    "q196_temperature_fill" -> {
      val tot =
        """SELECT lang, avail,
          |  CAST(greatest(1, CAST(floor(sqrt(avail)) AS BIGINT)) AS BIGINT)
          |    AS wgt
          |FROM tmp_base""".stripMargin
      s"""WITH tmp_base AS (
         |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS avail
         |  FROM documents GROUP BY lang),
         |tmp_bud AS (SELECT CAST(sum(avail) // 3 AS BIGINT) AS bud
         |            FROM tmp_base)
         |SELECT * FROM ${waterFillStepSql(tot, "tmp_bud")} wf""".stripMargin
    },

    // q191: planted union + q93's bucket rule + content-hash grouping
    "q191_split_leakage" ->
      """WITH p AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents),
        |d AS (
        |  SELECT text,
        |    CASE WHEN b < 26 THEN 'test'
        |         WHEN b < 39 THEN 'val'
        |         ELSE 'train' END AS split
        |  FROM (SELECT text,
        |    CAST(('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 2))
        |      AS BIGINT) AS b FROM p)),
        |g AS (
        |  SELECT md5(text) AS grp,
        |    array_to_string(list_sort(list(DISTINCT split)), ',') AS splits,
        |    count(*) AS n
        |  FROM d GROUP BY md5(text))
        |SELECT splits, count(*) AS n_groups, CAST(sum(n) AS BIGINT) AS n_docs
        |FROM g GROUP BY splits""".stripMargin,

    // q190: the integral score replayed (q170 shape), ranked by
    // (score, salted-hash20, id), percentile = (rank-1)*10000 // (n-1)
    "q190_percentile_rank" -> {
      val en = graft.textops.TextAnalysis.stopwords("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
         |      ELSE string_split_regex(trim(lower(text)),
         |             '[ \\t\\n\\x0b\\f\\r]+') END AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    10000 * CAST(len(list_filter(toks,
         |        x -> list_contains($en, x))) AS BIGINT)
         |      // greatest(CAST(len(toks) AS BIGINT), 1) AS score,
         |    CAST(('0x' || substr(md5('prank:' || CAST(doc_id AS VARCHAR)),
         |      1, 15)) AS BIGINT) % 1048576 AS h
         |  FROM t),
         |r AS (
         |  SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score, h, doc_id) AS rank,
         |    count(*) OVER () AS n
         |  FROM s)
         |SELECT doc_id, score, CAST(rank AS BIGINT) AS rank,
         |  CAST((rank - 1) * 10000 // greatest(n - 1, 1) AS BIGINT)
         |    AS pct_x10000
         |FROM r""".stripMargin
    },

    // q189: the q181 plan joined onto the rows, per-lang running-char
    // cut at each allocation
    "q189_water_fill_apply" ->
      s"""WITH wf AS ($waterFillOracleSql),
         |docs AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
         |         FROM documents),
         |c AS (SELECT d.doc_id, d.lang, d.n_chars, wf.allocated,
         |    sum(d.n_chars) OVER (PARTITION BY d.lang ORDER BY d.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum_chars
         |  FROM docs d JOIN wf ON wf.lang = d.lang)
         |SELECT doc_id, lang, n_chars, CAST(cum_chars AS BIGINT) AS cum_chars
         |FROM c WHERE cum_chars <= allocated""".stripMargin,



    // q180: delete is result-transparent — survivors' aggregate
    "q180_delete_where" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars
        |FROM documents WHERE NOT (n_chars < 150)
        |GROUP BY lang""".stripMargin,


    // q174/q178: shared funnel oracle (see funnelOracleSql)
    "q174_filter_funnel" -> funnelOracleSql(None),
    "q178_funnel_by_source" -> funnelOracleSql(Some("source")),

    // q179: per-column stats stacked by UNION ALL; exact distinct,
    // min/max rendered as strings (binary/codepoint order in both
    // engines)
    "q179_table_profile" -> profileOracleSql,

    // q184: the q179 profile fed through the same deterministic
    // partition/cluster/zorder rules (PARTITION BY the partition flag,
    // rank by cardinality, ties by name)
    "q184_layout_advisor" ->
      s"""WITH p AS ($profileOracleSql),
         |r AS (SELECT *,
         |  (n_distinct > 1 AND n_distinct <= 20 AND n_null = 0)
         |    AS is_part FROM p),
         |r2 AS (SELECT *,
         |  CASE WHEN is_part THEN 'p'
         |       WHEN col_name IN ('doc_id', 'n_chars') THEN 'c'
         |       ELSE 'n' END AS grp FROM r),
         |k AS (SELECT *, row_number() OVER (PARTITION BY grp
         |  ORDER BY n_distinct DESC, col_name) AS rk FROM r2)
         |SELECT col_name, n_distinct, n_null,
         |  CASE WHEN is_part THEN 'partition'
         |       WHEN grp = 'c' AND rk = 1 THEN 'range_cluster'
         |       WHEN grp = 'c' AND rk = 2 THEN 'zorder_with'
         |       ELSE 'none' END AS role
         |FROM k""".stripMargin,


    // q170: per-doc integral stopword score replayed (the q21/q167
    // token shape), then the grid unnested and every threshold's
    // conditional counts re-aggregated — same integral `//` ratios
    "q170_threshold_sweep" -> {
      val en = graft.textops.TextAnalysis.stopwords("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (
         |  SELECT CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
         |              ELSE string_split_regex(trim(lower(text)),
         |                     '[ \\t\\n\\x0b\\f\\r]+') END AS toks
         |  FROM documents),
         |d AS (
         |  SELECT CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(toks, x -> list_contains($en, x)))
         |      AS BIGINT) AS n_stop
         |  FROM t),
         |sc AS (
         |  SELECT n_tokens,
         |    10000 * n_stop // greatest(n_tokens, 1) AS stop_x10000
         |  FROM d),
         |g AS (SELECT CAST(unnest([0, 1000, 2000, 3000, 4000, 5000,
         |  6000, 7000, 8000, 9000, 10000]) AS BIGINT) AS threshold),
         |r AS (
         |  SELECT g.threshold,
         |    count(*) AS n_docs,
         |    coalesce(sum(sc.n_tokens), 0) AS w_total,
         |    sum(CASE WHEN sc.stop_x10000 >= g.threshold
         |             THEN 1 ELSE 0 END) AS n_kept,
         |    coalesce(sum(CASE WHEN sc.stop_x10000 >= g.threshold
         |             THEN sc.n_tokens ELSE 0 END), 0) AS w_kept
         |  FROM g CROSS JOIN sc GROUP BY g.threshold)
         |SELECT threshold, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(w_total AS BIGINT) AS w_total,
         |  CAST(n_kept AS BIGINT) AS n_kept,
         |  CAST(w_kept AS BIGINT) AS w_kept,
         |  CAST(10000 * n_kept // greatest(n_docs, 1) AS BIGINT)
         |    AS docs_kept_x10000,
         |  CAST(10000 * w_kept // greatest(w_total, 1) AS BIGINT)
         |    AS w_kept_x10000
         |FROM r""".stripMargin
    },


    "q48_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || md5(CAST(doc_id AS VARCHAR))[1:2])::INT % 256 < 32""".stripMargin,


    // q161: the saturating curve + the q82-proven md5-60-bit hash
    // gate, both in exact integral arithmetic
    "q161_importance_sample" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    least(10000, n_chars * 10000 // (n_chars + 500)) AS prob_x10000
        |  FROM documents)
        |SELECT doc_id, lang, CAST(prob_x10000 AS BIGINT) AS prob_x10000
        |FROM t
        |WHERE CAST(('0x' || substr(md5('isamp:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |        AS BIGINT) % 10000 < prob_x10000""".stripMargin,


    // the oracle's one-window cumsum IS the semantics; the engine's
    // range-partitioned two-phase formulation must reproduce it exactly
    "q56_budget_cut" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 20000""".stripMargin,


    "q57_source_quota" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         row_number() OVER (PARTITION BY lang, source
        |                            ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 20""".stripMargin,


    "q59_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || md5(CAST(doc_id AS VARCHAR))[1:2])::INT % 256 <
        |  CASE lang WHEN 'en' THEN 32 WHEN 'de' THEN 128
        |            WHEN 'zh' THEN 256 ELSE 64 END""".stripMargin,


    "q60_budget_per_lang" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 5000""".stripMargin,


    // the one-window cumsum + integer DIV is the shard semantics; the
    // engine's chunked two-phase cumsum + row-local DIV must reproduce
    // it exactly (DuckDB // is floor division — equal to Spark's
    // truncating div for the non-negative greatest(cum-1, 0))
    "q70_token_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
        |  CAST(greatest(cum_tokens - 1, 0) // 5000 AS BIGINT) AS shard_id
        |FROM c""".stripMargin,


    // q76: the naive single-window form IS the semantics; the engine's
    // two-phase salted top-k must reproduce its row set and ranks
    // exactly (order made total by the doc_id tiebreak)
    "q76_quota" ->
      """SELECT doc_id, source, n_chars, rk FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 8""".stripMargin,


    // q84: the packing arithmetic recomputed from the same one-window
    // cumsum as q70 — each doc's global span [gstart, cum) overlaps
    // sequences gstart//512 .. (cum-1)//512 (generate_series), slice
    // offsets are the same greatest/least integer algebra (DuckDB //
    // is floor division — equal to Spark's div on these non-negatives)
    "q84_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t),
        |e AS (
        |  SELECT doc_id, n_tokens, cum_tokens,
        |         cum_tokens - n_tokens AS gstart
        |  FROM c WHERE n_tokens > 0),
        |x AS (
        |  SELECT doc_id, n_tokens, cum_tokens, gstart,
        |    unnest(generate_series(gstart // 512, (cum_tokens - 1) // 512))
        |      AS seq_id
        |  FROM e)
        |SELECT doc_id, n_tokens, cum_tokens,
        |  CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(seq_id * 512 - gstart, 0) AS BIGINT) AS doc_start,
        |  CAST(least(n_tokens, (seq_id + 1) * 512 - gstart)
        |       - greatest(seq_id * 512 - gstart, 0) AS BIGINT) AS doc_len,
        |  CAST(greatest(gstart - seq_id * 512, 0) AS BIGINT) AS seq_start
        |FROM x""".stripMargin,


    "q95_weighted_sample" ->
      raw"""WITH s AS (
        |  SELECT doc_id, COALESCE(n_chars, 0) + 1 AS w,
        |    (CAST(('0x' || substr(md5('wsamp:' || doc_id::VARCHAR), 1, 15))
        |          AS BIGINT) + 1) / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT doc_id, w FROM s
        |ORDER BY ln(u) / w DESC, doc_id LIMIT 100""".stripMargin,


    "q103_weighted_per_lang" ->
      raw"""WITH s AS (
        |  SELECT doc_id, lang, COALESCE(n_chars, 0) + 1 AS w,
        |    (CAST(('0x' || substr(md5('wsamp:' || doc_id::VARCHAR), 1, 15))
        |          AS BIGINT) + 1) / 1152921504606846976.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, w,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY ln(u) / w DESC, doc_id) AS rk
        |  FROM s)
        |SELECT doc_id, lang, w FROM r WHERE rk <= 20""".stripMargin,


    // q80: exact token counts ARE the MG estimates here (capacity >
    // distinct vocabulary, so no decrement ever fires — the regime the
    // scaladoc guarantees); rank ties break on term
    "q80_heavy_hitters" ->
      raw"""WITH toks AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |cnt AS (
        |  SELECT t.term, count(*) AS est
        |  FROM toks, unnest(ts) AS t(term)
        |  GROUP BY t.term),
        |ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY est DESC, term) AS BIGINT) AS rank,
        |         term, CAST(est AS BIGINT) AS est
        |  FROM cnt)
        |SELECT rank, term, est FROM ranked WHERE rank <= 20""".stripMargin,


    // q82: the ESTIMATOR recomputed from scratch — same md5-60-bit
    // hashes, distinct per (lang, hash), k-th smallest via row_number,
    // and the identical integer (k-1)*2^60 // h_k (HUGEINT: 15*2^60
    // overflows BIGINT); c < k reports c exactly. Tokenizer twin is
    // q80's verbatim
    "q82_distinct_sketch" ->
      raw"""WITH toks AS (
        |  SELECT lang,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT lang, u.term FROM toks, unnest(ts) AS u(term)),
        |h AS (
        |  SELECT DISTINCT lang,
        |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS hv
        |  FROM t),
        |r AS (
        |  SELECT lang, hv,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS c
        |  FROM h),
        |kth AS (SELECT lang, hv AS hk, c FROM r WHERE rn = least(c, 16)),
        |n AS (SELECT lang, count(*) AS n_values FROM t GROUP BY lang)
        |SELECT n.lang, CAST(n.n_values AS BIGINT) AS n_values,
        |  CAST(least(k.c, 16) AS BIGINT) AS n_hashes,
        |  CAST(CASE WHEN k.c < 16 THEN k.c
        |       ELSE (CAST(15 AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT))
        |            // greatest(k.hk, 1) END AS BIGINT) AS est_distinct
        |FROM n JOIN kth k ON n.lang = k.lang""".stripMargin,


    // q152: the planted fixture + one UNION ALL arm per rule, each a
    // FILTER(NOT coalesce(pred, false)) count + min id, and the
    // x10000 integral rate
    "q152_data_checks" ->
      """WITH fix AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS text,
        |    CASE WHEN doc_id % 41 = 0 THEN 'xx' ELSE lang END AS lang,
        |    CASE WHEN doc_id % 17 = 0 THEN n_chars + 7 ELSE n_chars END
        |      AS n_chars
        |  FROM documents),
        |nr AS (SELECT count(*) AS n_rows FROM fix),
        |u AS (
        |  SELECT 'text_not_null' AS rule,
        |    count(*) FILTER (WHERE NOT coalesce(text IS NOT NULL, false))
        |      AS n_violations,
        |    min(doc_id) FILTER (WHERE NOT coalesce(text IS NOT NULL, false))
        |      AS min_violating_id
        |  FROM fix
        |  UNION ALL
        |  SELECT 'n_chars_consistent',
        |    count(*) FILTER (WHERE NOT coalesce(n_chars = length(text), false)),
        |    min(doc_id) FILTER (WHERE NOT coalesce(n_chars = length(text), false))
        |  FROM fix
        |  UNION ALL
        |  SELECT 'lang_known',
        |    count(*) FILTER (WHERE NOT coalesce(
        |      lang IN ('en', 'de', 'fr', 'es', 'zh'), false)),
        |    min(doc_id) FILTER (WHERE NOT coalesce(
        |      lang IN ('en', 'de', 'fr', 'es', 'zh'), false))
        |  FROM fix
        |  UNION ALL
        |  SELECT 'id_non_negative',
        |    count(*) FILTER (WHERE NOT coalesce(doc_id >= 0, false)),
        |    min(doc_id) FILTER (WHERE NOT coalesce(doc_id >= 0, false))
        |  FROM fix)
        |SELECT u.rule, CAST(nr.n_rows AS BIGINT) AS n_rows,
        |  CAST(u.n_violations AS BIGINT) AS n_violations,
        |  CAST(CASE WHEN nr.n_rows = 0 THEN 0
        |       ELSE u.n_violations * 10000 // nr.n_rows END AS BIGINT)
        |    AS violation_x10000,
        |  u.min_violating_id
        |FROM u CROSS JOIN nr""".stripMargin,


    // q150: counts, the md5-60-bit uniform, and the inverse-CDF
    // Laplace chain in the engine's exact association (b = 1.0 at
    // eps_x1000 = 1000), HALF_UP rounding, clamp at 0
    "q150_dp_counts" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS true_n FROM documents GROUP BY lang),
        |h AS (
        |  SELECT lang, true_n,
        |    CAST(('0x' || substr(md5('dp9' || '|' || lang), 1, 15)) AS BIGINT)
        |      AS hv
        |  FROM c),
        |l AS (
        |  SELECT lang, true_n,
        |    (-1.0) * sign(CAST(hv AS DOUBLE) / 1152921504606846976.0 - 0.5) *
        |    ln(1.0 - 2.0 * abs(CAST(hv AS DOUBLE) / 1152921504606846976.0 - 0.5))
        |      AS lap
        |  FROM h)
        |SELECT lang, CAST(true_n AS BIGINT) AS true_n,
        |  CAST(round(lap * 1000.0, 0) AS BIGINT) AS noise_x1000,
        |  CAST(greatest(true_n + CAST(round(lap, 0) AS BIGINT), 0) AS BIGINT)
        |    AS dp_n
        |FROM l""".stripMargin,


    // q149: the ladder unrolled (l0/l1/l2 CTEs), per-level suppressed
    // sums, the same integral level pick, class sizes and flags at
    // the picked level
    "q149_k_anonymity" ->
      """WITH base AS (
        |  SELECT doc_id, doc_id % 97 AS z, doc_id % 61 AS a FROM documents),
        |l0 AS (SELECT doc_id, 'z' || CAST(z AS VARCHAR) AS zip,
        |              CAST(a AS VARCHAR) AS age FROM base),
        |l1 AS (SELECT doc_id, 'z' || CAST(z // 10 AS VARCHAR) AS zip,
        |              CAST((a // 10) * 10 AS VARCHAR) AS age FROM base),
        |l2 AS (SELECT doc_id, '*' AS zip, '*' AS age FROM base),
        |nn AS (SELECT count(*) AS n FROM base),
        |s0 AS (SELECT coalesce(sum(c), 0) AS s FROM (
        |  SELECT count(*) AS c FROM l0 GROUP BY zip, age) WHERE c < 5),
        |s1 AS (SELECT coalesce(sum(c), 0) AS s FROM (
        |  SELECT count(*) AS c FROM l1 GROUP BY zip, age) WHERE c < 5),
        |s2 AS (SELECT coalesce(sum(c), 0) AS s FROM (
        |  SELECT count(*) AS c FROM l2 GROUP BY zip, age) WHERE c < 5),
        |lvl AS (
        |  SELECT CASE WHEN s0.s * 1000 <= nn.n * 100 THEN 0
        |              WHEN s1.s * 1000 <= nn.n * 100 THEN 1
        |              ELSE 2 END AS l
        |  FROM s0, s1, s2, nn),
        |u AS (
        |  SELECT 0 AS l, * FROM l0
        |  UNION ALL SELECT 1, * FROM l1
        |  UNION ALL SELECT 2, * FROM l2),
        |pick AS (SELECT u.* FROM u JOIN lvl ON u.l = lvl.l),
        |cs AS (SELECT zip, age, count(*) AS class_size
        |       FROM pick GROUP BY zip, age)
        |SELECT p.doc_id,
        |  CASE WHEN cs.class_size < 5 THEN NULL ELSE p.zip END AS zip,
        |  CASE WHEN cs.class_size < 5 THEN NULL ELSE p.age END AS age,
        |  CAST(cs.class_size AS BIGINT) AS class_size,
        |  cs.class_size < 5 AS suppressed,
        |  CAST(p.l AS BIGINT) AS level
        |FROM pick p JOIN cs USING (zip, age)""".stripMargin,


    // q139: the register table rebuilt from raw text — q82's md5-60-bit
    // hashes, register/remainder split, the bin()-length rank (rest = 0
    // cased FIRST on both sides: bin(0) = '0' has length 1), per-register
    // max, and the same integer estimator with empty registers folded in
    // as 2^55 terms; the numerator literal is Hll.estNumerator verbatim
    "q139_hll_distinct" ->
      raw"""WITH toks AS (
        |  SELECT lang,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT lang, u.term FROM toks, unnest(ts) AS u(term)),
        |h AS (
        |  SELECT lang,
        |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS hv
        |  FROM t),
        |rr AS (
        |  SELECT lang, hv % 64 AS reg,
        |    CASE WHEN hv // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(hv // 64)) END AS rho
        |  FROM h),
        |pr AS (
        |  SELECT lang, reg, max(rho) AS mr, count(*) AS c
        |  FROM rr GROUP BY lang, reg),
        |pk AS (
        |  SELECT lang, sum(c) AS n_values, count(*) AS n_regs_hit,
        |    max(mr) AS max_rho,
        |    sum(1::HUGEINT << (55 - mr)) AS t_hit
        |  FROM pr GROUP BY lang)
        |SELECT lang, CAST(n_values AS BIGINT) AS n_values,
        |  CAST(n_regs_hit AS BIGINT) AS n_regs_hit,
        |  CAST(max_rho AS BIGINT) AS max_rho,
        |  CAST('${graft.operators.Hll.estNumerator}'::HUGEINT
        |       // (t_hit + (64 - n_regs_hit) * (1::HUGEINT << 55))
        |       AS BIGINT) AS est_x1000
        |FROM pk""".stripMargin,


    // q154: ONE direct per-day register recompute feeds BOTH estimate
    // columns — max-merge is associative, so the engine's hourly
    // rollup must equal it bit-for-bit or the hash gate fails
    "q154_hll_rollup" ->
      raw"""WITH ev AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    strftime(ts, '%Y-%m-%d %H') AS hour, user_id
        |  FROM events),
        |h AS (
        |  SELECT day,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) AS hv
        |  FROM ev),
        |rr AS (
        |  SELECT day, hv % 64 AS reg,
        |    CASE WHEN hv // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(hv // 64)) END AS rho
        |  FROM h),
        |pr AS (SELECT day, reg, max(rho) AS mr, count(*) AS c
        |       FROM rr GROUP BY day, reg),
        |pk AS (
        |  SELECT day, sum(c) AS n_values, count(*) AS n_regs_hit,
        |    sum(1::HUGEINT << (55 - mr)) AS t_hit
        |  FROM pr GROUP BY day),
        |est AS (
        |  SELECT day, n_values,
        |    CAST('${graft.operators.Hll.estNumerator}'::HUGEINT
        |         // (t_hit + (64 - n_regs_hit) * (1::HUGEINT << 55))
        |         AS BIGINT) AS e
        |  FROM pk),
        |nh AS (SELECT day, count(DISTINCT hour) AS n_hours
        |       FROM ev GROUP BY day)
        |SELECT est.day, CAST(nh.n_hours AS BIGINT) AS n_hours,
        |  CAST(est.n_values AS BIGINT) AS n_values,
        |  est.e AS est_direct_x1000, est.e AS est_merged_x1000
        |FROM est JOIN nh ON nh.day = est.day""".stripMargin,


    // q89: the sketch rebuilt from exact term counts — depth row d's
    // bucket is hex digits [8d, 8d+8) of ONE md5(term) (unsigned
    // 32-bit slice) % width; bucket totals sum counts over colliding
    // terms, estimates take the same min over rows; the linearity of
    // the counters is what makes the group-by form equal the engine's
    // streaming form
    "q89_count_min" ->
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT doc_id, u.term FROM toks, unnest(ts) AS u(term)),
        |counts AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
        |dd AS (SELECT unnest(generate_series(0, 3)) AS d),
        |g AS (
        |  SELECT dd.d,
        |    CAST(('0x' || substr(md5(c.term), 1 + 8 * dd.d, 8))
        |         AS BIGINT) % 1024 AS b,
        |    sum(c.cnt) AS tot
        |  FROM counts c CROSS JOIN dd GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT term FROM t WHERE doc_id < 3),
        |pe AS (
        |  SELECT p.term, dd.d,
        |    CAST(('0x' || substr(md5(p.term), 1 + 8 * dd.d, 8))
        |         AS BIGINT) % 1024 AS b
        |  FROM probes p CROSS JOIN dd)
        |SELECT pe.term, CAST(min(coalesce(g.tot, 0)) AS BIGINT) AS est
        |FROM pe LEFT JOIN g ON g.d = pe.d AND g.b = pe.b
        |GROUP BY pe.term""".stripMargin,


    // q91: rebuild the exact SET-BIT SET from raw data under the same
    // md5 double-hash scheme (h1/h2 = unsigned 32-bit md5 slices,
    // stride forced odd with pure arithmetic), then answer every
    // probe: might_contain = ALL k probed bits present. False
    // positives are recomputed too, not tolerated
    "q91_bloom" ->
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
        |         END AS ts
        |  FROM documents),
        |t AS (SELECT doc_id, u.term FROM toks, unnest(ts) AS u(term)),
        |ii AS (SELECT unnest(generate_series(0, 4)) AS i),
        |hv AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS h1,
        |    CAST(('0x' || substr(md5(term), 9, 8)) AS BIGINT) AS h2
        |  FROM t),
        |bits AS (
        |  SELECT DISTINCT (h1 + i * (h2 - h2 % 2 + 1)) % 131072 AS bit
        |  FROM hv CROSS JOIN ii),
        |probes AS (
        |  SELECT DISTINCT term FROM t WHERE doc_id < 3
        |  UNION
        |  SELECT 'zzz_absent_' || unnest(generate_series(0, 7))::VARCHAR),
        |ph AS (
        |  SELECT term,
        |    CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS h1,
        |    CAST(('0x' || substr(md5(term), 9, 8)) AS BIGINT) AS h2
        |  FROM probes),
        |pb AS (
        |  SELECT term, (h1 + i * (h2 - h2 % 2 + 1)) % 131072 AS bit
        |  FROM ph CROSS JOIN ii)
        |SELECT pb.term, bool_and(b.bit IS NOT NULL) AS might_contain
        |FROM pb LEFT JOIN bits b ON b.bit = pb.bit
        |GROUP BY pb.term""".stripMargin,


    // full sketch replay: bottom-16 (md5 hash, value) pairs of the
    // distinct token-count histogram per source, exact counts, lower
    // quantile by cumulative sum — both regimes recomputed, not just
    // the exact one
    "q110_quantile_sketch" ->
      raw"""WITH t AS (
        |  SELECT source,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
        |         END AS BIGINT) AS ntok
        |  FROM documents),
        |h AS (
        |  SELECT source, ntok AS v, count(*) AS c FROM t
        |  WHERE ntok IS NOT NULL GROUP BY source, ntok),
        |hh AS (
        |  SELECT source, v, c,
        |    CAST(('0x' || substr(md5('qsk:' || CAST(v AS VARCHAR)), 1, 15))
        |         AS BIGINT) AS hv
        |  FROM h),
        |top AS (
        |  SELECT source, v, c FROM (
        |    SELECT source, v, c,
        |      row_number() OVER (PARTITION BY source ORDER BY hv, v) AS rn
        |    FROM hh) WHERE rn <= 16),
        |w AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS wt,
        |    CAST(count(*) AS BIGINT) AS np
        |  FROM top GROUP BY source),
        |cum AS (
        |  SELECT tp.source, tp.v,
        |    sum(tp.c) OVER (PARTITION BY tp.source ORDER BY tp.v) AS cm,
        |    w.wt
        |  FROM top tp JOIN w ON w.source = tp.source),
        |qs AS (
        |  SELECT source,
        |    min(v) FILTER (WHERE cm * 10000 >= 5000 * wt) AS p50,
        |    min(v) FILTER (WHERE cm * 10000 >= 9000 * wt) AS p90,
        |    min(v) FILTER (WHERE cm * 10000 >= 9900 * wt) AS p99
        |  FROM cum GROUP BY source),
        |nn AS (SELECT source, count(ntok) AS n FROM t GROUP BY source)
        |SELECT nn.source, CAST(nn.n AS BIGINT) AS n,
        |  CAST(COALESCE(w.np, 0) AS BIGINT) AS n_pairs,
        |  qs.p50, qs.p90, qs.p99
        |FROM nn
        |LEFT JOIN w ON w.source = nn.source
        |LEFT JOIN qs ON qs.source = nn.source""".stripMargin
  )
}
