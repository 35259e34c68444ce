package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.RiskFeatures
import graft.norm.Normalizer
import graft.operators.{BurstDetector, ToolScanner}
import graft.query.{FilterOptions, Filters}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.{LogSources, ParsedLogs}

/** End-to-end pipeline wiring (reference triage.py:227-263 / SURVEY §3).
  *
  * parse -> dedup -> utc time -> sessionize -> request_count ->
  * risk features -> rule engine -> burst detector -> tool scanner ->
  * filters -> sink. Stages are lazy DataFrame transforms; the normalized
  * + scored frame should be `.cache()`d by callers that re-filter
  * interactively (the reference keeps it resident — SURVEY §3 entry 3).
  */
object Pipeline {

  /** Options equivalent to the reference pipeline's knobs. */
  final case class Options(
      timeOffsetSeconds: Long = 0,
      sessionGapSeconds: Long = Sessionizer.DefaultThreshold,
      strictTimestamps: Boolean = true,
      burstRiskScore: Double = 95.0,
      burstMinRequests: Long = 100,
      burstMaxGapSeconds: Double = 1.0)

  /** Normalize + sessionize an already-parsed frame. Adds a stable
    * `_row_id` used as the pandas-row-order stand-in (SURVEY §7.4.2).
    */
  def normalize(parsed: DataFrame, opts: Options = Options()): DataFrame = {
    val withId = parsed.withColumn("_row_id", monotonically_increasing_id())
    val deduped = Normalizer.removeDuplicates(withId, col("_row_id"))
    val timed = Normalizer.withUtcTimestamp(deduped, opts.timeOffsetSeconds, opts.strictTimestamps)
    val clustered = Sessionizer.withClusters(timed, opts.sessionGapSeconds)
    Sessionizer.withRequestCount(clustered)
  }

  /** Risk stage (reference triage.py:241-245 order: balatro ->
    * burp_intruder -> tool_scanner; W2 unconditionally overwrites).
    */
  def score(
      normalized: DataFrame,
      config: GraftConfig,
      rules: Seq[RuleEngine.SigmaRule],
      webshells: Set[String],
      opts: Options = Options()): DataFrame = {
    val featured = normalized
      .withColumn("uri_risk",
        RiskFeatures.uriRisk(col("request_uri"),
          config.sensitivePaths, config.riskyExtensionPatterns, webshells))
      .withColumn("method_risk", RiskFeatures.methodRisk(col("method")))
      .withColumn("status_risk", RiskFeatures.statusRisk(col("status")))
    val ruled = RuleEngine(featured, rules)
    val burst = BurstDetector(ruled,
      opts.burstRiskScore, opts.burstMinRequests, opts.burstMaxGapSeconds)
    ToolScanner(burst, config.toolSignatures)
  }

  /** Full pipeline from raw log paths. */
  def run(
      spark: SparkSession,
      paths: Seq[String],
      config: GraftConfig,
      rules: Seq[RuleEngine.SigmaRule],
      webshells: Set[String],
      opts: Options = Options(),
      filters: FilterOptions = FilterOptions()): DataFrame = {
    val ParsedLogs(parsed, _) = LogSources.parseLogs(spark, paths)
    val normalized = normalize(parsed, opts)
    val scored = score(normalized, config, rules, webshells, opts)
    Filters(scored, filters, col("_row_id"))
  }

  /** Stage the normalized frame as the date/source-partitioned parquet
    * store (SURVEY §4.3 / PLANS.md layout) — parse once, re-query many:
    * subsequent runs read the staged table with partition pruning
    * instead of re-parsing text. CLI: `--stage <dir>` writes it,
    * `--from-stage <dir>` queries it.
    *
    * With `strictTimestamps` the C10 hard-error check rides the write
    * itself ([[writeStageChecked]]) instead of running `withUtcTimestamp`'s
    * separate eager scan — the cold staging path parses the text ONCE.
    */
  def stage(spark: SparkSession, paths: Seq[String], dir: String,
      opts: Options = Options()): Unit = {
    val graft.sources.ParsedLogs(parsed, _) = LogSources.parseLogs(spark, paths)
    if (opts.strictTimestamps)
      writeStageChecked(normalize(parsed, opts.copy(strictTimestamps = false)), dir)
    else
      graft.sink.ParquetStage.write(normalize(parsed, opts), dir)
  }

  /** The staging-folded C10 strict check: an `observe` metric on the
    * write counts null `utc_timestamp` rows WHILE the stage is written —
    * zero extra jobs on the all-valid path (the former eager check was
    * its own full scan before the write re-parsed everything). Only on
    * failure does it pay one more job to fetch the reference message's
    * five examples, then deletes the half-written stage (a later
    * `--from-stage` must not read a store that failed its contract)
    * and throws the byte-identical error.
    */
  def writeStageChecked(norm: DataFrame, dir: String): Unit = {
    val obs = org.apache.spark.sql.Observation("strict_timestamps")
    val observed = norm.observe(obs,
      sum(when(col("utc_timestamp").isNull, 1L).otherwise(0L)).as("n_bad"))
    graft.sink.ParquetStage.write(observed, dir)
    val nBad = obs.get("n_bad") match {
      case null => 0L
      case n: java.lang.Number => n.longValue()
    }
    if (nBad > 0) {
      val bad = norm.filter(col("utc_timestamp").isNull).limit(5)
        .select(col("source"), col("timestamp")).collect()
      val spark = norm.sparkSession
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      throw Normalizer.invalidTimestampError(bad)
    }
  }

  /** Score + filter over a previously staged store. The staged frame
    * already carries normalize's outputs (_row_id, utc_timestamp,
    * cluster, request_count), so this path skips parse AND normalize.
    */
  def runFromStage(
      spark: SparkSession,
      stageDir: String,
      config: GraftConfig,
      rules: Seq[RuleEngine.SigmaRule],
      webshells: Set[String],
      opts: Options = Options(),
      filters: FilterOptions = FilterOptions()): DataFrame = {
    val staged = graft.sink.ParquetStage.read(spark, stageDir).drop("event_date")
    val scored = score(staged, config, rules, webshells, opts)
    Filters(scored, filters, col("_row_id"))
  }
}
