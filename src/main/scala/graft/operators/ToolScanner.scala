package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.rules.ToolSignature

/** W3 — tool-signature detection (reference `tool_scanner`,
  * risk.py:384-513) — the one operator whose semantics (sequential
  * multi-pattern-within-window matching with a consumed-row cache) no
  * SQL window function expresses; per SURVEY §2.6 it drops to the typed
  * API: `groupByKey(...).flatMapGroups` running the scan per
  * `(source, ip, cluster)` group.
  *
  * Semantics preserved exactly:
  *  - candidates are rows whose lowered URI contains ANY keyword of the
  *    tool (literal substring; risk.py:414-420);
  *  - scan forward from each unconsumed candidate collecting CANDIDATE
  *    rows until all keywords are seen or `(next_ts - start_ts) >
  *    time_window` (risk.py:455-481); `time_window == 0` = unlimited;
  *  - on success every collected row gets the tool id/name/description;
  *    consumed rows are skipped as scan STARTS (per tool) but can be
  *    re-collected by later scans (risk.py:456-459);
  *  - across tools/groups, the LAST assignment to a row wins
  *    (drop_duplicates keep='last', risk.py:500).
  *
  * Scale: only keyword-matching candidate rows are shuffled (usually a
  * tiny fraction); groups are single sessions, sorted in-memory inside
  * the task; assignments join back on a row id, broadcast when small.
  */
object ToolScanner {

  /** Public (not `private`): Spark's generated row deserializer
    * instantiates this from codegen'd code outside this object.
    */
  final case class Cand(source: String, ip: String, cluster: Long,
      uri: String, epoch: Long, rowId: Long)

  def apply(df: DataFrame, signatures: Seq[ToolSignature], rowIdCol: String = "_row_id"): DataFrame = {
    val base = df
      .withColumn("tool", lit(""))
      .withColumn("tool_name", lit(""))
      .withColumn("tool_desc", lit(""))
    if (signatures.isEmpty) return base

    val spark = df.sparkSession
    import spark.implicits._

    // keyword sets, lowered/trimmed, empties dropped (risk.py:404-420)
    val toolKeywords: Seq[(ToolSignature, Set[String])] = signatures.map { sig =>
      sig -> sig.keywords.iterator
        .filter(k => k != null && k.trim.nonEmpty)
        .map(_.toLowerCase.trim).toSet
    }.filter(_._2.nonEmpty)
    if (toolKeywords.isEmpty) return base

    val allKeywords = toolKeywords.flatMap(_._2).distinct

    // pre-filter: only rows matching ANY keyword participate at all
    val lowerUri = lower(col("request_uri").cast("string"))
    val anyKw = allKeywords.map(k => lowerUri.contains(k)).reduce(_ || _)
    val cands = df
      .filter(anyKw)
      .select(
        col("source").cast("string").as("source"),
        col("ip").cast("string").as("ip"),
        col("cluster").cast(LongType).as("cluster"),
        lowerUri.as("uri"),
        col("utc_timestamp").cast(LongType).as("epoch"),
        col(rowIdCol).cast(LongType).as("rowId"))
      .as[Cand]

    val sigs = toolKeywords // serialized into the closure (small config)

    val assignments = cands
      .groupByKey(c => (c.source, c.ip, c.cluster))
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(c => (c.epoch, c.rowId))
        val out = mutable.LinkedHashMap.empty[Long, (String, String, String)]
        for ((sig, req) <- sigs) {
          val window = sig.timeWindowSeconds
          val toolCands = rows.filter(r => req.exists(r.uri.contains))
          if (toolCands.nonEmpty) {
            val matched: Array[Set[String]] =
              toolCands.map(r => req.filter(r.uri.contains))
            val consumed = mutable.HashSet.empty[Long]
            var i = 0
            while (i < toolCands.length) {
              val start = toolCands(i)
              if (!consumed.contains(start.rowId)) {
                val found = mutable.HashSet.empty[String]
                found ++= matched(i)
                val collected = mutable.ArrayBuffer[Int](i)
                var j = i + 1
                var stop = false
                while (j < toolCands.length && !stop) {
                  val next = toolCands(j)
                  if (window > 0 && next.epoch - start.epoch > window) stop = true
                  else {
                    collected += j
                    found ++= matched(j)
                    if (req.subsetOf(found)) stop = true
                    else j += 1
                  }
                }
                val span =
                  if (collected.length > 1)
                    toolCands(collected.last).epoch - toolCands(collected.head).epoch
                  else 0L
                if (req.subsetOf(found) && (window == 0 || span <= window)) {
                  collected.foreach { k =>
                    val id = toolCands(k).rowId
                    out(id) = (sig.tool, sig.name, sig.description)
                    consumed += id
                  }
                }
              }
              i += 1
            }
          }
        }
        out.iterator.map { case (id, (t, n, d)) => (id, t, n, d) }
      }
      .toDF(rowIdCol, "_t_tool", "_t_name", "_t_desc")

    df.join(assignments, Seq(rowIdCol), "left")
      .withColumn("tool", coalesce(col("_t_tool"), lit("")))
      .withColumn("tool_name", coalesce(col("_t_name"), lit("")))
      .withColumn("tool_desc", coalesce(col("_t_desc"), lit("")))
      .drop("_t_tool", "_t_name", "_t_desc")
  }
}
