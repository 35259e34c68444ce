package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-funnel accounting — the "why did my corpus shrink" report a
  * curation team reads before touching any gate threshold. For an
  * ORDERED list of named gates (row-level keep-predicates, evaluated
  * in pipeline order) it answers, in ONE pass over the corpus:
  *
  *  - `n_fail`        — rows failing the gate at all (unconditional);
  *  - `n_first_fail`  — rows whose FIRST failing gate is this one
  *                      (the waterfall attribution: these sum to the
  *                      total drop count);
  *  - `n_unique_fail` — rows failing ONLY this gate (the marginal
  *                      view: removing this gate recovers exactly
  *                      these rows);
  *  - `n_survive`     — rows passing every gate up to and including
  *                      this one (the retention curve).
  *
  * A row fails a gate when its predicate is FALSE **or NULL**
  * (the [[DataChecks]] null-escape contract).
  *
  * 100 TB shape: gate flags and the per-row first-fail/fail-count
  * derivations are pure codegen'd projections; everything folds into
  * one map-side-combined aggregation over one scan — the shuffle
  * carries a single 4·#gates-column row, never data rows. The
  * per-gate output rows come from exploding that one aggregated row.
  *
  * Complements the reference's single-predicate filters
  * (`triage.py:26-224` exposes each gate as an independent CLI flag
  * with no drop accounting) and q170's threshold sweep (ONE gate,
  * many thresholds; this is many gates, one threshold each).
  */
object Funnel {

  /** (gate_ord, gate, n_rows, n_fail, n_first_fail, n_unique_fail,
    * n_survive), one row per gate in pipeline order. Gate names must
    * be unique.
    */
  def report(df: DataFrame, gates: Seq[(String, Column)]): DataFrame =
    reportInternal(df, gates, None)

  /** [[report]] segmented by a grouping column (per-source / per-lang
    * retention): one row per (segment, gate), counts within the
    * segment. Still one aggregation — the shuffle carries
    * #segments × one summary row.
    */
  def reportBy(
      df: DataFrame, segment: String,
      gates: Seq[(String, Column)]): DataFrame =
    reportInternal(df, gates, Some(segment))

  private val reservedOut = Set("gate_ord", "gate", "n_rows", "n_fail",
    "n_first_fail", "n_unique_fail", "n_survive")

  private def reportInternal(
      df: DataFrame, gates: Seq[(String, Column)],
      segment: Option[String]): DataFrame = {
    require(gates.nonEmpty, "Funnel.report: need at least one gate")
    require(gates.map(_._1).distinct.size == gates.size,
      "Funnel.report: gate names must be unique")
    require(segment.forall(s => !reservedOut.contains(s)),
      s"Funnel.reportBy: segment column collides with an output column")
    val n = gates.size
    // internal aliases are POSITIONAL (the DataChecks rule: user
    // names never become resolvable identifiers)
    val flags = gates.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(pred, lit(false)).as(s"_fn_g$i")
    }
    val nfail = (0 until n)
      .map(i => when(col(s"_fn_g$i"), 0).otherwise(1)).reduce(_ + _)
    val firstFail = (0 until n).foldRight(lit(-1): Column) {
      case (i, rest) => when(!col(s"_fn_g$i"), lit(i)).otherwise(rest)
    }
    val segCols = segment.toSeq.map(s => col(s).as("_fn_seg"))
    val meta = df.select(segCols ++ flags: _*)
      .withColumn("_fn_nfail", nfail)
      .withColumn("_fn_first", firstFail)
    val aggs = (0 until n).flatMap { i =>
      Seq(
        sum(when(!col(s"_fn_g$i"), 1L).otherwise(0L)).as(s"_fn_fail_$i"),
        sum(when(col("_fn_first") === i, 1L).otherwise(0L)).as(s"_fn_ff_$i"),
        sum(when(col("_fn_nfail") === 1 && !col(s"_fn_g$i"), 1L)
          .otherwise(0L)).as(s"_fn_uf_$i"),
        sum(when((0 to i).map(j => col(s"_fn_g$j")).reduce(_ && _), 1L)
          .otherwise(0L)).as(s"_fn_sv_$i"))
    }
    val one = segment match {
      case Some(_) => meta.groupBy(col("_fn_seg"))
        .agg(count(lit(1)).as("_fn_rows"), aggs: _*)
      case None => meta.agg(count(lit(1)).as("_fn_rows"), aggs: _*)
    }
    val gateRows = array((0 until n).map { i =>
      struct(
        lit(i.toLong).as("gate_ord"),
        lit(gates(i)._1).as("gate"),
        col(s"_fn_fail_$i").as("n_fail"),
        col(s"_fn_ff_$i").as("n_first_fail"),
        col(s"_fn_uf_$i").as("n_unique_fail"),
        col(s"_fn_sv_$i").as("n_survive"))
    }: _*)
    val segOut = segment.toSeq.map(s => col("_fn_seg").as(s))
    val exploded = one.select(
      segOut :+ col("_fn_rows") :+ explode(gateRows).as("_fn_r"): _*)
    exploded.select(
      segment.toSeq.map(col) ++ Seq(
        col("_fn_r.gate_ord").as("gate_ord"),
        col("_fn_r.gate").as("gate"),
        col("_fn_rows").as("n_rows"),
        col("_fn_r.n_fail").as("n_fail"),
        col("_fn_r.n_first_fail").as("n_first_fail"),
        col("_fn_r.n_unique_fail").as("n_unique_fail"),
        col("_fn_r.n_survive").as("n_survive")): _*)
  }
}
