package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling — the ANALYZE-style column statistics a
  * warehouse keeps per table: row count, per-column null count,
  * exact distinct count, and min/max (rendered as strings so one
  * report schema serves every column type). The report is what feeds
  * broadcast-threshold decisions, partition-column selection, and
  * the [[StorageLayout]] clustering choices.
  *
  * Scale notes: the multi-column exact `countDistinct` plans through
  * Catalyst's Expand (one duplicated stream per distinct column) —
  * exact and fine into the low-billions per column, and the report is
  * what the DuckDB oracle can replay verbatim. At 100 TB with
  * wide tables, swap the distinct counter for the mergeable HLL
  * sketch ([[Hll]], q139/q154) — same report schema, one Expand-free
  * pass; the exact/approx twin discipline is the ANN families'
  * (q42–q44).
  *
  * Min/max comparisons are binary/codepoint order in BOTH engines
  * (Spark UTF8String, DuckDB default collation), so string columns
  * hash-match cross-engine.
  */
object TableProfile {

  /** (col_name, n_rows, n_null, n_distinct, min_str, max_str) — one
    * row per requested column, all from ONE aggregation over one
    * scan. `n_distinct` ignores nulls (the SQL `count(DISTINCT ...)`
    * contract).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "TableProfile.profile: need at least one column")
    require(cols.distinct.size == cols.size,
      "TableProfile.profile: column list must be distinct")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_tp_null_$i"),
        countDistinct(col(c)).as(s"_tp_nd_$i"),
        min(col(c)).cast("string").as(s"_tp_min_$i"),
        max(col(c)).cast("string").as(s"_tp_max_$i"))
    }
    val one = df.agg(count(lit(1)).as("_tp_rows"), aggs: _*)
    val colRows = array(cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col(s"_tp_null_$i").as("n_null"),
        col(s"_tp_nd_$i").as("n_distinct"),
        col(s"_tp_min_$i").as("min_str"),
        col(s"_tp_max_$i").as("max_str"))
    }: _*)
    one.select(col("_tp_rows"), explode(colRows).as("_tp_r"))
      .select(
        col("_tp_r.col_name").as("col_name"),
        col("_tp_rows").as("n_rows"),
        col("_tp_r.n_null").as("n_null"),
        col("_tp_r.n_distinct").as("n_distinct"),
        col("_tp_r.min_str").as("min_str"),
        col("_tp_r.max_str").as("max_str"))
  }
}
