package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt-test / Great-Expectations
  * shape for corpus manifests: a rule set of row-level predicates
  * evaluated in ONE pass, reported as per-rule violation counts, the
  * x10000 violation rate, and the smallest violating id (the "show me
  * one" debugging handle). A row violates a rule when the predicate
  * is FALSE or NULL — null-escape is the classic silent hole in
  * hand-rolled `filter(!p)` checks, so it is part of the contract
  * here.
  *
  * 100 TB shape: all rules fold into one aggregation over one scan
  * (sum + conditional-min per rule, map-side combined); the per-rule
  * rows come from exploding the single aggregated row. No shuffle
  * carries data rows — only the #rules-row summary.
  */
object DataChecks {

  /** (rule, n_rows, n_violations, violation_x10000, min_violating_id).
    * Rules are (name, predicate); names must be unique.
    */
  def checkRules(
      df: DataFrame, idCol: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules: need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "checkRules: rule names must be unique")
    // internal aggregate aliases are POSITIONAL (_dc_n_0, _dc_n_1, …):
    // interpolating the user-facing rule name into an alias and
    // re-resolving it with col() would mis-parse names containing
    // dots (struct-field path) or backticks; the name only ever
    // surfaces as a string literal in the output struct
    val aggs = rules.zipWithIndex.flatMap { case ((_, pred), i) =>
      val bad = !coalesce(pred, lit(false))
      Seq(
        sum(when(bad, 1L).otherwise(0L)).as(s"_dc_n_$i"),
        min(when(bad, col(idCol))).as(s"_dc_id_$i"))
    }
    val one = df.agg(count(lit(1)).as("_dc_rows"), aggs: _*)
    val ruleRows = array(rules.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("rule"),
        col(s"_dc_n_$i").as("n_violations"),
        col(s"_dc_id_$i").as("min_violating_id"))
    }: _*)
    one.select(col("_dc_rows"), explode(ruleRows).as("_dc_r"))
      .select(
        col("_dc_r.rule").as("rule"),
        col("_dc_rows").as("n_rows"),
        col("_dc_r.n_violations").as("n_violations"),
        when(col("_dc_rows") === 0, lit(0L))
          .otherwise(expr(
            "CAST(_dc_r.n_violations * 10000 DIV _dc_rows AS BIGINT)"))
          .as("violation_x10000"),
        col("_dc_r.min_violating_id").as("min_violating_id"))
  }
}
