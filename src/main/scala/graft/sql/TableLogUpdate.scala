package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.GraftInterop

import graft.operators.TableLog

/** `UPDATE tablelog.` as SQL — the public Delta pattern: an injected
  * RESOLUTION rule replaces the analyzer's resolved [[UpdateTable]]
  * over a TableLog relation with a runnable command BEFORE the
  * check-analysis pass would refuse it (plain DSv2 tables don't
  * support UPDATE), and the command routes to
  * [[TableLog.updateWhere]] — copy-on-write of exactly the files
  * containing matches, committed as a version.
  *
  * Expressions cross from the analyzed plan into the command by NAME
  * (attribute references re-resolve against the freshly-planned read
  * — exprIds never survive a replan); subqueries in the condition or
  * assignments are refused loudly.
  */
object TableLogUpdateRewrite extends Rule[LogicalPlan] {

  private def byName(e: Expression): org.apache.spark.sql.Column =
    GraftInterop.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })

  private def noSubquery(e: Expression, what: String): Unit =
    require(!SubqueryExpression.hasSubquery(e),
      s"TableLog UPDATE: subqueries in $what are not supported")

  /** The relation arrives wrapped (SubqueryAlias from the name
    * resolution); unwrap to the DSv2 relation.
    */
  private def relationOf(plan: LogicalPlan): Option[DataSourceV2Relation] =
    org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => Some(r)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u @ UpdateTable(rel, assignments, condition)
        if u.resolved && relationOf(rel).exists(_.table.isInstanceOf[TableLogTable]) =>
      val t = relationOf(rel).get.table.asInstanceOf[TableLogTable]
      require(!t.timeTraveled,
        s"TableLog UPDATE: cannot update time-traveled version ${t.snap.version}")
      condition.foreach(noSubquery(_, "the WHERE condition"))
      val set = assignments.map { a =>
        noSubquery(a.value, "assignments")
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new IllegalArgumentException(
            s"TableLog UPDATE: unsupported assignment target $other " +
              "(only top-level columns)")
        }
        name -> byName(a.value)
      }
      TableLogUpdateCommand(t.path, set,
        condition.map(byName).getOrElse(org.apache.spark.sql.functions.lit(true)))
  }
}

/** Driver-side execution of the rewritten UPDATE. */
case class TableLogUpdateCommand(
    path: String,
    set: Seq[(String, org.apache.spark.sql.Column)],
    condition: org.apache.spark.sql.Column) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    TableLog.updateWhere(spark, path, set, condition)
    Seq.empty
  }
}
