package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{
  Command, DeleteFromTable, LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.operators.TableLog

/** Deletion-vector read compensation for the SQL catalog.
  *
  * The catalog's batch scan delegates to Spark's v2 parquet scan over
  * the manifest's file list — which knows nothing about deletion
  * vectors, so a `SELECT` from a table with live DVs would resurrect
  * the deleted rows. This optimizer rule replaces the v2 relation of
  * any DV-carrying [[TableLogTable]] with the DV-applied read plan
  * ([[TableLog.read]]: parquet scan + broadcast anti-join on
  * (file basename, row position)), aliased back to the relation's
  * exprIds so everything above is untouched. Filters above remain
  * residual by the scan builder's contract, so dropping the v2 scan
  * loses no pushed semantics — the v1 parquet relation underneath
  * re-gains filter pushdown and column pruning through the normal
  * file-source planning; tables WITHOUT live DVs never match (zero
  * overhead on the common path).
  *
  * Write/DML TARGET relations are exempt: `DeleteFromTable`'s target
  * resolves through SupportsDelete and a `V2WriteCommand`'s table is
  * an insertion target, not a read — only genuine read sides (e.g.
  * the query under `INSERT ... SELECT FROM <dv'd table>`) rewrite.
  */
object TableLogDvReadRewrite extends Rule[LogicalPlan] {

  private def hasLiveDvs(t: TableLogTable): Boolean = t.snap.hasDvs

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // cheap pre-scan: nothing to do unless some relation carries DVs
    val any = plan.exists {
      case r: DataSourceV2Relation => r.table match {
        case t: TableLogTable => hasLiveDvs(t)
        case _ => false
      }
      case _ => false
    }
    if (!any) return plan
    // DML/write targets must stay relations (planned by their own
    // commands); collect them by reference identity
    val protectedRels = plan.collect {
      case d: DeleteFromTable => Seq(d.table)
      case w: V2WriteCommand => Seq(w.table)
      case c: Command => c.children // conservatively: a command's
        // direct child relation is its target shape, never a plain read
    }.flatten
    plan.transformDownWithSubqueries {
      case rel: DataSourceV2Relation if (rel.table match {
        case t: TableLogTable => hasLiveDvs(t)
        case _ => false
      }) && !protectedRels.exists(_ eq rel) =>
        val t = rel.table.asInstanceOf[TableLogTable]
        val spark = SparkSession.active
        // optimizedPlan (not analyzed): join hints are already folded
        // into the Join node, so no ResolvedHint survives into the
        // outer plan, and re-optimizing the subtree is idempotent
        val compensated = TableLog.read(spark, t.path, Some(t.snap.version))
          .queryExecution.optimizedPlan
        val byName = compensated.output.map(a => a.name -> a).toMap
        Project(
          rel.output.map { o =>
            val in = byName(o.name)
            // file-source relations force nullable attributes; restore
            // the v2 relation's nullability or nullability-sensitive
            // parents (AppendData's outputResolved) become unresolved
            val child =
              if (!o.nullable && in.nullable)
                org.apache.spark.sql.catalyst.expressions.KnownNotNull(in)
              else in
            Alias(child, o.name)(exprId = o.exprId)
          },
          compensated)
    }
  }
}
