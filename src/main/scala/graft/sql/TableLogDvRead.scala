package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{
  DeleteFromTable, LogicalPlan, MergeIntoTable, Project, UpdateTable,
  V2WriteCommand}
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
  * ONLY genuine DML TARGET relations are exempt — the relation a
  * `DeleteFromTable`/`UpdateTable`/`MergeIntoTable` mutates or a
  * `V2WriteCommand` inserts into (planned by their own commands, not
  * read). Everything else rewrites, INCLUDING a command's direct
  * child: `CREATE TABLE dst AS SELECT * FROM <dv'd table>`, a bare
  * `INSERT INTO dst SELECT * FROM <dv'd table>`, and the V1-fallback
  * re-plan under `df.write` all put the READ relation directly under
  * a command node, and a blanket direct-child exemption (the
  * round-15 shape) silently resurrected deleted rows there. The
  * DV-aware scan ([[TableLogDvScan]]) independently compensates any
  * shape this rule misses — this rewrite is the perf path (a
  * distributed anti-join), the scan is the correctness floor.
  */
object TableLogDvReadRewrite extends Rule[LogicalPlan] {

  private def hasLiveDvs(t: TableLogTable): Boolean =
    t.snap.hasDvs || t.snap.hasEqDeletes

  private def isDvRel(p: LogicalPlan): Boolean = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: TableLogTable => hasLiveDvs(t)
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // cheap pre-scan: nothing to do unless some relation carries DVs.
    // Subquery-aware: when this rule runs (operator-optimization
    // batch) IN/EXISTS/scalar subqueries are still EXPRESSIONS
    // (RewritePredicateSubquery runs later), so a DV table referenced
    // only inside one is invisible to plan.exists alone
    val any = (plan +: plan.subqueriesAll).exists(_.exists(isDvRel))
    if (!any) return plan
    // DML/write TARGETS must stay relations (planned by their own
    // commands); collected by node FIELD — never by plan position
    // (a command's direct child is its read-side query after identity
    // projections collapse)
    val protectedRels = plan.collect {
      case d: DeleteFromTable => d.table
      case u: UpdateTable => u.table
      case m: MergeIntoTable => m.targetTable
      case w: V2WriteCommand => w.table
    }.flatMap(_.collect { case r: DataSourceV2Relation => r })
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
