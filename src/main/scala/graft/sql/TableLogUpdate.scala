package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.{expressions => ce}
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

/** `MERGE INTO tablelog.` — same pattern as UPDATE. The whole-row
  * upsert (`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
  * INSERT *`) takes the [[TableLog.merge]] fast path; every other
  * combination of conditional UPDATE/DELETE matched actions, partial
  * SETs, and conditional INSERTs routes to the general
  * [[TableLog.mergeWhen]] (first applicable action wins per row).
  * The ON condition must be a single `t.key = s.key` equality (one
  * side from the target, one from the source — checked by exprId).
  * NOT MATCHED BY SOURCE update/delete clauses route to
  * [[TableLog.mergeWhen]]'s by-source actions (candidate files
  * become ALL files — the clause touches rows absent from the
  * source; the programmatic surface's band scope is the pruned
  * alternative). Candidate files otherwise come from the manifest
  * bounds against the source's key range — an upsert of yesterday's
  * keys touches yesterday's files.
  */
object TableLogMergeRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{
    DeleteAction, InsertAction, MergeIntoTable, UpdateAction}

  private def relationOf(plan: LogicalPlan): Option[DataSourceV2Relation] =
    org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => Some(r)
      case _ => None
    }

  /** Every assignment must be `target.col := <source attr of the
    * same name>` (casts/aliases tolerated), and the set must cover
    * the whole target row.
    */
  private def wholeRow(
      assigns: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment],
      targetCols: Seq[String]): Boolean = {
    val pairs = assigns.flatMap { a =>
      val tgt = a.key match {
        case ar: AttributeReference => Some(ar.name)
        case _ => None
      }
      val srcRefs = a.value.collect { case ar: AttributeReference => ar.name }
      (tgt, srcRefs) match {
        case (Some(t), Seq(s)) if t == s => Some(t)
        case _ => None
      }
    }
    pairs.size == assigns.size && pairs.toSet == targetCols.toSet
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case m @ MergeIntoTable(tgt, src, cond, matched, notMatched, nmbs, _)
        if m.resolved && relationOf(tgt).exists(_.table.isInstanceOf[TableLogTable]) =>
      val t = relationOf(tgt).get.table.asInstanceOf[TableLogTable]
      require(!t.timeTraveled,
        s"TableLog MERGE: cannot merge into time-traveled version ${t.snap.version}")
      def unsupported(what: String): Nothing =
        throw new UnsupportedOperationException(
          s"TableLog MERGE supports exactly ON t.key = s.key WHEN MATCHED " +
            s"THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * — $what. " +
            "Use graft.operators.TableLog.merge for other shapes.")
      val targetCols = t.snap.schema.fieldNames.toSeq
      // one side must come from the TARGET relation and the other
      // from the SOURCE (checked by exprId, not name): ON t.id = t.id
      // is NOT a key equijoin and must fall through to the error, not
      // be silently rewritten into one
      val tgtIds = relationOf(tgt).get.outputSet.map(_.exprId).toSet
      val srcIdSet = src.outputSet.map(_.exprId).toSet
      val key = cond match {
        case ce.EqualTo(a: AttributeReference, b: AttributeReference)
            if a.name == b.name &&
              ((tgtIds.contains(a.exprId) && srcIdSet.contains(b.exprId)) ||
                (srcIdSet.contains(a.exprId) && tgtIds.contains(b.exprId))) =>
          a.name
        case other => unsupported(s"unsupported ON condition $other " +
          "(need a single t.key = s.key equality between target and source)")
      }
      require(!SubqueryExpression.hasSubquery(cond),
        "TableLog MERGE: subqueries in the ON condition are not supported")
      (matched, notMatched) match {
        // fast path: the whole-row upsert maps straight onto
        // TableLog.merge (no per-column CASE machinery)
        case (Seq(UpdateAction(None, uAssigns, _)), Seq(InsertAction(None, iAssigns)))
            if nmbs.isEmpty &&
              wholeRow(uAssigns, targetCols) && wholeRow(iAssigns, targetCols) =>
          TableLogMergeCommand(t.path, src, key, targetCols)
        // general shape: conditional updates/deletes, partial SETs,
        // conditional inserts -> TableLog.mergeWhen. Source-side
        // references translate to the _s_ namespace by exprId.
        case _ =>
          val srcIds = src.outputSet.map(_.exprId).toSet
          def sided(e: Expression): org.apache.spark.sql.Column = {
            require(!SubqueryExpression.hasSubquery(e),
              "TableLog MERGE: subqueries in actions are not supported")
            GraftInterop.column(e.transform {
              case a: AttributeReference if srcIds.contains(a.exprId) =>
                UnresolvedAttribute(Seq(s"_s_${a.name}"))
              case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
            })
          }
          def target(e: Expression): String = e match {
            case ar: AttributeReference => ar.name
            case other => unsupported(s"unsupported assignment target $other")
          }
          val m = matched.map {
            case UpdateAction(c, assigns, _) =>
              TableLog.MergeWhen.Update(c.map(sided),
                assigns.map(a => target(a.key) -> sided(a.value)))
            case DeleteAction(c) => TableLog.MergeWhen.Delete(c.map(sided))
            case other => unsupported(s"unsupported WHEN MATCHED $other")
          }
          val nm = notMatched.map {
            case InsertAction(c, assigns) =>
              TableLog.MergeWhen.Insert(c.map(sided),
                assigns.map(a => target(a.key) -> sided(a.value)))
            case other => unsupported(s"unsupported WHEN NOT MATCHED $other")
          }
          // NOT MATCHED BY SOURCE: target rows with no source match
          // (the analyzer already refuses source references in these
          // clauses, so sided() only ever sees target columns here)
          val nmbsActs = nmbs.map {
            case UpdateAction(c, assigns, _) =>
              TableLog.MergeWhen.Update(c.map(sided),
                assigns.map(a => target(a.key) -> sided(a.value)))
            case DeleteAction(c) => TableLog.MergeWhen.Delete(c.map(sided))
            case other =>
              unsupported(s"unsupported WHEN NOT MATCHED BY SOURCE $other")
          }
          TableLogMergeWhenCommand(t.path, src, key, m, nm, nmbsActs)
      }
  }
}

/** Driver-side execution of the general-shape MERGE. */
case class TableLogMergeWhenCommand(
    path: String,
    source: LogicalPlan,
    key: String,
    matched: Seq[TableLog.MergeWhen],
    notMatched: Seq[TableLog.MergeWhen.Insert],
    notMatchedBySource: Seq[TableLog.MergeWhen] = Nil)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    TableLog.mergeWhen(spark, path, GraftInterop.ofRows(spark, source), key,
      matched, notMatched, notMatchedBySource)
    Seq.empty
  }
}

/** Driver-side execution of the rewritten MERGE: the analyzed source
  * plan re-enters the DataFrame API, projected to the target's
  * columns by name (cast to the target's types), then the
  * manifest-driven [[TableLog.merge]] commits the upsert.
  */
case class TableLogMergeCommand(
    path: String,
    source: LogicalPlan,
    key: String,
    targetCols: Seq[String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val snap = TableLog.snapshot(spark, path)
    val srcDf = GraftInterop.ofRows(spark, source).select(
      targetCols.map(c => org.apache.spark.sql.functions.col(c)
        .cast(snap.schema(snap.schema.fieldIndex(c)).dataType).as(c)): _*)
    TableLog.merge(spark, path, srcDf, key)
    Seq.empty
  }
}
