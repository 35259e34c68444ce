package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4.x backs `Column` by a `ColumnNode` (Connect unification), so the
  * pre-4.0 `new Column(expr)` / `col.expr` surface is gone from user code.
  * The supported conversion lives in `org.apache.spark.sql.classic` with
  * `private[sql]` visibility; this object re-exports it for graft's custom
  * expressions. No Spark internals are modified.
  */
object GraftInterop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column -> catalyst conversion. `expression` wraps the
    * ColumnNode lazily (`ColumnNodeExpression`, Unevaluable) and
    * relies on the classic Dataset API to convert during plan
    * building; an expression returned from an injected SQL FUNCTION
    * never passes through that path, so it must be converted up
    * front (to UnresolvedFunction/ExtractValue trees the analyzer
    * then resolves normally). No Spark internals modified.
    */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over an already-analyzed logical plan — what a
    * rewritten SQL command needs to hand its embedded source query
    * back to the DataFrame API. No Spark internals modified.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `isStreaming = true` frame over an InternalRow RDD — what a
    * DataSource-v1 streaming `Source.getBatch` must return
    * (MicroBatchExecution asserts the flag; FileStreamSource uses the
    * same `private[sql]` constructor). No Spark internals modified.
    */
  def streamingFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
