package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Thin bridge into the `private[sql]` classic APIs that a whole-operator
  * extension needs: wrapping a custom [[LogicalPlan]] node back into a
  * DataFrame and unwrapping a [[Column]] to its Catalyst [[Expression]].
  * This is the standard pattern for libraries that inject custom plans
  * (the injection points themselves — `SparkSessionExtensions` — are
  * public, but plan construction helpers are package-private). Kept to
  * exactly these two calls; everything else in graft uses public APIs.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eagerly convert a Column to its Catalyst expression with the
    * session-bound converter (the static `ExpressionUtils.expression`
    * wraps lazily in a `ColumnNodeExpression`, which never resolves
    * inside a hand-built logical node and is not task-serializable).
    */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Inverse of [[expression]]: wrap a Catalyst expression into a Column.
    * Needed for built-in expressions Spark ships but does not register in
    * the SQL function registry (e.g. the bloom-filter aggregate pair that
    * powers runtime filtering).
    */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
