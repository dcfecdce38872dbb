package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The `private[sql]` surfaces this library needs: turning a rewritten
  * LogicalPlan back into a DataFrame (`Dataset.ofRows`) for
  * [[graft.plans.AggRewrite.navigate]]'s explicit-rewrite route, and
  * the Column <-> Expression bridge (`classic.ExpressionUtils`) so the
  * scalar merge kernels build Columns DIRECTLY instead of mutating the
  * session's function registry as a side effect. The standard
  * extension-package shim — the same access route public Spark
  * extensions (Delta's `org.apache.spark.sql.delta`, etc.) use. Kept to
  * three one-line delegates in one file so the library's dependence on
  * non-public API stays auditable; the session-wide deployment route
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) does not touch
  * this shim at all.
  */
object PlanDF {
  def ofRows(s: SparkSession, p: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], p)

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
