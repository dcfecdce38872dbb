package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` surface this library needs: turning a rewritten
  * LogicalPlan back into a DataFrame (`Dataset.ofRows`) for
  * [[graft.plans.AggRewrite.navigate]]'s explicit-rewrite route. The
  * standard extension-package shim — the same access route public Spark
  * extensions (Delta's `org.apache.spark.sql.delta`, etc.) use. Kept to
  * one method in one file so the library's dependence on non-public API
  * stays auditable; the session-wide deployment route
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) does not touch
  * this shim at all.
  */
object PlanDF {
  def ofRows(s: SparkSession, p: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], p)
}
