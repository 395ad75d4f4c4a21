package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Bridge to two `private[sql]` seams every Spark connector needs (Delta
  * Lake and Iceberg ship the same shim): Catalyst `Expression` ⇄ public
  * `Column` (Spark 4 moved Column onto ColumnNode, so there is no public
  * constructor) and `LogicalPlan` → `DataFrame` (to hand a resolved MERGE
  * source subtree back to the public API). This file lives under
  * `org.apache.spark.sql` ONLY to satisfy the access qualifier; it
  * contains no Spark code. */
object Shims {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
