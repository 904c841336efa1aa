package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin private[sql] bridge: lets graft wrap its native Catalyst
  * expressions (graft.plans) into Columns without depending on a
  * session-level function registry, and registers the SQL names on a
  * live session (the SparkSessionExtensions path only applies at session
  * construction). Lives under org.apache.spark.sql to reach the
  * package-private classic converters. */
object Bridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for building custom logical
    * nodes over resolved children — graft.plans.AsOf). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame. */
  def dataFrame(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until the listener bus has delivered every queued event —
    * lets Bench read its task-metrics accumulators race-free right
    * after a query's action returns (events are delivered async;
    * `listenerBus` is private[spark], hence the bridge). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register graft's SQL functions on an already-built session (e.g.
    * `SELECT graft_polyhash(text) FROM docs`) — the same function list
    * the extensions path injects, so the registries cannot drift. */
  def registerGraftFunctions(spark: SparkSession): Unit =
    graft.plans.GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
