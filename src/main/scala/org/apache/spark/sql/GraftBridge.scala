package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into sql-private constructors for extension expressions — the
  * standard pattern for libraries contributing native Catalyst expressions
  * (Column ↔ Expression conversion is `private[sql]` in Spark 4). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.DataFrame].queryExecution.analyzed

  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Drain the listener bus: `Observation` metrics of a just-completed
    * action are delivered asynchronously, so a non-blocking `getOrEmpty`
    * right after the action can race the delivery. Draining makes the
    * common path deterministic (callers still keep a count fallback —
    * never block a query on an instrument). Best-effort by contract. */
  def drainListenerBus(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(30000L)
    catch { case _: Throwable => () }

  /** Non-blocking read of an [[Observation]]'s metrics (`getOrEmpty` is
    * sql-private; `get` blocks unboundedly, which an instrument must not). */
  def observedOrEmpty(obs: Observation): Map[String, Any] = obs.getOrEmpty
}
