package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the standard pattern for extension libraries that define custom
  * Catalyst expressions and expose them as `Column`s without going
  * through a per-session FunctionRegistry.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — the construction path for custom logical
    * operators planned by an injected `SparkStrategy`.
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (child-plan input for
    * custom logical operators).
    */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Drop the block-manager blocks behind a `localCheckpoint()`ed
    * DataFrame (`LogicalRDD.rdd` is the persisted internal RDD;
    * `df.rdd` would wrap it in a fresh conversion RDD whose unpersist
    * is a no-op). After this the DataFrame is UNRECOMPUTABLE — only
    * call once nothing downstream will read it again. Iterative
    * algorithms need it: each round's checkpoint otherwise stays
    * cached for the session's lifetime.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ =>
    }
  /** Idempotently add an extra planner strategy to a live session.
    * Synchronized: `extraStrategies` is a plain var, so a concurrent
    * check-then-append from two threads could lose one strategy.
    */
  def addStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(s)) exp.extraStrategies = exp.extraStrategies :+ s
    }
  }

  /** Idempotently add an extra optimizer rule to a live session (same
    * check-then-append hazard as [[addStrategy]]).
    */
  def addOptimization(spark: SparkSession,
                      r: org.apache.spark.sql.catalyst.rules.Rule[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraOptimizations.contains(r)) exp.extraOptimizations = exp.extraOptimizations :+ r
    }
  }
}
