package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 hides the direct
  * constructors behind `private[sql]` (`classic.ExpressionUtils`), so
  * this one-file shim lives under the org.apache.spark.sql namespace to
  * expose them to graft's native expressions — the supported extension
  * alternative (SparkSessionExtensions + SQL parsing) is heavyweight
  * for two scalar kernels.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built logical plan (`Dataset.ofRows` is
    * `private[sql]`) — the entry point for custom logical operators.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The session's name resolver (honors spark.sql.caseSensitive). */
  def resolver(spark: org.apache.spark.sql.SparkSession): (String, String) => Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.analyzer.resolver

  /** True if the session planner already carries `strategy` — from any
    * source (SparkSessionExtensions injection or experimental methods).
    */
  def plannerHasStrategy(
      spark: org.apache.spark.sql.SparkSession, strategy: AnyRef): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.planner.strategies.exists(_ eq strategy)

  /** Register a function builder on an existing session's registry
    * (sessionState is also `private[sql]`); the SparkSessionExtensions
    * path (`graft.functions.GraftExtensions`) is the config-time
    * equivalent for new sessions.
    */
  def registerTempFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
