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
}
