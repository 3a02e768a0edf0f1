package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` seam a v1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * needs: re-wrapping a batch plan's internal-row RDD with
  * `isStreaming = true` so MicroBatchExecution accepts it as a
  * micro-batch (Spark's own FileStreamSource does exactly this via
  * `SparkSession.internalCreateDataFrame`). Lives under
  * `org.apache.spark.sql` solely for that access; no other Spark
  * internals are touched.
  */
object StreamingFrame {

  /** `df`'s rows as a streaming-tagged DataFrame with `schema`
    * (field order must match `df`'s plan output).
    */
  def create(df: DataFrame, schema: StructType): DataFrame = {
    val classic = castToImpl(df)
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** The inverse for a v1 SINK: re-wrap a micro-batch's incremental
    * plan as a plain BATCH frame so the sink can run ordinary
    * DataFrame ops on it (Spark's own ForeachBatchSink conversion —
    * acting on the incoming frame directly would re-trigger the
    * incremental execution per action).
    */
  def batch(df: DataFrame): DataFrame = {
    val classic = castToImpl(df)
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      classic.queryExecution.toRdd, classic, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(classic.sparkSession, node)
  }
}
