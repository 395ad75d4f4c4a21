package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** Bridge for producing streaming-tagged DataFrames — a V1
  * `Source.getBatch` must return a plan with `isStreaming=true` or
  * `MicroBatchExecution` rejects it, and `internalCreateDataFrame` is
  * `private[sql]` (same shim pattern as [[ColumnShim]]). */
object StreamShim {

  /** Re-wrap a finished batch plan as a streaming DataFrame. Physical
    * planning of `df` happens here (driver-side, per micro-batch); the
    * resulting RDD is still lazy. */
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** Inverse: re-wrap a sink's per-batch streaming DataFrame as a batch one
    * so ordinary writers accept it (the `ForeachBatchSink` trick). */
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
