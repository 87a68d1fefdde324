package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression conversion (the
  * supported classic-mode helpers are sql-package-private in Spark 4).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst expression tree
    * (function calls become `UnresolvedFunction`s the analyzer resolves).
    * `expression` wraps lazily in a `ColumnNodeExpression`, which only the
    * DataFrame construction path converts — an expression returned from an
    * injected SQL FunctionBuilder must already be a plain Catalyst tree.
    */
  def convertedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** A serializable thunk yielding the Hadoop configuration on executors
    * (`org.apache.spark.util.SerializableConfiguration` is spark-package-
    * private, so it cannot appear in a graft-visible signature).
    */
  def serializableConfThunk(
      conf: org.apache.hadoop.conf.Configuration)
      : () => org.apache.hadoop.conf.Configuration = {
    val sc = new org.apache.spark.util.SerializableConfiguration(conf)
    () => sc.value
  }

  /** `spark.sql.files.maxPartitionBytes` as a Long (the typed SQLConf
    * accessor is sql-package-private).
    */
  def filesMaxPartitionBytes(spark: SparkSession): Long =
    spark.sessionState.conf.filesMaxPartitionBytes

  /** Re-wrap a batch DataFrame's physical rows as a STREAMING DataFrame —
    * what a v1 streaming `Source.getBatch` must return (MicroBatchExecution
    * asserts `isStreaming`; the classic `internalCreateDataFrame` that sets
    * the flag is sql-package-private, same pattern as FileStreamSource).
    */
  def asStreamingDataFrame(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)

  /** The inverse, for v1 `Sink.addBatch`: the engine hands a
    * streaming-flagged frame whose plan IS the executable micro-batch;
    * re-wrap it as a batch frame so batch writers accept it (the
    * ForeachBatchSink pattern).
    */
  def asBatchDataFrame(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = false)

  /** Inspect a `Source.getBatch` result OUTSIDE a running micro-batch:
    * re-flag the underlying row RDD as a batch frame without executing
    * the streaming plan first (`asBatchDataFrame` calls `toRdd`, which
    * batch execution refuses on an `isStreaming` plan).
    */
  def stripStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val rdd = df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.asInstanceOf[org.apache.spark.rdd.RDD[
          org.apache.spark.sql.catalyst.InternalRow]]
    }.getOrElse(throw new IllegalArgumentException(
      s"not a Source.getBatch frame: ${df.queryExecution.analyzed.nodeName}"))
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, df.schema, isStreaming = false)
  }
}
