package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's sql-private Column <-> catalyst Expression
  * conversions, needed to expose custom Catalyst expressions
  * (graft.functions.NativeExpressions) as user-facing Columns. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-wrap a V1 streaming Sink's per-batch frame as a BATCH
    * DataFrame — the same move Spark's own ForeachBatchSink makes:
    * plan the incremental execution once (`toRdd`) and wrap the
    * resulting rows with `isStreaming = false`, so batch-only
    * machinery (Dataset.observe — the ChronoDB sidecar piggyback —
    * rejects streaming plans) applies and the original streaming plan
    * is consumed by exactly one action. */
  def asBatch(data: Dataset[Row]): DataFrame = {
    val spark = data.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }

  /** The inverse of [[asBatch]]: wrap a COMPUTED batch frame as a
    * streaming DataFrame for a V1 Source's getBatch (MicroBatchExecution
    * asserts `isStreaming` on the returned frame). The plan stays lazy
    * (`toRdd`), so a task retry recomputes from the same immutable
    * inputs. */
  def asStreaming(data: Dataset[Row]): DataFrame = {
    val spark = data.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = true)
  }

  /** DataFrame over an already-built logical plan (sql-private
    * Dataset.ofRows) — the V1 streaming Source's getBatch needs to hand
    * the engine a LogicalRelation it constructed itself. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
