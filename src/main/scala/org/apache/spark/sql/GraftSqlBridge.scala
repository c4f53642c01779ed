package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Bridge into the `org.apache.spark.sql` package namespace: building a
  * DataFrame from a custom LogicalPlan requires the package-private
  * `Dataset.ofRows`.  This is the standard extension-library technique —
  * no Spark internals are modified, we only re-export one constructor.
  */
/** Spillable append-only UnsafeRow buffer for custom physical operators —
  * re-exports the package-private
  * `execution.ExternalAppendOnlyUnsafeRowArray` (the buffer WindowExec /
  * SortMergeJoin / CartesianProduct use): rows are held in memory up to
  * `inMemRows`, then handed to an UnsafeExternalSorter that spills to disk
  * past `spillRows`/`spillBytes` — so a custom operator's per-partition
  * buffer degrades to disk instead of OOM.  MUST be constructed inside a
  * task (the underlying array grabs `TaskContext.get` for spill
  * accounting); `iterator` may be called repeatedly (each call replays
  * from memory or the spill files). */
final class SpillableRowBuffer(inMemRows: Int, spillRows: Int, spillBytes: Long) {
  private val arr = new execution.ExternalAppendOnlyUnsafeRowArray(
    inMemRows, spillBytes, spillRows, spillBytes)
  def add(r: org.apache.spark.sql.catalyst.expressions.UnsafeRow): Unit = arr.add(r)
  def isEmpty: Boolean = arr.isEmpty
  def length: Int = arr.length
  def iterator: Iterator[org.apache.spark.sql.catalyst.expressions.UnsafeRow] =
    arr.generateIterator()
}

object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** A batch DataFrame re-tagged as a one-batch STREAMING relation —
    * what a V1 streaming `Source.getBatch` must return
    * (MicroBatchExecution asserts `isStreaming`); the rows still come
    * from the batch plan, evaluated once per micro-batch.  This is the
    * FileStreamSource technique, re-exported. */
  def asStreaming(df: org.apache.spark.sql.DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = true))
  }

  /** The inverse of [[asStreaming]]: a V1 `Sink.addBatch` DataFrame
    * (whose plan is still marked streaming, so `.write`/batch actions
    * refuse) re-tagged as a plain BATCH relation over the same
    * micro-batch rows — the KafkaSink/FileStreamSink technique of
    * consuming `queryExecution.toRdd`, packaged as a DataFrame so the
    * whole batch commit surface applies unchanged.  The RDD recomputes
    * deterministically within the batch (the sources are immutable
    * offsets), so multi-action consumers (MERGE discovery + write) are
    * safe. */
  def asBatch(df: org.apache.spark.sql.DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = false))
  }

  /** Column over a raw Catalyst expression (and back) — needed to use a
    * custom TypedImperativeAggregate through the DataFrame API. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
