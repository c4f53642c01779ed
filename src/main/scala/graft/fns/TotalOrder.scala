package graft.fns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed computations over a TOTAL ORDER without the
  * single-partition window Spark plans for `Window.orderBy(...)` with no
  * partition key (an `Exchange SinglePartition` — the one-machine
  * bottleneck that breaks first on a 100 TB sort-dependent pipeline).
  *
  * Shape: range-repartition by the order columns (Spark's distributed
  * sort), compute the per-partition running aggregate with a window
  * PARTITIONED by partition id, then add back each partition's exact
  * prefix offset.  RangePartitioning guarantees partition p's keys all
  * precede partition p+1's, so local result + offset IS the global
  * result.  The offsets are O(partitions) driver rows — never O(rows).
  *
  * `ord` must be a total order (append a unique id); the input is
  * materialized once (`localCheckpoint`) so the offsets probe and the
  * ranked read share one computation.
  */
object TotalOrder {

  /** Partition count for the distributed sort, taken from the session's
    * `spark.sql.shuffle.partitions` — the knob a cluster operator already
    * sizes to the data.  A hardcoded constant here would silently
    * under-partition a 1000-executor job down to one wave of 32 tasks. */
  def defaultParts(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** Adds `rn`: the 1-based global rank by `ord`. */
  def globalRank(df: DataFrame, numParts: Int, ord: Column*): DataFrame = {
    val (parts, offCol) = withOffsets(df, numParts, count(lit(1)), ord: _*)
    val w = Window.partitionBy(col("__to_pid")).orderBy(ord: _*)
    parts.withColumn("rn", row_number().over(w).cast(LongType) + offCol)
      .drop("__to_pid", "__to_off")
  }

  /** Adds `cum`: the INCLUSIVE global running sum of `valueCol` by `ord`
    * (nulls contribute nothing, as with any Spark sum). */
  def runningSum(df: DataFrame, valueCol: String, numParts: Int, ord: Column*): DataFrame = {
    // the offsets probe casts its per-partition aggregate to Long; on a
    // fractional valueCol that would silently truncate the cross-partition
    // offsets while the within-partition window sum stayed exact — fail
    // fast instead (mirrors ExactQuantiles' LongType guard)
    require(df.schema(valueCol).dataType == LongType,
      s"runningSum requires a LongType valueCol; '$valueCol' is ${df.schema(valueCol).dataType}")
    val (parts, offCol) = withOffsets(df, numParts, sum(col(valueCol)), ord: _*)
    val w = Window.partitionBy(col("__to_pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.withColumn("cum", sum(col(valueCol)).over(w) + offCol)
      .drop("__to_pid", "__to_off")
  }

  /** Range-repartition + pin, then the exact prefix offset of each
    * partition under `perPartition` (a LongType aggregate). */
  private def withOffsets(df: DataFrame, numParts: Int, perPartition: Column,
      ord: Column*): (DataFrame, Column) = {
    val parts = df.repartitionByRange(numParts, ord: _*)
      .withColumn("__to_pid", spark_partition_id())
      .localCheckpoint()
    val totals = parts.groupBy("__to_pid").agg(perPartition.cast(LongType).as("__to_t"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val offsets = (0 until numParts).scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
    // Attach each row's prefix offset via a BROADCAST join against the
    // O(numParts) offsets frame.  The previous shape — a foldLeft of
    // `when(pid === p, …)` branches — built an O(numParts)-deep expression
    // tree: free at 32 partitions, but at a 100 TB-realistic 10 k it risks
    // codegen method-size blowup and interpreted fallback.  A broadcast
    // hash join is O(1) per row regardless of partition count and stays
    // inside whole-stage codegen.
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = (0 until numParts).map(p => (p, offsets(p))).toDF("__to_pid", "__to_off")
    (parts.join(broadcast(offDf), Seq("__to_pid")), col("__to_off"))
  }
}
