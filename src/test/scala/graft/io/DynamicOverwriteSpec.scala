package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental re-materialization: with partitionOverwriteMode=dynamic,
  * overwriting a partitioned table replaces ONLY the partitions present in
  * the written batch — the daily-recompute pattern at 100 TB, where static
  * overwrite would delete every other day's output.
  */
class DynamicOverwriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dynamic partition overwrite replaces only the written partitions") {
    val path = "/tmp/graft_dyn_overwrite"
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))

    // full build: all three l_returnflag partitions
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    val before = spark.read.parquet(path)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before.keySet == Set("A", "N", "R"))

    // incremental rebuild of ONLY the 'R' partition, halved
    val patch = li.filter(col("l_returnflag") === "R").limit(before("R").toInt / 2)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try patch.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    val after = spark.read.parquet(path)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("A") == before("A") && after("N") == before("N"),
      s"untouched partitions must survive: $before -> $after")
    assert(after("R") == before("R") / 2, s"rewritten partition wrong: $after")
  }
}
