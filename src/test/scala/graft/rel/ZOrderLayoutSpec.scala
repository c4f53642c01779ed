package graft.rel

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the PAYOFF q_layout_zorder claims, not just its arithmetic:
  * after writing files in z-value range order, each file's footer min/max
  * covers a small rectangle of the (x, y) space, so a reader pruning on
  * footer stats skips most files for a predicate on EITHER dimension —
  * while a linear (x-then-y) layout clusters only x and must read every
  * file for a y predicate.  Mirrors PlanGuardSpec's partition-pruning
  * test, one level down: partition dirs there, parquet footer stats here.
  *
  * Two assertions per layout: (a) reader-agnostic — per-file bounding
  * boxes (computed via input_file_name, exactly the min/max a parquet
  * footer stores) overlap the probe value in few files; (b) engine-real —
  * Spark's parquet scan emits only the rows of non-skipped row groups, so
  * the scan's numOutputRows metric drops under half the table when the
  * pushed x-filter hits a z-ordered layout.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val NFiles = 16
  private val Probe = 100L // mid-range x/y probe value

  private lazy val paths: (String, String) = {
    val tag = TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    // x/y must cover the full 8-bit range at EVERY SF (l_suppkey spans only
    // ~10 values at sf0.001): orderkey and price cents are uniform mod 256
    val base = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select((col("l_orderkey") % 256).as("x"),
        (round(col("l_extendedprice") * 100).cast("long") % 256).as("y"))
      .withColumn("z", Relational7.zInterleave(col("x"), col("y"), 8))
    // Deterministic, tile-aligned binning: 16 z-files of 4096 consecutive
    // z codes = one 64x64 (x, y) tile each.  (repartitionByRange would
    // express the same layout but its sampled boundaries straddle tiles,
    // making per-file bounding boxes run-dependent.)
    val zPath = s"/tmp/graft_zorder_z_$tag"
    base.withColumn("zfile", expr(s"z div ${65536 / NFiles}"))
      .repartition(NFiles, col("zfile")).sortWithinPartitions("z")
      .write.mode("overwrite").partitionBy("zfile").parquet(zPath)
    // linear contrast: 16 x-strips — clusters x, leaves y unbounded
    val linPath = s"/tmp/graft_zorder_lin_$tag"
    base.withColumn("xfile", expr(s"x div ${256 / NFiles}"))
      .repartition(NFiles, col("xfile")).sortWithinPartitions("x", "y")
      .write.mode("overwrite").partitionBy("xfile").parquet(linPath)
    (zPath, linPath)
  }

  /** (files whose [min,max] of `dim` contains the probe, total files). */
  private def overlap(path: String, dim: String): (Int, Int) = {
    val boxes = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(dim)).as("mn"), max(col(dim)).as("mx"))
      .collect()
    (boxes.count(r => r.getLong(1) <= Probe && Probe <= r.getLong(2)), boxes.length)
  }

  test("z-ordered files bound BOTH dimensions; linear layout fails on y") {
    val (zPath, linPath) = paths
    val (zx, zn) = overlap(zPath, "x")
    val (zy, _) = overlap(zPath, "y")
    assert(zn >= NFiles / 2, s"expected ~$NFiles files, got $zn")
    assert(zx <= zn / 2, s"z layout: x probe overlaps $zx of $zn files — no pruning")
    assert(zy <= zn / 2, s"z layout: y probe overlaps $zy of $zn files — no pruning")
    val (lx, ln) = overlap(linPath, "x")
    val (ly, _) = overlap(linPath, "y")
    assert(lx <= ln / 2, s"linear layout should still prune on its sort key x, got $lx/$ln")
    assert(ly >= (ln * 9) / 10,
      s"linear layout unexpectedly pruned on y ($ly of $ln) — probe not discriminating")
  }

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val scans = unwrap(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec found")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("Spark's parquet reader actually skips row groups on the z layout") {
    val (zPath, _) = paths
    val total = spark.read.parquet(zPath).count()
    val read = scanOutputRows(
      spark.read.parquet(zPath).filter(col("x") === Probe))
    assert(read < total / 2,
      s"scan emitted $read of $total rows — footer stats not skipping")
    assert(read > 0, "probe value absent from data — test is vacuous")
  }
}
