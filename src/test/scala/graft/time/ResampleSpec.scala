package graft.time

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for resample + gap-fill beyond the SQL oracle: a hand-computed
  * fixture pins the fill semantics, and structural invariants hold on
  * the real events (dense grid, observed rows pass through, interp
  * bounded by its neighbors). */
class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L

  /** user 1: observations at hours 0 (v=100) and 4 (v=500); the gap
    * hours 1-3 LOCF to 100 and interpolate linearly. */
  private def fixture() = Seq(
    (1L, 0L * H + 7L, 1.00),
    (1L, 4L * H + 11L, 5.00))
    .toDF("user_id", "ts_us", "value")

  test("LOCF and linear interpolation on a pinned fixture") {
    val locf = Resample.locfOnTs(fixture())
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(locf == Seq(
      (1L, 0L, 100L), (1L, H, 100L), (1L, 2 * H, 100L),
      (1L, 3 * H, 100L), (1L, 4 * H, 500L)))
    val interp = Resample.interpOnTs(fixture())
      .as[(Long, Long, Double)].collect().sortBy(_._2).toSeq
    assert(interp == Seq(
      (1L, 0L, 100.0), (1L, H, 200.0), (1L, 2 * H, 300.0),
      (1L, 3 * H, 400.0), (1L, 4 * H, 500.0)))
  }

  test("real events: dense per-key grid, observed rows pass through") {
    val ev = graft.io.Tables.eventsUs(spark, TestSpark.sf)
    val out = Resample.interpOnTs(ev).cache()
    // dense: per user, row count == span in hours + 1, no null fills
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        ((max("bucket_us") - min("bucket_us")) / H + 1).as("want"))
      .filter(col("n") =!= col("want")).count()
    assert(spans == 0, "grid must be dense per key")
    assert(out.filter(col("v_interp").isNull).count() == 0)
    // every observed bucket surfaces its own exact value
    val obs = ev.select(col("user_id"),
        ((col("ts_us") / H).cast("long") * H).as("bucket_us"),
        round(col("value") * 100).cast("long").as("sv"))
      .groupBy("user_id", "bucket_us").agg(sum("sv").as("v"))
    val mismatched = obs.join(out, Seq("user_id", "bucket_us"))
      .filter(col("v_interp") =!= col("v").cast("double")).count()
    assert(mismatched == 0)
    out.unpersist()
  }
}
