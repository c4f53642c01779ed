package graft.rel

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental constraint suite must reproduce the full recompute's
  * verdict exactly, on a split where BOTH day slices genuinely contain
  * violations (so count-merging and key-table merging are exercised, not
  * just zero-plus-zero). */
class IncrConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def collect(name: String) =
    Queries.queries(name)(spark, TestSpark.sf)
      .select("cname", "n_violations", "satisfied")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq

  test("incremental verdict equals the full recompute") {
    val full = collect("q_quality_constraints")
    val incr = collect("q_quality_constraints_incr")
    assert(incr == full)
    // the planted bound violation survives the merge with a nonzero count
    val planted = incr.find(_._1 == "bound_l_quantity_le30").get
    assert(planted._2 > 0 && !planted._3)
  }

  test("the planted violation occurs in BOTH day slices (merge is real)") {
    val li = graft.io.Tables.lineitem(spark, TestSpark.sf)
    val day2 = pmod(col("l_orderkey"), lit(5L)) === 0L
    val v1 = li.filter(!day2 && col("l_quantity") > 30).count()
    val v2 = li.filter(day2 && col("l_quantity") > 30).count()
    assert(v1 > 0 && v2 > 0, s"violations split day1=$v1 day2=$v2")
  }
}
