package graft.rel

import graft.TestSpark
import graft.fns.Exact
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability: `Dataset.observe` attaches data-quality
  * counters to a plan and collects them DURING execution — at 100 TB the
  * difference between "metrics for free on the one pass you already run"
  * and doubling the job count with audit queries.  The metrics ride the
  * exact same exactness rules as the oracle queries (scaled-integer sums,
  * no float accumulation).
  */
class ObservationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("observe collects row/null/sum metrics on the same pass as the sink") {
    val li = graft.io.Tables.lineitem(spark, TestSpark.sf)
    val obs = new Observation("lineitem_audit")
    val out = li
      .observe(obs,
        count(lit(1)).as("rows_in"),
        count(when(col("l_returnflag").isNull, 1)).as("null_flags"),
        sum(Exact.scaled(col("l_quantity"), 2)).as("qty_centi"))
      .filter(col("l_returnflag") === "R")
    val kept = out.count()

    val m = obs.get
    val total = li.count()
    assert(m("rows_in") == total, "observe must see pre-filter rows")
    assert(m("null_flags") == 0L)
    // the metric equals the exact scaled sum computed by a plain aggregate
    val expect = li.agg(sum(Exact.scaled(col("l_quantity"), 2))).head().getLong(0)
    assert(m("qty_centi") == expect)
    assert(kept > 0 && kept < total)
  }
}
