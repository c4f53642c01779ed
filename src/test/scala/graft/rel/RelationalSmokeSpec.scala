package graft.rel

import graft.{Queries, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every judged query plans and executes at sf0.001 (row counts are
  * the DuckDB oracle's job — see tools/check_oracle.py).  Also asserts
  * structural invariants Catalyst could silently break.
  */
class RelationalSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every declared oracle key has a query") {
    assert(Queries.oracleSql.keySet.subsetOf(Queries.queries.keySet))
  }

  test("driver entry point returns rows (smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Queries.all) {
    test(s"${q.name} executes") {
      val n = q.fn(spark, TestSpark.sf).count()
      // embedding near-dup may legitimately be tiny, everything else is not
      if (q.name != "q_llm_dedup_embed") assert(n > 0, s"${q.name} empty")
      else assert(n >= 0)
    }
  }

  test("rollup grand total equals ungrouped count") {
    import org.apache.spark.sql.functions._
    val out = Queries.queries("q_agg_rollup")(spark, TestSpark.sf)
    val grand = out.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .select("n").head().getLong(0)
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet").count()
    assert(grand == li)
  }

  test("band join plan contains no cartesian/BNLJ node") {
    val plan = Queries.queries("q_join_band")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "band join degenerated to cartesian")
    assert(!plan.contains("BroadcastNestedLoop"), "band join degenerated to BNLJ")
  }

  test("theta inequality join plan contains no cartesian/BNLJ node") {
    val plan = Queries.queries("q_join_theta_ineq")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("filter pushdown reaches the parquet scan") {
    val plan = Queries.queries("q_filter_pred")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)].*", "$1").nonEmpty)
  }

  test("one-pass HLL profile within 2% of exact distincts at sf0.1") {
    // q_profile_columns_fast is the single-scan ANALYZE; its sketch
    // estimates must track the exact per-column profile it approximates,
    // and the non-approximate fields must agree exactly
    def byCol(name: String) =
      Queries.queries(name)(spark, TestSpark.sf01).collect()
        .map(r => r.getString(0) -> r).toMap
    val exact = byCol("q_profile_columns")
    val fast = byCol("q_profile_columns_fast")
    assert(exact.keySet == fast.keySet)
    for (c <- exact.keySet) {
      val (e, f) = (exact(c), fast(c))
      val (nd, nda) = (e.getLong(2), f.getLong(2))
      assert(math.abs(nda - nd).toDouble / nd <= 0.02,
        s"$c: approx distinct $nda vs exact $nd drifts > 2%")
      assert(f.getLong(1) == e.getLong(1), s"$c: null counts must be exact")
      assert(f.get(3) == e.get(3) && f.get(4) == e.get(4) &&
        f.get(5) == e.get(5) && f.get(6) == e.get(6), s"$c: min/max must be exact")
    }
  }
}
