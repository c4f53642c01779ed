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
}
