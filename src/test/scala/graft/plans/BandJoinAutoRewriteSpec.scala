package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-rewrite must (a) remove the nested-loop/cartesian plan for a
  * naive band join, and (b) preserve results exactly. */
class BandJoinAutoRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinAutoRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == BandJoinAutoRewrite)
  }

  private lazy val a = {
    val r = new scala.util.Random(21)
    (1 to 300).map(i => (i.toLong, r.nextDouble() * 500)).toDF("ida", "va")
  }
  private lazy val b = {
    val r = new scala.util.Random(22)
    (1 to 300).map(i => (i.toLong, r.nextDouble() * 500)).toDF("idb", "vb")
  }

  test("naive band join is rewritten to an equi join on buckets") {
    val naive = a.join(b, abs($"va" - $"vb") <= 10.0)
    val before = naive.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoop") || before.contains("CartesianProduct"))
    withRule {
      val rewritten = a.join(b, abs($"va" - $"vb") <= 10.0)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$plan")
    }
  }

  test("rewritten band join returns exactly the naive rows") {
    val expected = a.join(b, abs($"va" - $"vb") <= 10.0)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = withRule {
      a.join(b, abs($"va" - $"vb") <= 10.0)
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("joins with an existing equi key are left alone") {
    withRule {
      val plan = a.join(b, $"ida" === $"idb" && abs($"va" - $"vb") <= 10.0)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_gb"))
    }
  }

  test("strict and reversed-literal band forms are also rewritten") {
    withRule {
      val p1 = a.join(b, abs($"va" - $"vb") < 10.0)
        .queryExecution.executedPlan.toString
      assert(!p1.contains("BroadcastNestedLoop") && !p1.contains("CartesianProduct"))
      val p2 = a.join(b, lit(10.0) >= abs($"va" - $"vb"))
        .queryExecution.executedPlan.toString
      assert(!p2.contains("BroadcastNestedLoop") && !p2.contains("CartesianProduct"))
    }
  }
}
