package graft.plans

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The documented install path — `spark.sql.extensions=
  * graft.plans.GraftExtensions` — must wire the optimizer rules into a
  * session with NO manual `experimental.*` calls: a user pointing a stock
  * session at the class gets the scalable plans. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions class installs both auto-rewrite rules in a fresh session") {
    TestSpark.spark // ensure the shared context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is a STATIC conf — unreadable over an already
      // running context — so exercise the same class through
      // builder.withExtensions (the code path the conf resolves to)
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(!(s2 eq TestSpark.spark), "expected a NEW session over the shared context")
      import s2.implicits._
      val a = (1 to 50).map(i => (i.toLong, i * 7.0 % 500)).toDF("ida", "va")
      val b = (1 to 50).map(i => (100L + i, i * 13.0 % 500)).toDF("idb", "vb")
      // band rule: no manual experimental.extraOptimizations
      val bandPlan = a.join(b, abs($"va" - $"vb") <= 10.0)
        .queryExecution.executedPlan.toString
      assert(!bandPlan.contains("BroadcastNestedLoop") && !bandPlan.contains("CartesianProduct"),
        s"band rule not injected:\n$bandPlan")
      // interval rule (conf-gated)
      s2.conf.set(IntervalOverlapAutoRewrite.WidthConf, "1024")
      val ia = (1 to 50).map(i => (i.toLong, i * 31L % 5000, i * 31L % 5000 + 100L))
        .toDF("ia", "sa", "ea")
      val ib = (1 to 50).map(i => (i.toLong, i * 17L % 5000, i * 17L % 5000 + 100L))
        .toDF("ib", "sb", "eb")
      val ivPlan = ia.join(ib, $"sa" <= $"eb" && $"sb" <= $"ea")
        .queryExecution.executedPlan.toString
      assert(!ivPlan.contains("BroadcastNestedLoop") && !ivPlan.contains("CartesianProduct"),
        s"interval rule not injected:\n$ivPlan")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
