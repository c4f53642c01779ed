package graft.plans

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val orders =
    spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")

  test("custom physical plan is used and contains no Sort/Window") {
    val df = TopKPerGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("WindowExec") && !plan.contains("Sort "), plan)
  }

  test("matches the window row_number formulation exactly") {
    val got = TopKPerGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .as[(Long, Long, Double)].collect().toSet
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val expected = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("k <= 0 is rejected up front") {
    intercept[IllegalArgumentException] {
      TopKPerGroup(orders, Seq("o_custkey"), Seq("o_orderkey" -> true), 0)
    }
  }

  test("k larger than any group returns everything") {
    val got = TopKPerGroup(orders, Seq("o_custkey"),
      Seq("o_orderkey" -> true), 100000).count()
    assert(got == orders.count())
  }

  test("duplicate order values are deterministic via the tiebreaker") {
    val df = Seq((1L, 5.0, 1L), (1L, 5.0, 2L), (1L, 5.0, 3L), (2L, 1.0, 4L))
      .toDF("g", "v", "id")
    val got = TopKPerGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L))
  }
}
