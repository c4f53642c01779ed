package graft.io

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The judged catalog-path query must be exchange-free end to end: the
  * co-bucketed scans satisfy both the join's and the aggregate's
  * distributions, so with broadcast disabled NO Exchange of any kind may
  * appear — and the result must match the plain parquet-path computation
  * exactly. */
class CatalogQuerySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q_catalog_bucketed plans with zero Exchange and matches parquet path") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = Queries.queries("q_catalog_bucketed")(spark, TestSpark.sf)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"catalog bucketed query shuffles:\n$plan")
      val got = q.select(col("o_orderkey"), col("n_li"), col("sum_qty"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      val exp = Tables.orders(spark, TestSpark.sf)
        .join(Tables.lineitem(spark, TestSpark.sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_li"),
          graft.fns.Exact.exactSum(col("l_quantity"), 2).as("sum_qty"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got.nonEmpty && got == exp)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
