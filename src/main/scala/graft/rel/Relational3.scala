package graft.rel

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Third wave: cube / grouping sets, full-outer join, the SQL entry point
  * (temp views + spark.sql) with correlated and scalar subqueries that
  * exercise Catalyst's decorrelation, a TPC-H-shaped multi-join flagship,
  * and deterministic sampling.
  */
object Relational3 {

  /** CUBE with grouping() flags (DuckDB's grouping() matches Spark's). */
  val aggCube: GraftQuery = GraftQuery("q_agg_cube",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
       |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
       |  count(*) AS n, ${exactSumSql("l_extendedprice", 2)} AS sum_price
       |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir)
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n"),
        exactSum(col("l_extendedprice"), 2).as("sum_price"))
      .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n", "sum_price")
  }

  /** Full outer join with genuine exclusives on both sides: nations having
    * suppliers vs nations having customers. */
  val joinFullOuter: GraftQuery = GraftQuery("q_join_full_outer",
    """WITH s AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1),
      |     c AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1)
      |SELECT s.k AS supp_nation, c.k AS cust_nation, s.n_supp, c.n_cust
      |FROM s FULL JOIN c ON s.k = c.k""".stripMargin) { (spark, sfDir) =>
    val s = supplier(spark, sfDir).groupBy(col("s_nationkey").as("supp_nation"))
      .agg(count(lit(1)).as("n_supp"))
    val c = customer(spark, sfDir).groupBy(col("c_nationkey").as("cust_nation"))
      .agg(count(lit(1)).as("n_cust"))
    s.join(c, col("supp_nation") === col("cust_nation"), "full")
      .select("supp_nation", "cust_nation", "n_supp", "n_cust")
  }

  private def registerViews(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))

  /** SQL surface: correlated EXISTS + scalar subquery, decorrelated by
    * Catalyst into joins (no per-row subquery execution). */
  val subqueries: GraftQuery = GraftQuery("q_subquery",
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_totalprice > (SELECT avg(o_totalprice) FROM orders))""".stripMargin) { (spark, sfDir) =>
    registerViews(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_totalprice > (SELECT avg(o_totalprice) FROM orders))""".stripMargin)
  }

  /** TPC-H Q5-shaped flagship through the SQL entry point: six-way join,
    * region filter, date range, grouped exact revenue.  Catalyst broadcast
    * rules + AQE pick the dim-table strategy. */
  val sqlTpchQ5: GraftQuery = {
    val rev = exactSumSql("l_extendedprice * (1 - l_discount)", 4)
    val sql =
      s"""SELECT n_name, count(*) AS n_items, $rev AS revenue
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name IN ('ASIA', 'AMERICA', 'EUROPE', 'AFRICA', 'MIDDLE EAST')
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name""".stripMargin
    GraftQuery("q_sql_tpch_q5", sql) { (spark, sfDir) =>
      registerViews(spark, sfDir)
      // Spark round() is HALF_UP vs DuckDB's half-away — identical for the
      // positive scaled sums used here; the SQL text runs on both engines.
      spark.sql(sql)
    }
  }

  /** Deterministic stratified sampling (training-pipeline op): seeded
    * Bernoulli sampling is partitioning-dependent in Spark, so sample by a
    * hash predicate instead — reproducible on any cluster layout AND in the
    * oracle. */
  val sampleHash: GraftQuery = GraftQuery("q_sample_hash",
    s"""SELECT l_orderkey, l_linenumber, l_returnflag
       |FROM lineitem
       |WHERE ${md5LongSql("CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)")} % 20 = 0""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir)
      .filter(pmod(md5Long(concat(col("l_orderkey").cast("string"), lit("#"),
        col("l_linenumber").cast("string"))), lit(20L)) === 0)
      .select("l_orderkey", "l_linenumber", "l_returnflag")
  }

  /** Top-3 orders per customer through the custom TopKPerGroupExec physical
    * operator (bounded heaps, no sort — see graft.plans.TopKPerGroup); the
    * oracle states the equivalent window formulation. */
  val topkCustomPlan: GraftQuery = GraftQuery("q_topk_custom_plan",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) <= 3""".stripMargin) { (spark, sfDir) =>
    graft.plans.TopKPerGroup(
      orders(spark, sfDir).select("o_custkey", "o_orderkey", "o_totalprice"),
      groupCols = Seq("o_custkey"),
      order = Seq("o_totalprice" -> false, "o_orderkey" -> true),
      k = 3)
  }

  /** Correlation / covariance / stddev from exact integer moments.  The
    * built-in corr/stddev aggregates accumulate doubles (order-dependent
    * low bits), so instead both engines compute the identical closed-form
    * expression over exact long sums (every sum < 2^53, the final doubles
    * go through the same IEEE ops => bit-identical). */
  val aggStats: GraftQuery = {
    def longSumSql(e: String) = s"CAST(sum($e) AS BIGINT)"
    val xi = "CAST(round(l_quantity, 0) AS BIGINT)"
    val yi = "CAST(round(l_extendedprice, 0) AS BIGINT)"
    GraftQuery("q_agg_stats",
      s"""WITH m AS (SELECT l_returnflag, count(*) AS n,
         |  ${longSumSql(xi)} AS sx, ${longSumSql(yi)} AS sy,
         |  ${longSumSql(s"$xi * $xi")} AS sxx,
         |  ${longSumSql(s"$yi * $yi")} AS syy,
         |  ${longSumSql(s"$xi * $yi")} AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS covar_qty_price,
         |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_price,
         |  sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
         |       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_price
         |FROM m""".stripMargin) { (spark, sfDir) =>
      val x = round(col("l_quantity")).cast(LongType)
      val y = round(col("l_extendedprice")).cast(LongType)
      val m = lineitem(spark, sfDir).groupBy("l_returnflag").agg(
        count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      val nD = col("n").cast(DoubleType)
      val sxD = col("sx").cast(DoubleType); val syD = col("sy").cast(DoubleType)
      val sxxD = col("sxx").cast(DoubleType); val syyD = col("syy").cast(DoubleType)
      val sxyD = col("sxy").cast(DoubleType)
      val cov = (nD * sxyD - sxD * syD) / (nD * (nD - 1.0))
      val corr = (nD * sxyD - sxD * syD) /
        (sqrt(nD * sxxD - sxD * sxD) * sqrt(nD * syyD - syD * syD))
      val sd = sqrt((nD * syyD - syD * syD) / (nD * (nD - 1.0)))
      m.select(col("l_returnflag"), col("n"),
        cov.as("covar_qty_price"), corr.as("corr_qty_price"), sd.as("stddev_price"))
    }
  }

  val all: Seq[GraftQuery] =
    Seq(aggCube, joinFullOuter, subqueries, sqlTpchQ5, sampleHash, topkCustomPlan,
      aggStats)
}
