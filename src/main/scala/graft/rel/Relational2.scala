package graft.rel

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second wave of relational surface: JSON source round-trip, pivot,
  * exact median, ordered string aggregation, and the distribution window
  * functions (ntile / percent_rank / cume_dist).
  */
object Relational2 {

  private def tmpDir(sfDir: String, tag: String): String =
    s"/tmp/graft_${tag}_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")

  /** JSON-lines round-trip: parquet -> json sink -> json scan (explicit
    * schema — never infer on a 100 TB lake) -> aggregate. */
  val scanJsonRoundtrip: GraftQuery = GraftQuery("q_scan_json_roundtrip",
    """SELECT n_regionkey, count(*) AS n, max(n_name) AS max_name
      |FROM nation GROUP BY n_regionkey""".stripMargin) { (spark, sfDir) =>
    val path = tmpDir(sfDir, "json_nation")
    nation(spark, sfDir).select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.read.schema(schema).json(path)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), max("n_name").as("max_name"))
  }

  /** Pivot (cross-tab): linestatus columns per returnflag row.  Catalyst
    * plans this as a single hash aggregate with conditional measures — the
    * oracle states the same thing with CASE sums. */
  val aggPivot: GraftQuery = GraftQuery("q_agg_pivot",
    s"""SELECT l_returnflag,
       |  ${exactSumSql("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE NULL END", 2)} AS qty_f,
       |  ${exactSumSql("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE NULL END", 2)} AS qty_o
       |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(exactSum(col("l_quantity"), 2))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
  }

  /** Exact median over scaled integers — both engines interpolate the two
    * middle values, and on identical longs the double result is identical. */
  val aggMedian: GraftQuery = GraftQuery("q_agg_median",
    """SELECT l_returnflag,
      |  median(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS med_qty,
      |  median(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS med_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg((median(scaled(col("l_quantity"), 2)) / 100.0).as("med_qty"),
        (median(scaled(col("l_extendedprice"), 2)) / 100.0).as("med_price"))
  }

  /** Ordered, distinct string aggregation (LISTAGG shape): deterministic via
    * sort-before-concat on both sides. */
  val aggStringAgg: GraftQuery = GraftQuery("q_agg_stringagg",
    """SELECT r_name, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |GROUP BY r_name""".stripMargin) { (spark, sfDir) =>
    region(spark, sfDir)
      .join(nation(spark, sfDir), col("r_regionkey") === col("n_regionkey"))
      .groupBy("r_name")
      .agg(array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"))
  }

  /** Distribution window functions.  percent_rank/cume_dist divide exact
    * integers, so the doubles agree bit-for-bit across engines. */
  val windowDistribution: GraftQuery = GraftQuery("q_window_distribution",
    """SELECT o_orderkey, o_custkey,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"),
      ntile(4).over(w).cast(LongType).as("quartile"),
      percent_rank().over(w).as("prank"),
      cume_dist().over(w).as("cdist"))
  }

  /** Navigation window functions: lag/lead with defaults, first/last/nth
    * value over a running frame — all under a total order. */
  val windowNavigation: GraftQuery = GraftQuery("q_window_navigation",
    """SELECT o_orderkey, o_custkey,
      |  lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
      |  lead(o_totalprice, 1, -1.0) OVER w AS next_price,
      |  first_value(o_orderkey) OVER w AS first_key,
      |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_key_sofar,
      |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"),
      lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1, -1.0).over(w).as("next_price"),
      first_value(col("o_orderkey")).over(w).as("first_key"),
      last_value(col("o_orderkey")).over(wRun).as("last_key_sofar"),
      nth_value(col("o_orderkey"), 2).over(wRun).as("second_key"))
  }

  /** Exact interpolated percentiles over scaled integers: both engines
    * interpolate linearly between identical longs => identical doubles.
    * Computed MEMORY-BOUNDED via graft.fns.ExactQuantiles (histogram-
    * refinement order-statistic search, two counting passes for the cents
    * domain) — never Spark's buffer-all `percentile`, which holds every
    * value of a group in one executor map and dies on 100 TB hot groups. */
  val aggPercentiles: GraftQuery = GraftQuery("q_agg_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.25) / 100.0 AS p25,
      |  quantile_cont(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.50) / 100.0 AS p50,
      |  quantile_cont(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.90) / 100.0 AS p90
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, sfDir) =>
    val cents = scaled(col("l_extendedprice"), 2)
    // pass 0 staged under a (table, group, value) tag shared with the
    // quantile_disc twin below: whichever runs first materializes it once
    val raw = graft.fns.ExactQuantiles.groupQuantiles(
      lineitem(spark, sfDir).select(col("l_returnflag"), cents.as("__v")),
      "l_returnflag", "__v", Seq("p25" -> 0.25, "p50" -> 0.50, "p90" -> 0.90),
      stageTag = Some(s"$sfDir:lineitem:l_returnflag:extprice_cents:" +
        graft.io.Staged.fingerprint(spark, s"$sfDir/lineitem.parquet")))
    raw.select(col("l_returnflag"), (col("p25") / 100.0).as("p25"),
      (col("p50") / 100.0).as("p50"), (col("p90") / 100.0).as("p90"))
  }

  /** DISCRETE percentiles (quantile_disc): the smallest value whose CDF
    * reaches q — an actual data value, never interpolated (the form that
    * stays meaningful for codes/ids and integer domains).  Same size-
    * hybrid order-statistic machinery as [[aggPercentiles]], disc mode. */
  val aggPercentilesDisc: GraftQuery = GraftQuery("q_agg_percentiles_disc",
    """SELECT l_returnflag,
      |  quantile_disc(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.25) AS p25_cents,
      |  quantile_disc(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.50) AS p50_cents,
      |  quantile_disc(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.90) AS p90_cents
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, sfDir) =>
    val cents = scaled(col("l_extendedprice"), 2)
    graft.fns.ExactQuantiles.groupQuantiles(
      lineitem(spark, sfDir).select(col("l_returnflag"), cents.as("__v")),
      "l_returnflag", "__v",
      Seq("p25_cents" -> 0.25, "p50_cents" -> 0.50, "p90_cents" -> 0.90),
      disc = true,
      stageTag = Some(s"$sfDir:lineitem:l_returnflag:extprice_cents:" +
        graft.io.Staged.fingerprint(spark, s"$sfDir/lineitem.parquet")))
  }

  /** The reference's native input format: delimited text lines parsed
    * positionally (HDFS TextInputFormat + String.split in the mapper).
    * Round-trip: write "key|name|regionkey" lines, read with spark.read.text,
    * split and cast — then aggregate for the oracle. */
  val scanTextParse: GraftQuery = GraftQuery("q_scan_text_parse",
    """SELECT n_regionkey, count(*) AS n,
      |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      |FROM nation GROUP BY n_regionkey""".stripMargin) { (spark, sfDir) =>
    val path = tmpDir(sfDir, "text_nation")
    nation(spark, sfDir)
      .select(concat_ws("|", col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
      .write.mode("overwrite").text(path)
    spark.read.text(path)
      .select(split(col("value"), "\\|").as("f"))
      .select(element_at(col("f"), 1).cast(IntegerType).as("n_nationkey"),
        element_at(col("f"), 2).as("n_name"),
        element_at(col("f"), 3).cast(IntegerType).as("n_regionkey"))
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).cast("long").as("key_sum"))
  }

  /** Explicit GROUPING SETS (the general form of rollup/cube). */
  val aggGroupingSets: GraftQuery = GraftQuery("q_agg_grouping_sets",
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |       ${exactSumSql("l_quantity", 2)} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |       ${exactSumSql("l_quantity", 2)} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(scanJsonRoundtrip, aggPivot, aggMedian, aggStringAgg, windowDistribution,
      windowNavigation, aggPercentiles, aggPercentilesDisc, scanTextParse,
      aggGroupingSets)
}
