package graft.rel

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.joins.NonEquiJoins._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational surface: scans/sinks (B1), projection/filter (B2), the join
  * family (B3), aggregations (B4), windows (B5), sort/limit (B6), set ops
  * (B7).  Every query has a DuckDB oracle twin; float aggregates go through
  * [[graft.fns.Exact]] so both engines produce bit-identical values.
  */
object Relational {

  private def tmpDir(sfDir: String, tag: String): String =
    s"/tmp/graft_${tag}_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")

  // ---------------------------------------------------------------- B1
  /** CSV round-trip: parquet -> CSV sink -> CSV scan (explicit schema) ->
    * aggregate.  Exercises the text source/sink the reference reads (HDFS
    * text lines); the aggregate makes the result oracle-checkable from the
    * original parquet. */
  val scanCsvRoundtrip: GraftQuery = GraftQuery("q_scan_csv_roundtrip",
    """SELECT n_regionkey, count(*) AS n, min(n_name) AS min_name
      |FROM nation GROUP BY n_regionkey""".stripMargin) { (spark, sfDir) =>
    val path = tmpDir(sfDir, "csv_nation")
    nation(spark, sfDir).select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.read.schema(schema).option("header", "true").csv(path)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), min("n_name").as("min_name"))
  }

  /** Partitioned parquet sink (the 100 TB layout: partition pruning on the
    * high-cardinality-scan side) + read-back aggregate. */
  val sinkPartitioned: GraftQuery = GraftQuery("q_sink_partitioned",
    s"""SELECT l_returnflag, count(*) AS n, ${exactSumSql("l_quantity", 2)} AS sum_qty
       |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, sfDir) =>
    val path = tmpDir(sfDir, "part_sink")
    lineitem(spark, sfDir).select("l_returnflag", "l_orderkey", "l_quantity")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    spark.read.parquet(path)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity"), 2).as("sum_qty"))
  }

  // ---------------------------------------------------------------- B2
  val projectRename: GraftQuery = GraftQuery("q_project_rename",
    """SELECT l_orderkey AS ok, l_linenumber AS ln,
      |       l_extendedprice * (1 - l_discount) AS net_price,
      |       CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS status
      |FROM lineitem""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir).select(
      col("l_orderkey").as("ok"),
      col("l_linenumber").as("ln"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
      when(col("l_returnflag") === "R", "returned").otherwise("kept").as("status"))
  }

  val filterPred: GraftQuery = GraftQuery("q_filter_pred",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_returnflag IN ('A','R') AND l_quantity > 25 AND l_linestatus IS NOT NULL""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
        col("l_returnflag").isin("A", "R") &&
        col("l_quantity") > 25 &&
        col("l_linestatus").isNotNull)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
  }

  // ---------------------------------------------------------------- B3
  /** Star-schema equi join chain; Catalyst broadcasts the small dims (AQE
    * decides from runtime sizes — exactly what we want at 100 TB). */
  val joinEquiStar: GraftQuery = GraftQuery("q_join_equi_star",
    s"""SELECT r_name, n_name, count(*) AS n_orders,
       |       ${exactSumSql("o_totalprice", 2)} AS total_price
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name""".stripMargin) { (spark, sfDir) =>
    orders(spark, sfDir)
      .join(customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice"), 2).as("total_price"))
  }

  /** Explicit broadcast-hash joins: dims are forced to the map side — no
    * shuffle of the fact table at all. */
  val joinBroadcast: GraftQuery = GraftQuery("q_join_broadcast",
    s"""SELECT p_brand, count(*) AS n, ${exactSumSql("l_quantity", 2)} AS sum_qty,
       |       count(DISTINCT s_nationkey) AS n_nations
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY p_brand""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir)
      .join(broadcast(part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(spark, sfDir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity"), 2).as("sum_qty"),
        countDistinct(col("s_nationkey")).as("n_nations"))
  }

  /** Band join (the reference's signature operator): lineitem self-join,
    * same order, |Δ extendedprice| ≤ 100, via the bucketed-equi rewrite. */
  val joinBand: GraftQuery = GraftQuery("q_join_band",
    """SELECT a.l_orderkey AS ok, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
      |       a.l_extendedprice AS price_a, b.l_extendedprice AS price_b
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
      | AND abs(a.l_extendedprice - b.l_extendedprice) <= 100.0""".stripMargin) { (spark, sfDir) =>
    val li = lineitem(spark, sfDir)
    val a = li.select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln_a"),
      col("l_extendedprice").as("price_a"))
    val b = li.select(col("l_orderkey").as("ok_b"), col("l_linenumber").as("ln_b"),
      col("l_extendedprice").as("price_b"))
    bandJoin(a, b, "price_a", "price_b", 100.0, extraKeys = Seq("ok" -> "ok_b"))
      .filter(col("ln_a") < col("ln_b"))
      .select("ok", "ln_a", "ln_b", "price_a", "price_b")
  }

  /** Inequality theta join via suffix-bucket rewrite (M-Bucket-I analog),
    * aggregated per supplier. */
  val joinThetaIneq: GraftQuery = GraftQuery("q_join_theta_ineq",
    """SELECT s_suppkey, count(*) AS n_richer, max(c_acctbal) AS max_cbal
      |FROM supplier JOIN customer ON s_acctbal < c_acctbal
      |GROUP BY s_suppkey""".stripMargin) { (spark, sfDir) =>
    val s = supplier(spark, sfDir).select("s_suppkey", "s_acctbal")
    val c = customer(spark, sfDir).select("c_custkey", "c_acctbal")
    lessThanJoin(s, c, "s_acctbal", "c_acctbal", lo = -1000.0, hi = 10000.0)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_richer"), max("c_acctbal").as("max_cbal"))
  }

  /** 1-Bucket-Theta join (the reference's core algorithm) on an
    * ARBITRARY theta predicate with no exploitable structure — a
    * congruence match neither the band nor the inequality rewrites
    * accept, payload-guarded by an acctbal comparison to keep output
    * selective.  The physical plan is the random-grid replication
    * equi join on (__row, __col): every |S|x|T| pair meets in exactly
    * one grid cell, cells hash-shuffle across the cluster — no
    * CartesianProduct, no BroadcastNestedLoopJoin (plan-guarded in
    * NonEquiJoinsSpec). */
  val joinTheta1Bucket: GraftQuery = GraftQuery("q_join_theta_1bucket",
    """SELECT s_nationkey AS nationkey, count(*) AS n_pairs,
      |       CAST(sum(s_suppkey + c_custkey) AS BIGINT) AS key_sum
      |FROM supplier JOIN customer
      |  ON (s_suppkey * 13) % 97 = (c_custkey * 29) % 97
      | AND s_acctbal < c_acctbal
      |GROUP BY 1""".stripMargin) { (spark, sfDir) =>
    val s = supplier(spark, sfDir).select("s_suppkey", "s_nationkey", "s_acctbal")
    val c = customer(spark, sfDir).select("c_custkey", "c_acctbal")
    oneBucketThetaJoin(s, c, "s_suppkey", "c_custkey", rS = 8, rT = 8,
      theta = pmod(col("s_suppkey") * 13, lit(97L)) === pmod(col("c_custkey") * 29, lit(97L))
        && col("s_acctbal") < col("c_acctbal"))
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("s_suppkey") + col("c_custkey")).as("key_sum"))
  }

  val joinCross: GraftQuery = GraftQuery("q_join_cross",
    """SELECT r_regionkey, r_name, n_nationkey, n_name
      |FROM region CROSS JOIN nation""".stripMargin) { (spark, sfDir) =>
    crossJoinSmall(region(spark, sfDir).select("r_regionkey", "r_name"),
      nation(spark, sfDir).select("n_nationkey", "n_name"))
  }

  /** Interval-overlap join: pairs of events of the same user whose 1-hour
    * activity windows overlap — strict band on epoch micros. */
  val joinInterval: GraftQuery = GraftQuery("q_join_interval",
    """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
      |       abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) < 3600000000""".stripMargin) { (spark, sfDir) =>
    val ev = eventsUs(spark, sfDir)
    val a = ev.select(col("user_id"), col("event_id").as("id_a"),
      col("ts_us").as("ts_a"))
    val b = ev.select(col("user_id").as("uid_b"), col("event_id").as("id_b"),
      col("ts_us").as("ts_b"))
    intervalOverlapJoin(a, b, "ts_a", "ts_b", 3600000000L,
      extraKeys = Seq("user_id" -> "uid_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("user_id"), col("id_a"), col("id_b"),
        abs(col("ts_a") - col("ts_b")).as("gap_us"))
  }

  /** As-of join: each purchase matched to the latest strictly-earlier click
    * of the same user — one window pass, no join matrix. */
  val joinAsof: GraftQuery = GraftQuery("q_join_asof",
    """SELECT p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_ts_us,
      |       (SELECT c.event_id FROM events c
      |         WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
      |         ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
      |FROM events p WHERE p.event_type = 'purchase'""".stripMargin) { (spark, sfDir) =>
    val ev = eventsUs(spark, sfDir)
    val probe = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("purchase_id"))
    val quote = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
    asofJoin(probe, quote, key = "user_id", ts = "ts_us",
      probeId = "purchase_id", quoteId = "click_id")
      .select(col("purchase_id"), col("ts_us").as("purchase_ts_us"), col("click_id"))
  }

  val joinOuter: GraftQuery = GraftQuery("q_join_outer",
    """SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey""".stripMargin) { (spark, sfDir) =>
    customer(spark, sfDir).select("c_custkey", "c_mktsegment")
      .join(orders(spark, sfDir).select("o_custkey", "o_orderkey", "o_totalprice"),
        col("c_custkey") === col("o_custkey"), "left")
      .select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")
  }

  val joinSemiAnti: GraftQuery = GraftQuery("q_join_semi_anti",
    """SELECT c_custkey, 'has' AS tag FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'none' AS tag FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (spark, sfDir) =>
    val c = customer(spark, sfDir).select("c_custkey")
    val o = orders(spark, sfDir).select("o_custkey")
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .withColumn("tag", lit("has"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("tag", lit("none"))
    semi.unionByName(anti)
  }

  // ---------------------------------------------------------------- B4
  /** TPC-H Q1 shape: multi-measure hash aggregate with partial+final
    * (map-side combine) planned by Catalyst automatically. */
  val aggPricingSummary: GraftQuery = GraftQuery("q_agg_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${exactSumSql("l_quantity", 2)} AS sum_qty,
       |  ${exactSumSql("l_extendedprice", 2)} AS sum_base,
       |  ${exactSumSql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc,
       |  ${exactSumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 4)} AS sum_charge,
       |  ${exactAvgSql("l_quantity", 4)} AS avg_qty,
       |  ${exactAvgSql("l_extendedprice", 4)} AS avg_price,
       |  ${exactAvgSql("l_discount", 6)} AS avg_disc,
       |  count(*) AS n
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (spark, sfDir) =>
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = disc * (lit(1) + col("l_tax"))
    lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        exactSum(col("l_quantity"), 2).as("sum_qty"),
        exactSum(col("l_extendedprice"), 2).as("sum_base"),
        exactSum(disc, 4).as("sum_disc"),
        exactSum(charge, 4).as("sum_charge"),
        exactAvg(col("l_quantity"), 4).as("avg_qty"),
        exactAvg(col("l_extendedprice"), 4).as("avg_price"),
        exactAvg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n"))
  }

  val aggDistinct: GraftQuery = GraftQuery("q_agg_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))
  }

  /** HLL sketch — approximate, so no SQL oracle (rows-only check); the
    * scalatest suite asserts relative error vs exact. */
  val aggApproxDistinct: GraftQuery = GraftQuery.noOracle("q_agg_approx_distinct") { (spark, sfDir) =>
    lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count(lit(1)).as("n"))
  }

  val aggRollup: GraftQuery = GraftQuery("q_agg_rollup",
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |       ${exactSumSql("l_quantity", 2)} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity"), 2).as("sum_qty"))
  }

  // ---------------------------------------------------------------- B5
  val windowRank: GraftQuery = GraftQuery("q_window_rank",
    """SELECT o_orderkey, o_custkey,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rnk,
      |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drnk
      |FROM orders""".stripMargin) { (spark, sfDir) =>
    val byDateKey = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val byDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"),
      row_number().over(byDateKey).cast("long").as("rn"),
      rank().over(byDate).cast("long").as("rnk"),
      dense_rank().over(byDate).cast("long").as("drnk"))
  }

  val windowRunning: GraftQuery = GraftQuery("q_window_running",
    """SELECT o_orderkey, o_custkey,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0 AS running_total,
      |  count(*) OVER (PARTITION BY o_custkey
      |                 ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
      |                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d
      |FROM orders""".stripMargin) { (spark, sfDir) =>
    val rows = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val range30 = Window.partitionBy(col("o_custkey"))
      .orderBy(datediff(col("o_orderdate"), lit("1970-01-01").cast(DateType)))
      .rangeBetween(-30, Window.currentRow)
    orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"),
      (sum(scaled(col("o_totalprice"), 2)).over(rows) / lit(100.0)).as("running_total"),
      count(lit(1)).over(range30).as("n_30d"))
  }

  val topkPerGroup: GraftQuery = GraftQuery("q_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
  }

  // ---------------------------------------------------------------- B6
  /** Global top-N: Catalyst plans orderBy+limit as TakeOrderedAndProject —
    * per-partition top-N then a single driver merge, no global sort. */
  val sortLimit: GraftQuery = GraftQuery("q_sort_limit",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir).select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  // ---------------------------------------------------------------- B7
  val setOps: GraftQuery = GraftQuery("q_setops",
    """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |     b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      |SELECT 'union' AS src, k FROM (SELECT k FROM a UNION SELECT k FROM b)
      |UNION ALL
      |SELECT 'intersect' AS src, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      |UNION ALL
      |SELECT 'except' AS src, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)""".stripMargin) { (spark, sfDir) =>
    val a = orders(spark, sfDir).select(col("o_custkey").as("k")).distinct()
    val b = customer(spark, sfDir).filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("k"))
    a.union(b).distinct().withColumn("src", lit("union"))
      .unionByName(a.intersect(b).withColumn("src", lit("intersect")))
      .unionByName(a.except(b).withColumn("src", lit("except")))
      .select("src", "k")
  }

  val all: Seq[GraftQuery] = Seq(
    scanCsvRoundtrip, sinkPartitioned,
    projectRename, filterPred,
    joinEquiStar, joinBroadcast, joinBand, joinThetaIneq, joinTheta1Bucket, joinCross,
    joinInterval, joinAsof, joinOuter, joinSemiAnti,
    aggPricingSummary, aggDistinct, aggApproxDistinct, aggRollup,
    windowRank, windowRunning, topkPerGroup,
    sortLimit, setOps)
}
