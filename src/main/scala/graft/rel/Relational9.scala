package graft.rel

import graft.GraftQuery
import graft.io.Tables.table
import org.apache.spark.sql.SparkSession

/** TPC-H suite completion (B3/B4 SQL surface): the eight query *shapes*
  * missing after rounds 1-3 — Q2, Q4, Q9, Q11, Q12, Q16, Q20, Q21.  With
  * these, every one of the 22 TPC-H query shapes has a judged analog
  * (Q1 ≡ `q_agg_pricing_summary`; 3/5/6/7/8/10/13/14/15/17/18/19/22 were
  * added in earlier rounds).
  *
  * "Shape" because the driver's synthetic schema diverges from tpch-dbgen
  * in two ways, worked around WITHOUT weakening the plan structure:
  *
  *  - **No `partsupp` table.**  Every query that needs it derives a
  *    deterministic 4-suppliers-per-part `partsupp` CTE from `part` x a
  *    4-row constant relation (integer mixing of `p_partkey`, all-integer
  *    cost/qty columns so aggregates are exact).  The SAME CTE text runs
  *    in Spark and DuckDB, so the oracle compares identical inputs.  The
  *    4-row side is a broadcast nested-loop by design (map-only, constant
  *    side) — allowlisted in PlanGuardSpec with the other deliberate
  *    tiny-broadcast plans.  Q9 joins the per-part MIN supply cost instead
  *    of (partkey, suppkey) because the synthetic `l_suppkey` is not
  *    constrained to the derived partsupp pairs.
  *  - **No `l_commitdate` / `l_receiptdate` / `l_shipmode`.**  Q4/Q12/Q21
  *    substitute predicates over existing columns (`l_returnflag = 'R'`
  *    for "late", `l_shipdate >= o_orderdate` for "received after
  *    commit", `l_linestatus` for the Q12 group key, `o_orderpriority`
  *    for its urgency split) — the join/subquery structure (EXISTS,
  *    NOT EXISTS, dual conditional counts) is unchanged.
  *
  * Scale posture: every query is one shared ANSI text planned by Catalyst —
  * correlated subqueries decorrelate to aggregate+join, `NOT IN` becomes a
  * null-aware broadcast anti join, and the big fact side (`lineitem`,
  * `orders`) shuffles at most once per query.  Region/nation filters were
  * checked non-empty at all three driver SFs.
  */
object Relational9 {

  /** Derived-partsupp CTE prelude, shared verbatim by both engines.
    * `ks` is the 4-row constant relation (UNION ALL, the only inline-table
    * syntax both parsers accept); suppkeys land in [0, max+1) which is
    * dense in the synthetic data; qty/cost are all-integer so downstream
    * sums are exact and order-independent. */
  private val psCte =
    """ks AS (SELECT 0 AS k UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey * 7 + k * 13) % (SELECT max(s_suppkey) + 1 FROM supplier) AS ps_suppkey,
      |         1 + (p_partkey * 31 + k * 17) % 9999 AS ps_availqty,
      |         100 + (p_partkey * 13 + k * 29) % 99900 AS ps_supplycost_cents
      |  FROM part CROSS JOIN ks)""".stripMargin

  /** Guard on the derived-partsupp convention: these oracle twins are
    * only comparable while BOTH engines synthesize the SAME partsupp CTE.
    * If a driver testdata refresh ever ships a real `partsupp.parquet`,
    * silently keeping the stand-in would de-sync the 8 TPC-H twins from
    * the real table — fail LOUDLY with the migration path instead.
    * Probed through the Hadoop FileSystem of the path (like
    * [[graft.io.Staged.fingerprint]]), NOT java.io.File: on an hdfs://
    * or s3a:// sfDir a local-disk probe always answers "absent" and the
    * guard would silently wave through the exact divergence it exists to
    * stop.  (Relational9GuardSpec plants the file and pins the failure.) */
  private[rel] def assertNoRealPartsupp(spark: SparkSession, sfDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/partsupp.parquet")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      throw new IllegalStateException(
        s"$sfDir/partsupp.parquet exists, but the TPC-H queries derive a " +
          "synthetic partsupp stand-in (Relational9.psCte). Migrate before " +
          "re-running: register the real table as the `partsupp` view, drop " +
          "psCte from the shared SQL texts (they run verbatim in Spark AND " +
          "the DuckDB oracle), and re-verify q_sql_tpch_{q2,q9,q11,q16,q20}.")
  }

  private def registerViews(spark: SparkSession, sfDir: String): Unit = {
    assertNoRealPartsupp(spark, sfDir)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))
  }

  private def sqlQuery(name: String, sql: String): GraftQuery =
    GraftQuery(name, sql) { (spark, sfDir) =>
      registerViews(spark, sfDir)
      spark.sql(sql)
    }

  /** Q2 (min-cost supplier): correlated scalar subquery picks, per part,
    * the cheapest in-region supplier; the outer equality keeps exactly the
    * argmin rows.  Catalyst decorrelates to a per-part min aggregate
    * joined back — no per-row re-execution.  Deterministic LIMIT: the
    * ORDER BY ends in the (p_partkey, ps_suppkey) primary key. */
  val sqlTpchQ2: GraftQuery = sqlQuery("q_sql_tpch_q2",
    s"""WITH $psCte,
       |rsupp AS (SELECT s_suppkey, s_name, s_acctbal, n_name
       |          FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |                        JOIN region ON n_regionkey = r_regionkey
       |          WHERE r_name = 'EUROPE')
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost_cents
       |FROM part JOIN partsupp ON p_partkey = ps_partkey
       |          JOIN rsupp ON s_suppkey = ps_suppkey
       |WHERE p_size <= 10 AND p_type IN ('LARGE', 'SMALL')
       |  AND ps_supplycost_cents = (
       |    SELECT min(ps2.ps_supplycost_cents)
       |    FROM partsupp ps2 JOIN rsupp s2 ON s2.s_suppkey = ps2.ps_suppkey
       |    WHERE ps2.ps_partkey = p_partkey)
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
       |LIMIT 100""".stripMargin)

  /** Q4 (order-priority checking): EXISTS semi join against the fact table
    * ("some line item was returned" replaces commit<receipt).  Plans as a
    * LeftSemi shuffled hash join on l_orderkey — one pass over lineitem. */
  val sqlTpchQ4: GraftQuery = sqlQuery("q_sql_tpch_q4",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority""".stripMargin)

  /** Q9 (product-type profit by nation x year): 5-way join over lineitem
    * with the per-part MIN derived supply cost; profit sums are
    * scaled-integer exact.  nation/part-name filter prunes before the
    * orders join; only lineitem shuffles. */
  val sqlTpchQ9: GraftQuery = sqlQuery("q_sql_tpch_q9",
    s"""WITH $psCte,
       |pscost AS (SELECT ps_partkey, min(ps_supplycost_cents) AS cost_cents
       |           FROM partsupp GROUP BY ps_partkey),
       |profit AS (
       |  SELECT n_name AS nation,
       |         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       |         l_extendedprice * (1 - l_discount)
       |           - (CAST(cost_cents AS DOUBLE) / 100.0) * l_quantity AS amount
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN pscost ON ps_partkey = l_partkey
       |  WHERE p_name LIKE '%red%')
       |SELECT nation, o_year, ${graft.fns.Exact.exactSumSql("amount", 4)} AS sum_profit
       |FROM profit GROUP BY nation, o_year""".stripMargin)

  /** Q11 (important stock identification): all-integer value sums; the
    * HAVING threshold is scale-free (2x the per-part average via a scalar
    * subquery) so the result is non-empty at every SF — the original's
    * fixed 0.0001 fraction goes empty as the part count grows. */
  val sqlTpchQ11: GraftQuery = sqlQuery("q_sql_tpch_q11",
    s"""WITH $psCte,
       |natps AS (SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS val_cents
       |          FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
       |          JOIN nation ON s_nationkey = n_nationkey
       |          JOIN region ON n_regionkey = r_regionkey
       |          WHERE r_name = 'AFRICA')
       |SELECT ps_partkey, CAST(sum(val_cents) AS BIGINT) AS value_cents
       |FROM natps
       |GROUP BY ps_partkey
       |HAVING CAST(sum(val_cents) AS BIGINT) >
       |  (SELECT 2.0 * sum(val_cents) / count(DISTINCT ps_partkey) FROM natps)
       |ORDER BY value_cents DESC, ps_partkey""".stripMargin)

  /** Q12 (shipping-mode priority split): dual conditional counts in one
    * pass; `l_linestatus` stands in for the missing `l_shipmode`,
    * `l_shipdate >= o_orderdate` for the missing receipt/commit dates. */
  val sqlTpchQ12: GraftQuery = sqlQuery("q_sql_tpch_q12",
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate >= o_orderdate
      |GROUP BY l_linestatus""".stripMargin)

  /** Q16 (parts/supplier relationship): distinct-count per part attribute
    * with a `NOT IN` exclusion — Catalyst plans the single-column
    * non-nullable NOT IN as a null-aware broadcast HASH anti join (not a
    * nested loop); `s_suppkey % 7 = 0` stands in for the complaints
    * LIKE over the missing supplier comment column. */
  val sqlTpchQ16: GraftQuery = sqlQuery("q_sql_tpch_q16",
    s"""WITH $psCte
       |SELECT p_brand, p_type, p_size,
       |       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM partsupp JOIN part ON p_partkey = ps_partkey
       |WHERE p_brand <> 'Brand#1'
       |  AND p_type NOT LIKE 'PROMO%'
       |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
       |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
       |GROUP BY p_brand, p_type, p_size""".stripMargin)

  /** Q20 (potential part promotion): nested IN + correlated scalar
    * subquery — suppliers holding more than half a year's demand of some
    * 'red' part.  Catalyst decorrelates the inner sum to a pre-aggregated
    * join on l_partkey; the NULL sum for parts with no shipments makes the
    * comparison NULL => row dropped, identically in both engines. */
  val sqlTpchQ20: GraftQuery = sqlQuery("q_sql_tpch_q20",
    s"""WITH $psCte
       |SELECT s_name, s_suppkey
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |              JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND s_suppkey IN (
       |    SELECT ps_suppkey FROM partsupp
       |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
       |      AND ps_availqty > (
       |        SELECT 0.5 * sum(l_quantity) FROM lineitem
       |        WHERE l_partkey = ps_partkey
       |          AND l_shipdate >= TIMESTAMP '1996-01-01'
       |          AND l_shipdate < TIMESTAMP '1997-01-01'))
       |ORDER BY s_name, s_suppkey""".stripMargin)

  /** Q21 (suppliers who kept orders waiting): the classic
    * EXISTS / NOT EXISTS pair over the same fact table — another supplier
    * contributed to the order, and no OTHER supplier's line was returned.
    * Both decorrelate to semi/anti joins on l_orderkey; `l_returnflag='R'`
    * stands in for receipt>commit.  Region scoped via a scalar subquery on
    * the 5-row region table. */
  val sqlTpchQ21: GraftQuery = sqlQuery("q_sql_tpch_q21",
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |  AND n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'MIDDLE EAST')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin)

  val all: Seq[GraftQuery] = Seq(
    sqlTpchQ2, sqlTpchQ4, sqlTpchQ9, sqlTpchQ11,
    sqlTpchQ12, sqlTpchQ16, sqlTpchQ20, sqlTpchQ21)
}
