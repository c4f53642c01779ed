package graft.rel

import graft.GraftQuery
import graft.fns.Exact
import graft.io.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 continuation: event-sequence analytics (conversion funnel, SCD2
  * interval materialization) and the built-in XML source round-trip.
  */
object Relational8 {

  private def tmpDir(sfDir: String, tag: String): String =
    s"/tmp/graft_${tag}_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")

  /** Conversion-funnel analysis: per user, the first signup, the first view
    * AFTER that signup, and the first purchase AFTER that view.  Each stage
    * is one filtered min-aggregation joined to the previous stage — three
    * shuffles on `user_id` that AQE will plan as co-partitioned (same key
    * throughout), never a per-user sort of the whole event log.  The
    * sequential "after the previous stage" dependency is what windowed
    * funnels get wrong when expressed as independent mins. */
  val eventsFunnel: GraftQuery = GraftQuery("q_events_funnel",
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |s1 AS (SELECT user_id, min(ts_us) AS t_signup FROM ev
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(ts_us) AS t_view FROM ev e JOIN s1 USING (user_id)
      |       WHERE event_type = 'view' AND ts_us > t_signup GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(ts_us) AS t_purchase FROM ev e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_us > t_view GROUP BY e.user_id)
      |SELECT s1.user_id, t_signup, t_view, t_purchase,
      |       1 + CASE WHEN t_view IS NULL THEN 0 ELSE 1 END
      |         + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS stage
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin) {
    (spark, sfDir) =>
      val ev = eventsUs(spark, sfDir).select("user_id", "event_type", "ts_us")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_us").as("t_signup"))
      val s2 = ev.filter(col("event_type") === "view")
        .join(s1, "user_id").filter(col("ts_us") > col("t_signup"))
        .groupBy("user_id").agg(min("ts_us").as("t_view"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts_us") > col("t_view"))
        .groupBy("user_id").agg(min("ts_us").as("t_purchase"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t_signup"), col("t_view"), col("t_purchase"),
          (lit(1) + when(col("t_view").isNull, 0).otherwise(1)
            + when(col("t_purchase").isNull, 0).otherwise(1)).as("stage"))
  }

  /** SCD2 (slowly-changing-dimension type 2) interval materialization:
    * collapse each user's event-type stream into runs of consecutive equal
    * values and emit [valid_from, valid_to) intervals — the
    * gaps-and-islands change-capture pattern (lag to flag changes, running
    * sum to number islands, lead for the closing timestamp; the last run
    * stays open with a NULL valid_to).  One shuffle on user_id serves all
    * three window passes and the aggregation. */
  val scd2Intervals: GraftQuery = GraftQuery("q_scd2_intervals",
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |m AS (SELECT user_id, event_type, ts_us,
      |             CASE WHEN lag(event_type) OVER w IS NULL
      |                    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |i AS (SELECT user_id, event_type, ts_us,
      |             sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us
      |                            ROWS UNBOUNDED PRECEDING) AS island
      |      FROM m),
      |g AS (SELECT user_id, island, min(event_type) AS event_type,
      |             min(ts_us) AS valid_from, count(*) AS n_events
      |      FROM i GROUP BY user_id, island)
      |SELECT user_id, event_type, valid_from,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
      |       n_events
      |FROM g""".stripMargin) { (spark, sfDir) =>
    val ev = eventsUs(spark, sfDir).select("user_id", "event_id", "event_type", "ts_us")
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val chg = when(lag("event_type", 1).over(w).isNull
      || lag("event_type", 1).over(w) =!= col("event_type"), 1).otherwise(0)
    val islands = ev.withColumn("island",
      sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min("event_type").as("event_type"),
        min("ts_us").as("valid_from"), count(lit(1)).as("n_events"))
    islands.select(col("user_id"), col("event_type"), col("valid_from"),
      lead("valid_from", 1)
        .over(Window.partitionBy("user_id").orderBy("valid_from")).as("valid_to"),
      col("n_events"))
  }

  /** XML round-trip through Spark 4's built-in XML source: parquet ->
    * rowTag-per-record XML sink -> schema'd XML scan -> aggregate.  The
    * aggregate makes the result oracle-checkable from the original parquet;
    * acctbal survives the text round-trip because Java double formatting is
    * shortest-round-trip, and the exact-sum guard would catch any drift. */
  val scanXmlRoundtrip: GraftQuery = GraftQuery("q_scan_xml_roundtrip",
    s"""SELECT s_nationkey, count(*) AS n, ${Exact.exactSumSql("s_acctbal", 2)} AS sum_bal
       |FROM supplier GROUP BY s_nationkey""".stripMargin) { (spark, sfDir) =>
    val path = tmpDir(sfDir, "xml_supplier")
    supplier(spark, sfDir).select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").option("rowTag", "supplier").format("xml").save(path)
    // key types mirror the parquet schema so the group key's type matches
    // the oracle's (the gate audits column types, not just values)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    spark.read.schema(schema).option("rowTag", "supplier").format("xml").load(path)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), Exact.exactSum(col("s_acctbal"), 2).as("sum_bal"))
  }

  private case class ColProf(name: String, numeric: Boolean)
  private val profCols = Seq(
    ColProf("l_orderkey", numeric = true), ColProf("l_quantity", numeric = true),
    ColProf("l_extendedprice", numeric = true), ColProf("l_discount", numeric = true),
    ColProf("l_returnflag", numeric = false), ColProf("l_linestatus", numeric = false))

  /** Column profiling (ANALYZE-style statistics): null count, exact
    * distinct count, and typed min/max for six lineitem columns.  Null
    * counts and min/max share ONE scan (they compose into a single
    * hash-free aggregate); each distinct count runs as its own NARROW scan
    * — column pruning means the six one-column passes read the same total
    * bytes as one six-column pass, and each pass dedups map-side before
    * its shuffle.  (The tempting alternative — all six count(DISTINCT)s in
    * one aggregate — plans an Expand that multiplies every row seven-fold
    * and drags the min/max evaluation through it: measured 12.3 s vs
    * ~1 s at sf0.1.)  The oracle brute-forces one aggregate per column. */
  val profileColumns: GraftQuery = GraftQuery("q_profile_columns",
    profCols.map { c =>
      val (minNum, maxNum, minStr, maxStr) =
        if (c.numeric)
          (s"CAST(min(${c.name}) AS DOUBLE)", s"CAST(max(${c.name}) AS DOUBLE)",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        else
          ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"min(${c.name})", s"max(${c.name})")
      s"""SELECT '${c.name}' AS col_name,
         |  count(*) FILTER (WHERE ${c.name} IS NULL) AS n_nulls,
         |  count(DISTINCT ${c.name}) AS n_distinct,
         |  $minNum AS min_num, $maxNum AS max_num,
         |  $minStr AS min_str, $maxStr AS max_str
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")) { (spark, sfDir) =>
    val li = lineitem(spark, sfDir)
    val aggs = profCols.zipWithIndex.flatMap { case (c, i) =>
      val base = Seq(count(when(col(c.name).isNull, 1)).as(s"nulls_$i"))
      val minmax =
        if (c.numeric) Seq(min(col(c.name)).cast(DoubleType).as(s"mn_$i"),
          max(col(c.name)).cast(DoubleType).as(s"mx_$i"))
        else Seq(min(col(c.name)).as(s"mns_$i"), max(col(c.name)).as(s"mxs_$i"))
      base ++ minmax
    }
    // one pass for nulls + min/max; one narrow pruned scan per distinct,
    // all submitted concurrently (independent jobs — the scheduler
    // interleaves them across cores exactly as a cluster would)
    val one = li.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val nd = Await.result(
      Future.sequence(profCols.map(c =>
        Future(li.agg(countDistinct(col(c.name))).head().getLong(0)))),
      Duration.Inf)
    profCols.zipWithIndex.map { case (c, i) =>
      val (mn, mx, mns, mxs) =
        if (c.numeric) (col(s"mn_$i"), col(s"mx_$i"),
          lit(null).cast(StringType), lit(null).cast(StringType))
        else (lit(null).cast(DoubleType), lit(null).cast(DoubleType),
          col(s"mns_$i"), col(s"mxs_$i"))
      one.select(lit(c.name).as("col_name"),
        col(s"nulls_$i").as("n_nulls"), lit(nd(i)).as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"), mns.as("min_str"), mxs.as("max_str"))
    }.reduce(_ unionByName _)
  }

  /** ONE-PASS approximate column profile — the 100 TB posture for
    * [[profileColumns]]: the exact version's per-column distinct scans are
    * the right trade when exactness is required, but a routine ANALYZE
    * over a 100 TB table should read it ONCE.  HLL sketches are plain
    * aggregate functions — unlike `count(DISTINCT)` they compose into a
    * single hash-free aggregate with the null counts and min/max, no
    * Expand, no row blow-up: one scan, one reduce, fixed sketch memory
    * per column.  The sketch is DataSketches HLL (`hll_sketch_agg`,
    * lgK=14 => rse ~0.8%), measured ~7x faster than
    * `approx_count_distinct(rsd=0.01)` on the same scan at equal-or-
    * better accuracy; double columns enter through an injective string
    * cast (the sketch accepts int/long/string/binary only — caveat: -0.0
    * and 0.0 stringify apart where exact DISTINCT merges them; none occur
    * here).  Approximate by construction => no SQL oracle; the spec gates
    * each column's estimate within 2% of the exact count at sf0.1. */
  val profileColumnsFast: GraftQuery = GraftQuery.noOracle("q_profile_columns_fast") {
    (spark, sfDir) =>
      val li = lineitem(spark, sfDir)
      def sketchKey(c: ColProf) =
        if (c.numeric) col(c.name).cast(StringType) else col(c.name)
      val aggs = profCols.zipWithIndex.flatMap { case (c, i) =>
        val base = Seq(count(when(col(c.name).isNull, 1)).as(s"nulls_$i"),
          hll_sketch_estimate(hll_sketch_agg(sketchKey(c), lit(14))).as(s"nd_$i"))
        val minmax =
          if (c.numeric) Seq(min(col(c.name)).cast(DoubleType).as(s"mn_$i"),
            max(col(c.name)).cast(DoubleType).as(s"mx_$i"))
          else Seq(min(col(c.name)).as(s"mns_$i"), max(col(c.name)).as(s"mxs_$i"))
        base ++ minmax
      }
      val one = li.agg(aggs.head, aggs.tail: _*).localCheckpoint()
      profCols.zipWithIndex.map { case (c, i) =>
        val (mn, mx, mns, mxs) =
          if (c.numeric) (col(s"mn_$i"), col(s"mx_$i"),
            lit(null).cast(StringType), lit(null).cast(StringType))
          else (lit(null).cast(DoubleType), lit(null).cast(DoubleType),
            col(s"mns_$i"), col(s"mxs_$i"))
        one.select(lit(c.name).as("col_name"),
          col(s"nulls_$i").as("n_nulls"), col(s"nd_$i").as("n_distinct"),
          mn.as("min_num"), mx.as("max_num"), mns.as("min_str"), mxs.as("max_str"))
      }.reduce(_ unionByName _)
  }

  /** Order-independent table fingerprints: XOR of a 60-bit row hash plus
    * the row count, one row per table — the cross-system integrity check
    * you run after replicating 100 TB (commutative, so it needs no sort
    * and parallelizes as a plain aggregate).  Doubles enter the hash as
    * scaled integers and timestamps as epoch-micros, so both engines hash
    * byte-identical strings. */
  val tableChecksum: GraftQuery = {
    def reprSql(cols: String*) = s"concat_ws('|', ${cols.mkString(", ")})"
    val liRepr = reprSql("l_orderkey", "l_linenumber",
      "CAST(round(l_quantity*100, 0) AS BIGINT)",
      "CAST(round(l_extendedprice*100, 0) AS BIGINT)",
      "l_returnflag", "l_linestatus", "epoch_us(l_shipdate)")
    val ordRepr = reprSql("o_orderkey", "o_custkey", "o_orderstatus",
      "CAST(round(o_totalprice*100, 0) AS BIGINT)", "epoch_us(o_orderdate)")
    val custRepr = reprSql("c_custkey", "c_name", "c_nationkey",
      "CAST(round(c_acctbal*100, 0) AS BIGINT)", "c_mktsegment")
    GraftQuery("q_table_checksum",
      s"""SELECT 'lineitem' AS table_name, count(*) AS n,
         |       bit_xor(${Exact.md5LongSql(liRepr)}) AS checksum FROM lineitem
         |UNION ALL
         |SELECT 'orders', count(*), bit_xor(${Exact.md5LongSql(ordRepr)}) FROM orders
         |UNION ALL
         |SELECT 'customer', count(*), bit_xor(${Exact.md5LongSql(custRepr)}) FROM customer""".stripMargin) {
      (spark, sfDir) =>
        def fp(df: org.apache.spark.sql.DataFrame, name: String,
               repr: org.apache.spark.sql.Column) =
          df.agg(count(lit(1)).as("n"),
            bit_xor(Exact.md5Long(repr)).as("checksum"))
            .select(lit(name).as("table_name"), col("n"), col("checksum"))
        val li = fp(lineitem(spark, sfDir), "lineitem",
          concat_ws("|", col("l_orderkey"), col("l_linenumber"),
            Exact.scaled(col("l_quantity"), 2), Exact.scaled(col("l_extendedprice"), 2),
            col("l_returnflag"), col("l_linestatus"),
            unix_micros(col("l_shipdate").cast(TimestampType))))
        val ord = fp(orders(spark, sfDir), "orders",
          concat_ws("|", col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            Exact.scaled(col("o_totalprice"), 2),
            unix_micros(col("o_orderdate").cast(TimestampType))))
        val cust = fp(customer(spark, sfDir), "customer",
          concat_ws("|", col("c_custkey"), col("c_name"), col("c_nationkey"),
            Exact.scaled(col("c_acctbal"), 2), col("c_mktsegment")))
        li.unionByName(ord).unionByName(cust)
    }
  }

  /** Declarative data-quality constraint suite (the Deequ `Check` shape —
    * the gate a training pipeline runs BEFORE the corpus feeds anything):
    * completeness, uniqueness, referential integrity, domain/set
    * membership, positivity, and a non-emptiness check, each reported as
    * (constraint, n_violations, satisfied).  One satisfied=false row is by
    * design (l_quantity ≤ 30 — a threshold the data really violates) so
    * the violation COUNTING is exercised, not just zero-checking.
    *
    * 100 TB posture: all same-table constraints compose into ONE
    * hash-free aggregate pass per table (checkpointed and fanned into
    * per-constraint rows), referential integrity is one anti join on the
    * dimension key — no constraint re-scans its table. */
  val qualityConstraints: GraftQuery = GraftQuery("q_quality_constraints",
    """SELECT cname, n_violations, n_violations = 0 AS satisfied FROM (
      |SELECT 'completeness_o_custkey' AS cname,
      |  CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations FROM orders
      |UNION ALL SELECT 'unique_o_orderkey',
      |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
      |UNION ALL SELECT 'positive_o_totalprice',
      |  CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
      |UNION ALL SELECT 'ri_orders_customer', CAST(count(*) AS BIGINT)
      |  FROM orders o WHERE NOT EXISTS (
      |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL SELECT 'domain_l_discount',
      |  CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'set_l_returnflag',
      |  CAST(count(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'positive_l_quantity',
      |  CAST(count(*) FILTER (WHERE l_quantity <= 0) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'bound_l_quantity_le30',
      |  CAST(count(*) FILTER (WHERE l_quantity > 30) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'nonempty_lineitem',
      |  CAST(CASE WHEN count(*) = 0 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem)""".stripMargin
      ) { (spark, sfDir) => qualityConstraintsDf(spark, sfDir) }

  private def qualityConstraintsDf(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    val o = orders(spark, sfDir).agg(
      count(when(col("o_custkey").isNull, 1)).as("c_compl"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("c_uniq"),
      count(when(col("o_totalprice") <= 0, 1)).as("c_pos")).localCheckpoint()
    val l = lineitem(spark, sfDir).agg(
      count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)).as("c_dom"),
      count(when(!col("l_returnflag").isin("A", "N", "R"), 1)).as("c_set"),
      count(when(col("l_quantity") <= 0, 1)).as("c_qpos"),
      count(when(col("l_quantity") > 30, 1)).as("c_qle30"),
      when(count(lit(1)) === 0, 1L).otherwise(0L).as("c_nonempty")).localCheckpoint()
    val ri = orders(spark, sfDir)
      .join(customer(spark, sfDir), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("c_ri")).localCheckpoint()
    def row(src: org.apache.spark.sql.DataFrame, name: String, c: String) =
      src.select(lit(name).as("cname"), col(c).cast(LongType).as("n_violations"))
    Seq(
      row(o, "completeness_o_custkey", "c_compl"),
      row(o, "unique_o_orderkey", "c_uniq"),
      row(o, "positive_o_totalprice", "c_pos"),
      row(ri, "ri_orders_customer", "c_ri"),
      row(l, "domain_l_discount", "c_dom"),
      row(l, "set_l_returnflag", "c_set"),
      row(l, "positive_l_quantity", "c_qpos"),
      row(l, "bound_l_quantity_le30", "c_qle30"),
      row(l, "nonempty_lineitem", "c_nonempty"))
      .reduce(_ unionByName _)
      .withColumn("satisfied", col("n_violations") === 0L)
  }

  /** INCREMENTAL constraint verification — Deequ's "incremental metrics"
    * analog, the day-2 shape of [[qualityConstraints]]: yesterday's
    * corpus is summarized once into staged, MERGEABLE metric states, and
    * today's verdict touches only the NEW batch plus those states.
    *
    * State design (what makes each constraint mergeable):
    *  - counting constraints (completeness/positivity/domain/set/bounds)
    *    → one row of additive counts per table per day;
    *  - uniqueness → a per-key frequency table (violations = Σcount −
    *    #keys after merging day tables by key) — the keyed state store a
    *    real incremental checker carries, same artifact shape as
    *    DedupIncr's compacted postings;
    *  - referential integrity → additive per-day anti-join counts against
    *    the (static) dimension.
    *
    * The deterministic batch split (key % 5 == 0 ≙ today) stands in for
    * the arrival date the driver schema lacks.  The ORACLE is the
    * full-table recompute: hash-equality of the merged verdict against it
    * IS the incremental-correctness proof, on a suite whose
    * `bound_l_quantity_le30` row is genuinely violated in both day
    * slices.  At 100 TB the staged states are yesterday's artifacts and
    * only today's batch is scanned; here both sides are derived from the
    * same parquet, staged via [[graft.io.Staged]] so repeat runs reuse
    * the day-1 summaries. */
  val qualityConstraintsIncr: GraftQuery = GraftQuery("q_quality_constraints_incr",
    """SELECT cname, n_violations, n_violations = 0 AS satisfied FROM (
      |SELECT 'completeness_o_custkey' AS cname,
      |  CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations FROM orders
      |UNION ALL SELECT 'unique_o_orderkey',
      |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
      |UNION ALL SELECT 'positive_o_totalprice',
      |  CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
      |UNION ALL SELECT 'ri_orders_customer', CAST(count(*) AS BIGINT)
      |  FROM orders o WHERE NOT EXISTS (
      |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL SELECT 'domain_l_discount',
      |  CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'set_l_returnflag',
      |  CAST(count(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'positive_l_quantity',
      |  CAST(count(*) FILTER (WHERE l_quantity <= 0) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'bound_l_quantity_le30',
      |  CAST(count(*) FILTER (WHERE l_quantity > 30) AS BIGINT) FROM lineitem
      |UNION ALL SELECT 'nonempty_lineitem',
      |  CAST(CASE WHEN count(*) = 0 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem)""".stripMargin
      ) { (spark, sfDir) => qualityConstraintsIncrDf(spark, sfDir) }

  private def oStateOf(df: org.apache.spark.sql.DataFrame) = df.agg(
    count(when(col("o_custkey").isNull, 1)).as("c_compl"),
    count(when(col("o_totalprice") <= 0, 1)).as("c_pos"))
  private def lStateOf(df: org.apache.spark.sql.DataFrame) = df.agg(
    count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)).as("c_dom"),
    count(when(!col("l_returnflag").isin("A", "N", "R"), 1)).as("c_set"),
    count(when(col("l_quantity") <= 0, 1)).as("c_qpos"),
    count(when(col("l_quantity") > 30, 1)).as("c_qle30"),
    count(lit(1)).as("n_rows"))

  private def qualityConstraintsIncrDf(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    import graft.io.Staged
    val day2o = pmod(col("o_orderkey"), lit(5L)) === 0L
    val day2l = pmod(col("l_orderkey"), lit(5L)) === 0L
    // ---- staged day-1 states (yesterday's artifacts)
    val o1 = Staged(spark, s"qcIncr|o1|$sfDir") {
      oStateOf(orders(spark, sfDir).filter(!day2o)) }
    val oKeys1 = Staged(spark, s"qcIncr|ok1|$sfDir") {
      orders(spark, sfDir).filter(!day2o)
        .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("c")) }
    val ri1 = Staged(spark, s"qcIncr|ri1|$sfDir") {
      orders(spark, sfDir).filter(!day2o)
        .join(customer(spark, sfDir), col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("c_ri")) }
    val l1 = Staged(spark, s"qcIncr|l1|$sfDir") {
      lStateOf(lineitem(spark, sfDir).filter(!day2l)) }
    // ---- today's batch only
    val o2 = oStateOf(orders(spark, sfDir).filter(day2o))
    val oKeys2 = orders(spark, sfDir).filter(day2o)
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("c"))
    val ri2 = orders(spark, sfDir).filter(day2o)
      .join(customer(spark, sfDir), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("c_ri2"))
    val l2 = lStateOf(lineitem(spark, sfDir).filter(day2l))
    // ---- merge: counts add; key tables merge by key; verdict shape is
    // identical to the full recompute (= the oracle)
    val oM = o1.select(col("c_compl").as("a1"), col("c_pos").as("b1"))
      .crossJoin(o2)
      .select((col("a1") + col("c_compl")).as("c_compl"),
        (col("b1") + col("c_pos")).as("c_pos")).localCheckpoint()
    val uniq = oKeys1.unionByName(oKeys2).groupBy("k").agg(sum(col("c")).as("c"))
      // coalesce: over an EMPTY orders table sum() is NULL while the
      // oracle's count(*) - count(DISTINCT) is 0
      .agg(coalesce(sum(col("c")) - count(lit(1)), lit(0L)).as("c_uniq"))
      .localCheckpoint()
    val riM = ri1.crossJoin(ri2)
      .select((col("c_ri") + col("c_ri2")).as("c_ri")).localCheckpoint()
    val lM = l1.select(col("c_dom").as("a1"), col("c_set").as("a2"),
        col("c_qpos").as("a3"), col("c_qle30").as("a4"), col("n_rows").as("a5"))
      .crossJoin(l2)
      .select((col("a1") + col("c_dom")).as("c_dom"),
        (col("a2") + col("c_set")).as("c_set"),
        (col("a3") + col("c_qpos")).as("c_qpos"),
        (col("a4") + col("c_qle30")).as("c_qle30"),
        when(col("a5") + col("n_rows") === 0, 1L).otherwise(0L).as("c_nonempty"))
      .localCheckpoint()
    def row(src: org.apache.spark.sql.DataFrame, name: String, c: String) =
      src.select(lit(name).as("cname"), col(c).cast(LongType).as("n_violations"))
    Seq(
      row(oM, "completeness_o_custkey", "c_compl"),
      row(uniq, "unique_o_orderkey", "c_uniq"),
      row(oM, "positive_o_totalprice", "c_pos"),
      row(riM, "ri_orders_customer", "c_ri"),
      row(lM, "domain_l_discount", "c_dom"),
      row(lM, "set_l_returnflag", "c_set"),
      row(lM, "positive_l_quantity", "c_qpos"),
      row(lM, "bound_l_quantity_le30", "c_qle30"),
      row(lM, "nonempty_lineitem", "c_nonempty"))
      .reduce(_ unionByName _)
      .withColumn("satisfied", col("n_violations") === 0L)
  }

  val all: Seq[GraftQuery] = Seq(eventsFunnel, scd2Intervals, scanXmlRoundtrip,
    profileColumns, profileColumnsFast, tableChecksum, qualityConstraints,
    qualityConstraintsIncr)
}

