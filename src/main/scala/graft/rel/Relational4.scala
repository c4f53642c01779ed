package graft.rel

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.joins.NonEquiJoins
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth wave: ORC source round-trip, multiset (ALL) set operations,
  * bitwise aggregates, struct construction/access/serialization, time-series
  * gap-fill with forward fill, event-time RANGE window frames, TPC-H Q3
  * through the SQL entry point, and the variable-length point-in-interval
  * join.
  */
object Relational4 {

  private def tmpDir(sfDir: String, tag: String): String =
    s"/tmp/graft_${tag}_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")

  /** ORC round-trip: parquet -> ORC sink -> ORC scan -> aggregate.  Same
    * columnar pushdown/pruning posture as parquet; the oracle reads the
    * original parquet (the round-trip must be lossless). */
  val scanOrcRoundtrip: GraftQuery = GraftQuery("q_scan_orc_roundtrip",
    """SELECT s_nationkey, count(*) AS n,
      |  CAST(CAST(sum(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS bal
      |FROM supplier GROUP BY s_nationkey""".stripMargin) { (spark, sfDir) =>
    val path = tmpDir(sfDir, "orc_supplier")
    supplier(spark, sfDir).select("s_suppkey", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), exactSum(col("s_acctbal"), 2).as("bal"))
  }

  /** Avro round-trip: parquet -> Avro sink -> Avro scan -> aggregate — the
    * row-oriented interchange format (Kafka/ingest pipelines), closing the
    * mainstream-format matrix next to parquet/ORC/CSV/JSON/text/XML.
    * Spark 4 ships the complete V1 avro stack inside spark-sql itself
    * (AvroFileFormat + serializer/deserializer/SchemaConverters); only the
    * `avro` SHORTNAME registration lives in the separate spark-avro
    * connector jar, so the format is addressed by provider class — the
    * documented fallback `DataSource.lookupDataSource` supports.
    * Longs/strings/doubles map to native Avro types, so the trip is
    * lossless and the oracle reads the original parquet. */
  val scanAvroRoundtrip: GraftQuery = GraftQuery("q_scan_avro_roundtrip",
    """SELECT p_brand, count(*) AS n,
      |  CAST(CAST(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS price
      |FROM part GROUP BY p_brand""".stripMargin) { (spark, sfDir) =>
    val avroProvider = "org.apache.spark.sql.avro.AvroFileFormat"
    val path = tmpDir(sfDir, "avro_part")
    part(spark, sfDir).select("p_partkey", "p_brand", "p_retailprice")
      .write.mode("overwrite").format(avroProvider).save(path)
    spark.read.format(avroProvider).load(path)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), exactSum(col("p_retailprice"), 2).as("price"))
  }

  /** Multiset set operations (ALL variants): UNION ALL keeps duplicates,
    * INTERSECT ALL / EXCEPT ALL match occurrence counts — the bag semantics
    * the distinct-flavored q_setops doesn't cover. */
  val setopsAll: GraftQuery = GraftQuery("q_setops_all",
    """WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
      |     b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT 'union_all' AS op, k FROM (SELECT k FROM a UNION ALL SELECT k FROM b)
      |UNION ALL
      |SELECT 'intersect_all' AS op, k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
      |UNION ALL
      |SELECT 'except_all' AS op, k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)""".stripMargin) { (spark, sfDir) =>
    val a = orders(spark, sfDir).filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("k"))
    val b = customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    a.union(b).select(lit("union_all").as("op"), col("k"))
      .unionByName(a.intersectAll(b).select(lit("intersect_all").as("op"), col("k")))
      .unionByName(a.exceptAll(b).select(lit("except_all").as("op"), col("k")))
  }

  /** Bitwise aggregates: AND/OR/XOR folds over keys plus an OR-accumulated
    * bitmask (the "which line numbers occur" set as one long). */
  val aggBitwise: GraftQuery = GraftQuery("q_agg_bitwise",
    """SELECT l_returnflag,
      |  bit_and(l_orderkey) AS and_key,
      |  bit_or(l_orderkey) AS or_key,
      |  bit_xor(l_orderkey) AS xor_key,
      |  bit_or(CAST(1 AS BIGINT) << (l_linenumber % 60)) AS ln_mask
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir).groupBy("l_returnflag").agg(
      bit_and(col("l_orderkey")).as("and_key"),
      bit_or(col("l_orderkey")).as("or_key"),
      bit_xor(col("l_orderkey")).as("xor_key"),
      bit_or(call_function("shiftleft", lit(1L),
        pmod(col("l_linenumber"), lit(60)).cast(IntegerType)))
        .cast(LongType).as("ln_mask"))
  }

  /** Struct surface: construction, field access, nesting, and JSON
    * serialization (both engines render compact `{"k":v}` JSON). */
  val scalarStruct: GraftQuery = GraftQuery("q_scalar_struct",
    """SELECT n_nationkey,
      |  struct_pack(k := n_nationkey, name := n_name).k AS sk,
      |  struct_pack(inner := struct_pack(k := n_nationkey, name := n_name),
      |              r := n_regionkey).inner.name AS inner_name,
      |  to_json(struct_pack(k := n_nationkey, name := n_name))::VARCHAR AS js
      |FROM nation""".stripMargin) { (spark, sfDir) =>
    val s = struct(col("n_nationkey").as("k"), col("n_name").as("name"))
    nation(spark, sfDir).select(
      col("n_nationkey"),
      s.getField("k").as("sk"),
      struct(s.as("inner"), col("n_regionkey").as("r"))
        .getField("inner").getField("name").as("inner_name"),
      to_json(s).as("js"))
  }

  /** Time-series gap-fill: per-user daily event counts on a dense date
    * spine (`sequence` + explode = DuckDB generate_series), missing days
    * zero-filled, last observed value carried forward (window last over
    * IGNORE NULLS).  The canonical feature-engineering resample shape. */
  val tsGapfill: GraftQuery = GraftQuery("q_ts_gapfill",
    """WITH daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         count(*) AS n_events,
      |         max(CAST(round(value * 100, 0) AS BIGINT)) AS vc
      |       FROM events GROUP BY 1, 2),
      |b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
      |spine AS (SELECT user_id,
      |            CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
      |                 CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |          FROM b),
      |j AS (SELECT s.user_id, s.day, coalesce(d.n_events, 0) AS n_events, d.vc
      |      FROM spine s LEFT JOIN daily d
      |        ON s.user_id = d.user_id AND s.day = d.day)
      |SELECT user_id, day, n_events,
      |  CAST(last_value(vc IGNORE NULLS)
      |         OVER (PARTITION BY user_id ORDER BY day) / 100.0 AS DOUBLE) AS v_ffill
      |FROM j""".stripMargin) { (spark, sfDir) =>
    val ev = eventsUs(spark, sfDir)
    val daily = ev.groupBy(col("user_id"),
        to_date(timestamp_micros(col("ts_us"))).as("day"))
      .agg(count(lit(1)).as("n_events"), max(scaled(col("value"), 2)).as("vc"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        (last(col("vc"), ignoreNulls = true).over(w) / 100.0).as("v_ffill"))
  }

  /** Event-time RANGE frame: trailing-7-day count and exact sum per user,
    * frame bounds on epoch-micros longs (value-based, identical peer
    * semantics in both engines). */
  val windowRangeTime: GraftQuery = GraftQuery("q_window_range_time",
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |  count(*) OVER w AS n_7d,
      |  CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT) / 100.0 AS DOUBLE) AS sum_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-604800000000L, 0)
    eventsUs(spark, sfDir).select(
      col("event_id"), col("user_id"), col("ts_us"),
      count(lit(1)).over(w).as("n_7d"),
      (sum(scaled(col("value"), 2)).over(w) / 100.0).as("sum_7d"))
  }

  private def registerViews(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit =
    Seq("customer", "orders", "lineitem")
      .foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))

  /** TPC-H Q3 (shipping priority) through the SQL entry point — the
    * join-then-group hot path with selective filters on both fact tables.
    * One SQL text runs on both engines (o_orderpriority stands in for the
    * reduced schema's missing o_shippriority). */
  val sqlTpchQ3: GraftQuery = {
    val sql =
      s"""SELECT l_orderkey,
         |  ${exactSumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
         |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15'
         |  AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority""".stripMargin
    GraftQuery("q_sql_tpch_q3", sql) { (spark, sfDir) =>
      registerViews(spark, sfDir)
      spark.sql(sql)
    }
  }

  /** Variable-length point-in-interval join via the bucket-replication
    * rewrite (NonEquiJoins.pointInIntervalJoin): purchase events open a
    * (1 + event_id mod 12)-hour window; clicks of the same user inside the
    * window match.  The oracle states the naive inequality join. */
  val joinPointInterval: GraftQuery = GraftQuery("q_join_point_interval",
    """WITH iv AS (SELECT event_id AS ia, user_id AS ua, epoch_us(ts) AS s,
      |              epoch_us(ts) + (1 + event_id % 12) * 3600000000 AS e
      |            FROM events WHERE event_type = 'purchase'),
      |     pt AS (SELECT event_id AS ib, user_id AS ub, epoch_us(ts) AS p
      |            FROM events WHERE event_type = 'click')
      |SELECT ia, ib, ua AS user_id, p - s AS lag_us
      |FROM iv JOIN pt ON ua = ub AND p >= s AND p < e""".stripMargin) { (spark, sfDir) =>
    val ev = eventsUs(spark, sfDir)
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("ia"), col("user_id").as("ua"),
        col("ts_us").as("s"),
        (col("ts_us") + (lit(1L) + pmod(col("event_id"), lit(12L))) * 3600000000L).as("e"))
    val pt = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("ib"), col("user_id").as("ub"),
        col("ts_us").as("p"))
    NonEquiJoins.pointInIntervalJoin(pt, iv, "p", "s", "e",
        bucketWidth = 6L * 3600000000L, extraKeys = Seq("ub" -> "ua"))
      .select(col("ia"), col("ib"), col("ua").as("user_id"),
        (col("p") - col("s")).as("lag_us"))
  }

  /** The same point-in-interval join with the STATS-DRIVEN bucket width
    * (NonEquiJoins.pointInIntervalJoinAuto: sampled median interval
    * length instead of a caller-guessed constant) — same oracle, since
    * the width only moves cost, never results.  With window lengths of
    * 1-12 h the sampled median lands near 6 h, the hand-tuned width the
    * sibling query uses. */
  val joinPointIntervalAuto: GraftQuery = GraftQuery("q_join_point_interval_auto",
    """WITH iv AS (SELECT event_id AS ia, user_id AS ua, epoch_us(ts) AS s,
      |              epoch_us(ts) + (1 + event_id % 12) * 3600000000 AS e
      |            FROM events WHERE event_type = 'purchase'),
      |     pt AS (SELECT event_id AS ib, user_id AS ub, epoch_us(ts) AS p
      |            FROM events WHERE event_type = 'click')
      |SELECT ia, ib, ua AS user_id, p - s AS lag_us
      |FROM iv JOIN pt ON ua = ub AND p >= s AND p < e""".stripMargin) { (spark, sfDir) =>
    val ev = eventsUs(spark, sfDir)
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("ia"), col("user_id").as("ua"),
        col("ts_us").as("s"),
        (col("ts_us") + (lit(1L) + pmod(col("event_id"), lit(12L))) * 3600000000L).as("e"))
    val pt = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("ib"), col("user_id").as("ub"),
        col("ts_us").as("p"))
    NonEquiJoins.pointInIntervalJoinAuto(pt, iv, "p", "s", "e",
        extraKeys = Seq("ub" -> "ua"))
      .select(col("ia"), col("ib"), col("ua").as("user_id"),
        (col("p") - col("s")).as("lag_us"))
  }

  val all: Seq[GraftQuery] =
    Seq(scanOrcRoundtrip, scanAvroRoundtrip, setopsAll, aggBitwise,
      scalarStruct, tsGapfill, windowRangeTime, sqlTpchQ3, joinPointInterval,
      joinPointIntervalAuto)
}
