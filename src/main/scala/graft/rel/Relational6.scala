package graft.rel

import graft.GraftQuery
import graft.io.Tables._
import graft.joins.NonEquiJoins._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-3 additions: the skew-proof quantile theta join as a judged path,
  * and the integral (epoch-micros) band auto-rewrite end to end. */
object Relational6 {

  private def installBandRule(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(graft.plans.BandJoinAutoRewrite))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.BandJoinAutoRewrite
    }

  /** The statistics-driven inequality join (M-Bucket-I analog) as a judged
    * query: bucket boundaries come from `approxQuantile` over both inputs,
    * so the plan stays balanced no matter how skewed the value
    * distributions — the static-bounds variant (q_join_theta_ineq) would
    * degrade to one hot bucket on zipfian data.  Same results, same oracle
    * shape; only the physical bucketing differs. */
  val joinThetaIneqQuantile: GraftQuery = GraftQuery("q_join_theta_ineq_quantile",
    """SELECT s_suppkey, count(*) AS n_richer, max(c_acctbal) AS max_cbal
      |FROM supplier JOIN customer ON s_acctbal < c_acctbal
      |GROUP BY s_suppkey""".stripMargin) { (spark, sfDir) =>
    val s = supplier(spark, sfDir).select("s_suppkey", "s_acctbal")
    val c = customer(spark, sfDir).select("c_custkey", "c_acctbal")
    lessThanJoinQuantile(s, c, "s_acctbal", "c_acctbal")
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_richer"), max("c_acctbal").as("max_cbal"))
  }

  /** The band auto-rewrite on an INTEGRAL (epoch-micros) band — the common
    * real-world case (`abs(a.ts - b.ts) <= 60s`): naive syntax with a long
    * literal; BandJoinAutoRewrite compiles it to the exact floor-div
    * bucketed equi join (PlanGuardSpec proves no BNLJ), where the
    * double-only rule would have left a nested loop. */
  val joinBandRuleLong: GraftQuery = GraftQuery("q_join_band_rule_long",
    """SELECT p.event_id AS pid, c.event_id AS cid,
      |       epoch_us(p.ts) AS pts, epoch_us(c.ts) AS cts
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      | AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 60000000""".stripMargin) { (spark, sfDir) =>
    installBandRule(spark)
    val ev = eventsUs(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts_us").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("ts_us").as("cts"))
    p.join(c, abs(col("pts") - col("cts")) <= 60000000L)
      .select("pid", "cid", "pts", "cts")
  }

  /** The same inequality join through the custom SORT-MERGE physical
    * operator (graft.plans.IEJoin): range-partition on quantile boundaries,
    * then a per-cell monotone pointer sweep emits each pair with zero
    * per-pair predicate evaluations — the dense-output counterpart of the
    * bucketed rewrite (identical shuffle, cheaper CPU).  Oracle is the same
    * inequality-join SQL, proving the custom operator exact. */
  val joinThetaIneqSorted: GraftQuery = GraftQuery("q_join_theta_ineq_sorted",
    """SELECT s_suppkey, count(*) AS n_richer, max(c_acctbal) AS max_cbal
      |FROM supplier JOIN customer ON s_acctbal < c_acctbal
      |GROUP BY s_suppkey""".stripMargin) { (spark, sfDir) =>
    val s = supplier(spark, sfDir).select("s_suppkey", "s_acctbal")
    val c = customer(spark, sfDir).select("c_custkey", "c_acctbal")
    graft.plans.IEJoin(s, c, "s_acctbal", "c_acctbal")
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_richer"), max("c_acctbal").as("max_cbal"))
  }

  /** Map column type end to end: construct (map), access ([key]), and
    * introspect (size / map_keys) — the typed-dictionary surface a config/
    * metadata column needs.  All map machinery runs Spark-side; the oracle
    * recomputes the extracted scalars directly, so a map encoding bug
    * breaks the hash. */
  val scalarMap: GraftQuery = GraftQuery("q_scalar_map",
    """SELECT o_orderkey, o_orderstatus AS status_via_map,
      |       CAST(2 AS INTEGER) AS msize,
      |       'status,key' AS mkeys,
      |       CAST(o_orderkey AS VARCHAR) AS key_via_map
      |FROM orders WHERE o_orderkey % 7 = 0""".stripMargin) { (spark, sfDir) =>
    val m = map(lit("status"), col("o_orderstatus"),
      lit("key"), col("o_orderkey").cast("string"))
    orders(spark, sfDir)
      .filter(pmod(col("o_orderkey"), lit(7)) === 0)
      .withColumn("m", m)
      .select(col("o_orderkey"),
        col("m")(lit("status")).as("status_via_map"),
        size(col("m")).as("msize"),
        concat_ws(",", map_keys(col("m"))).as("mkeys"),
        element_at(col("m"), lit("key")).as("key_via_map"))
  }

  /** Lateral explode WITH ordinality (posexplode) — one row per token with
    * its 0-based position, the LATERAL VIEW / UNNEST WITH ORDINALITY shape.
    * DuckDB zips parallel unnests of equal length, which is exactly
    * posexplode's contract. */
  val lateralExplode: GraftQuery = GraftQuery("q_lateral_explode",
    """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |              FROM documents WHERE doc_id % 20 = 0)
      |SELECT doc_id, CAST(unnest(range(0, len(t))) AS INTEGER) AS pos, unnest(t) AS tok
      |FROM toks""".stripMargin) { (spark, sfDir) =>
    documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(20)) === 0)
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), w => w =!= "")).as(Seq("pos", "tok")))
  }

  val all: Seq[GraftQuery] =
    Seq(joinThetaIneqQuantile, joinBandRuleLong, joinThetaIneqSorted,
      scalarMap, lateralExplode)
}
