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

  val all: Seq[GraftQuery] =
    Seq(joinThetaIneqQuantile, joinBandRuleLong, joinThetaIneqSorted)
}
