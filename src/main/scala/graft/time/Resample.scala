package graft.time

import graft.GraftQuery
import graft.io.Tables.eventsUs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series RESAMPLE + GAP-FILL: bucket sparse per-key event streams
  * onto a fixed grid and fill the holes — last-observation-carried-
  * forward ([[locfOnTs]]) or linear interpolation between the
  * surrounding observations ([[interpOnTs]]).  The feature-engineering
  * primitive behind per-entity activity curves, rate normalization and
  * model-input densification.
  *
  * Scale shape: the grid is GENERATED per key (`sequence` + `explode`
  * between that key's own observed bounds — no driver loop, no global
  * calendar join), the fill is one window per key ordered by bucket,
  * and everything shuffles exactly once on the key.  Grid size is
  * span/step per key, so a hot key costs its own span, never the
  * table's.  Values ride as scaled BIGINTs (see [[graft.fns.Exact]]);
  * interpolation divides exact integer numerators as the LAST step, so
  * engines agree bit-for-bit. */
object Resample {

  private val HourUs = 3600000000L

  /** (user_id, bucket index, summed scaled value) at hourly grain, plus
    * each key's observed bucket bounds. */
  private def hourly(ev: DataFrame): DataFrame = {
    val sv = round(col("value") * 100).cast("long")
    ev.select(col("user_id"), (col("ts_us") / HourUs).cast("long").as("bi"), sv.as("sv"))
      .groupBy(col("user_id"), col("bi"))
      .agg(sum(col("sv")).as("v"))
  }

  /** The per-key dense grid LEFT-joined with the observed buckets:
    * (user_id, bi, v nullable), v null on the gaps. */
  private def grid(agg: DataFrame): DataFrame = {
    val bounds = agg.groupBy(col("user_id"))
      .agg(min(col("bi")).as("lo"), max(col("bi")).as("hi"))
    bounds
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("bi"))
      .join(agg, Seq("user_id", "bi"), "left")
  }

  private def wAsc = Window.partitionBy(col("user_id")).orderBy(col("bi"))

  /** LOCF fill: each gap bucket carries the latest earlier observation.
    * Output (user_id, bucket_us, v_filled: scaled BIGINT). */
  def locfOnTs(ev: DataFrame): DataFrame = {
    val w = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid(hourly(ev))
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), (col("bi") * HourUs).as("bucket_us"), col("v_filled"))
  }

  /** Linear interpolation: a gap bucket at index b between the previous
    * observation (pb, pv) and the next (nb, nv) gets
    * `(pv*(nb-b) + nv*(b-pb)) / (nb-pb)` — exact integer numerator,
    * ONE double division.  Observed buckets pass through as their own
    * value; grid edges are observed by construction (the grid spans
    * each key's own min..max observed bucket). */
  def interpOnTs(ev: DataFrame): DataFrame = {
    val wPrev = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = wAsc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsB: Column = when(col("v").isNotNull, col("bi"))
    val g = grid(hourly(ev))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pb", last(obsB, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nb", first(obsB, ignoreNulls = true).over(wNext))
    val interp =
      (col("pv") * (col("nb") - col("bi")) + col("nv") * (col("bi") - col("pb")))
        .cast("double") / (col("nb") - col("pb")).cast("double")
    g.withColumn("v_interp",
        when(col("v").isNotNull, col("v").cast("double")).otherwise(interp))
      .select(col("user_id"), (col("bi") * HourUs).as("bucket_us"), col("v_interp"))
  }

  private val CommonSql =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS bi,
      |                  CAST(round(value * 100, 0) AS BIGINT) AS sv FROM events),
      |a AS (SELECT user_id, bi, CAST(sum(sv) AS BIGINT) AS v FROM e GROUP BY 1, 2),
      |bounds AS (SELECT user_id, min(bi) AS lo, max(bi) AS hi FROM a GROUP BY 1),
      |g AS (SELECT user_id, unnest(generate_series(lo, hi, 1)) AS bi FROM bounds),
      |j AS (SELECT g.user_id, g.bi, a.v FROM g LEFT JOIN a ON g.user_id = a.user_id AND g.bi = a.bi)""".stripMargin

  /** Judged query: hourly LOCF resample of each user's value stream. */
  val tsResampleLocf: GraftQuery = GraftQuery("q_ts_resample_locf",
    s"""$CommonSql
       |SELECT user_id, bi * 3600000000 AS bucket_us,
       |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bi
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
       |FROM j""".stripMargin) { (spark, sfDir) =>
    locfOnTs(eventsUs(spark, sfDir))
  }

  /** Judged query: hourly linear-interpolation resample. */
  val tsResampleInterp: GraftQuery = GraftQuery("q_ts_resample_interp",
    s"""$CommonSql,
       |f AS (SELECT user_id, bi, v,
       |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bi
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |  LAST_VALUE(CASE WHEN v IS NOT NULL THEN bi END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY bi
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
       |  FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bi
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       |  FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bi END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY bi
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
       |  FROM j)
       |SELECT user_id, bi * 3600000000 AS bucket_us,
       |  CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
       |       ELSE CAST(pv * (nb - bi) + nv * (bi - pb) AS DOUBLE)
       |            / CAST(nb - pb AS DOUBLE) END AS v_interp
       |FROM f""".stripMargin) { (spark, sfDir) =>
    interpOnTs(eventsUs(spark, sfDir))
  }

  val all: Seq[GraftQuery] = Seq(tsResampleLocf, tsResampleInterp)
}
