package graft.time

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Event-time operators (B9), batch-first over the static `events` table so
  * the exact same expressions lift to Structured Streaming (readStream +
  * withWatermark) unchanged — see graft.streaming for the streaming demo.
  * Window starts are emitted as epoch micros (BIGINT) for oracle parity.
  */
object EventWindows {

  private val US_6H = 21600000000L

  /** Shared batch/streaming transform bodies.  Each takes a frame carrying
    * an event-time TIMESTAMP column `ts` and produces the judged output
    * shape.  The batch thunks derive `ts` from the exact ts_us micros; the
    * stream-batch parity spec (StreamingSpec) applies the SAME function to
    * a watermarked MemoryStream and asserts the outputs are bit-identical —
    * the checkable form of SURVEY §1.2's "batch-first lifts to streaming"
    * claim.  Windowing on the `ts` attribute itself (not a derived
    * expression) is what lets streaming tie the watermark to the window
    * column. */
  def tumblingOnTs(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value"), 4).as("sum_val"))
      .select(unix_micros(col("w.start")).as("wstart_us"),
        col("event_type"), col("n"), col("sum_val"))

  def slidingOnTs(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(window(col("ts"), "1 day", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("wstart_us"), col("event_type"), col("n"))

  def sessionOnTs(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))

  val tumbling: GraftQuery = GraftQuery("q_stream_tumbling",
    s"""SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS wstart_us,
       |  event_type, count(*) AS n, ${exactSumSql("value", 4)} AS sum_val
       |FROM events GROUP BY 1, 2""".stripMargin) { (spark, sfDir) =>
    tumblingOnTs(eventsUs(spark, sfDir)
      .withColumn("ts", timestamp_micros(col("ts_us"))))
  }

  /** Sliding windows: Spark assigns each event to length/slide windows
    * (epoch-aligned); the oracle reproduces the same 4 starts per event via
    * integer arithmetic. */
  val sliding: GraftQuery = GraftQuery("q_stream_sliding",
    s"""SELECT ((epoch_us(ts) // $US_6H) - i) * $US_6H AS wstart_us,
       |  event_type, count(*) AS n
       |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)
       |GROUP BY 1, 2""".stripMargin) { (spark, sfDir) =>
    slidingOnTs(eventsUs(spark, sfDir)
      .withColumn("ts", timestamp_micros(col("ts_us"))))
  }

  /** Session windows (30-min gap) per user.  The oracle is the classic
    * gap-and-island rewrite; Spark's session_window ends at last_ts + gap,
    * which the oracle mirrors. */
  val session: GraftQuery = GraftQuery("q_stream_session",
    """WITH x AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |y AS (SELECT user_id, t,
      |        CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
      |                  >= 1800000000
      |               OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      |             THEN 1 ELSE 0 END AS brk
      |      FROM x),
      |z AS (SELECT user_id, t,
      |        sum(brk) OVER (PARTITION BY user_id ORDER BY t
      |                       ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM y)
      |SELECT user_id, min(t) AS session_start_us,
      |       max(t) + 1800000000 AS session_end_us, count(*) AS n_events
      |FROM z GROUP BY user_id, sid""".stripMargin) { (spark, sfDir) =>
    sessionOnTs(eventsUs(spark, sfDir)
      .withColumn("ts", timestamp_micros(col("ts_us"))))
  }

  val all: Seq[GraftQuery] = Seq(tumbling, sliding, session)
}
