package graft.streaming

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the persisted stream-stream join (q_stream_join_sink): sink
  * read-back equals the batch join exactly, and a checkpoint-resumed
  * day-2 run matches day-1 purchases held in STATE against day-2 clicks
  * (the cross-day pairs only a genuinely stateful stream join can emit)
  * with the native file sink's commit log keeping replay exactly-once. */
class StreamJoinSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id").cast("long"), col("purchase_id").cast("long"),
      col("click_id").cast("long"))
      .as[(Long, Long, Long)].collect().sorted.toSeq

  private def batchJoin = {
    val ev = graft.io.Tables.eventsUs(spark, TestSpark.sf)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    p.join(c, col("user_id") === col("cu") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") && col("c_ts") < col("p_ts"))
  }

  test("sink read-back equals the batch stream-stream join") {
    val got = canon(Queries.queries("q_stream_join_sink")(spark, TestSpark.sf))
    assert(got.nonEmpty && got == canon(batchJoin))
  }

  test("day-2 resume: stateful cross-day matches + exactly-once replay") {
    val root = s"/tmp/graft_stream_join_spec/${java.util.UUID.randomUUID()}"
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    // split the events by TIME, not randomly: day-1 ships the earlier
    // half, so purchases whose prior-hour click arrives in the later half
    // can only match via checkpointed join state
    val ev = graft.io.Tables.events(spark, TestSpark.sf)
    val cut = graft.io.Tables.eventsUs(spark, TestSpark.sf)
      .agg(percentile_approx(col("ts_us"), lit(0.5), lit(1000))).first().getLong(0)
    val evUs = graft.io.Tables.eventsUs(spark, TestSpark.sf)
    new java.io.File(src).mkdirs()
    ev.join(evUs.filter(col("ts_us") <= cut).select("event_id"), "event_id")
      .write.parquet(s"$root/d1")
    ev.join(evUs.filter(col("ts_us") > cut).select("event_id"), "event_id")
      .write.parquet(s"$root/d2")
    def ship(day: String): Unit =
      new java.io.File(s"$root/$day").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(src, s"$day-${f.getName}"))
        }
    ship("d1")
    val day1 = canon(StreamSink.joinViaSink(spark, src, out, ckpt))
    ship("d2")
    val day2 = canon(StreamSink.joinViaSink(spark, src, out, ckpt))
    val full = canon(batchJoin)
    assert(day2 == full, "resumed run must complete the cross-day matches")
    assert(day1.size < full.size, "split must defer some matches to day 2")
    // idle restart: no new files -> no duplicate emission (commit log)
    val day3 = canon(StreamSink.joinViaSink(spark, src, out, ckpt))
    assert(day3 == full)
  }
}
