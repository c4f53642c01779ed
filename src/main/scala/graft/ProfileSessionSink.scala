package graft

import org.apache.spark.sql.functions._

/** Where does q_stream_session_sink's wall go?  Phases timed separately:
  * state machinery (sessionizeUpserts to a noop sink), the full sink
  * drive, and the read-back. Dev harness, not judged. */
object ProfileSessionSink {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = DevSession.local()
    val events = graft.streaming.StreamSink.stagedEventsDir(spark, sfDir)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      // phase 1: the streaming state machinery alone (noop sink)
      time("state-only") {
        val run = graft.streaming.StreamSink.newRunDir()
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val shape = spark.read.parquet(events)
        val raw = spark.readStream.schema(shape.schema).parquet(events)
        val ev = raw
          .withColumn("ts_us", graft.io.Tables.tsUsColFor(raw))
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", "35 days")
        import spark.implicits._
        val agg = graft.streaming.EventStreams.sessionizeUpserts(
          ev.select(col("user_id"), col("ts")).as[graft.streaming.EventStreams.SEv]).toDF()
        val q = agg.writeStream.outputMode("update")
          .option("checkpointLocation", s"$run/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("overwrite").format("noop").save(); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // phase 2: the full judged path, read-back timed separately
      val run2 = graft.streaming.StreamSink.newRunDir()
      val out = time("full-sink") {
        graft.streaming.StreamSink.sessionViaSink(
          spark, events, s"$run2/out", s"$run2/ckpt")
      }
      time("read-back-count") { out.count() }
      val files = time("file-census") {
        spark.read.parquet(s"$run2/out").inputFiles.length
      }
      println(s"PROFILE sink files: $files")
    }
    spark.stop()
  }
}
