package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Runnable demo of the Structured-Streaming surface: feeds a MemoryStream
  * through EventStreams.tumblingCounts (watermarked windowed aggregation)
  * and prints the finalized windows.  `sbt "runMain graft.streaming.StreamDemo"`. */
object StreamDemo {
  final case class E(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(min: Long) = new Timestamp(min * 60000L)

    val mem = MemoryStream[E]
    val q = EventStreams.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("drive").outputMode("append").start()
    mem.addData(E(1, ts(10), 1, "click"), E(2, ts(20), 1, "click"),
      E(3, ts(60 * 24 + 5), 2, "view"))
    q.processAllAvailable()
    mem.addData(E(4, ts(60 * 49), 2, "view")) // advances the watermark
    q.processAllAvailable()
    println("STREAM_RESULT=" + spark.table("drive").collect().mkString("; "))
    q.stop()
    spark.stop()
  }
}
