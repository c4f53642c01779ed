package graft.streaming

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the judged persisted session-window query
  * (`q_stream_session_sink`): sink read-back equals the batch twin, a
  * session MERGING across micro-batches retracts the swallowed sibling
  * row from the sink (the failure mode that rules out the tumbling
  * sink's full-group-key partition overwrite — update mode never emits a
  * retraction for the swallowed session), day-2 files are picked up by a
  * checkpoint-resumed run without reprocessing day 1, and an idle
  * restart changes nothing. */
class StreamSessionSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id").cast("long"), col("session_start_us").cast("long"),
      col("session_end_us").cast("long"), col("n_events").cast("long"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  test("sink read-back equals the batch session twin") {
    val stream = canon(Queries.queries("q_stream_session_sink")(spark, TestSpark.sf))
    val batch = canon(Queries.queries("q_stream_session")(spark, TestSpark.sf))
    assert(stream.nonEmpty && stream == batch)
  }

  /** user 99's day-1 events land as TWO sessions (50 min apart > 30 min
    * gap); the day-2 event at +25 min bridges them, so the resumed run
    * must end with exactly ONE merged session — a sink that keyed its
    * overwrite on (user, session_start) would keep the stale
    * (99, +50 min) sibling forever. */
  test("cross-batch session merge retracts the swallowed sibling row") {
    val root = s"/tmp/graft_stream_session_spec/${java.util.UUID.randomUUID()}"
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val t0 = 1704067200000000L // 2024-01-01T00:00Z in epoch micros
    val min = 60000000L
    def ship(name: String, offsets: Seq[Long]): Unit = {
      val df = offsets.zipWithIndex
        .map { case (off, i) => (i.toLong, t0 + off) }
        .toDF("event_id", "ts_us")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          lit(99L).as("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
      val tmp = s"$root/stage-$name"
      df.coalesce(1).write.parquet(tmp)
      new java.io.File(src).mkdirs()
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }
    ship("day1", Seq(0L, 50L * min))
    val day1 = canon(StreamSink.sessionViaSink(spark, src, out, ckpt))
    assert(day1 == Seq(
      (99L, t0, t0 + 30L * min, 1L),
      (99L, t0 + 50L * min, t0 + 80L * min, 1L)),
      s"day 1 must write two separate sessions, got $day1")
    ship("day2", Seq(25L * min))
    val day2 = canon(StreamSink.sessionViaSink(spark, src, out, ckpt))
    assert(day2 == Seq((99L, t0, t0 + 80L * min, 3L)),
      s"merged session must replace BOTH day-1 rows, got $day2")
    // bounded sink layout: partition dirs are hash buckets, never raw
    // user ids — the cap is what makes the sink survive 10^9 users
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_"))
    assert(dirs.nonEmpty && dirs.forall(_.matches("bucket=\\d+")),
      s"sink must partition by bounded bucket, got ${dirs.take(3).mkString(",")}")
    assert(dirs.length <= StreamSink.SessionSinkBuckets)
  }

  test("incremental day-2 catch-up + exactly-once idle restart") {
    val root = s"/tmp/graft_stream_session_spec/${java.util.UUID.randomUUID()}"
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val staged = s"$root/staged"
    graft.io.Tables.events(spark, TestSpark.sf).repartition(4)
      .write.parquet(staged)
    val files = new java.io.File(staged).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4)
    def shipFiles(fs: Seq[java.io.File]): Unit = {
      new java.io.File(src).mkdirs()
      fs.foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(src, f.getName))
      }
    }
    // day 1: two files, one file per micro-batch — sessions will merge
    // ACROSS batches because repartition splits them arbitrarily
    shipFiles(files.take(2))
    val day1 = canon(StreamSink.sessionViaSink(spark, src, out, ckpt,
      maxFilesPerTrigger = Some(1)))
    val nBatches1 = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(nBatches1 >= 2, s"per-file batching must yield >=2 batches, got $nBatches1")
    assert(day1.nonEmpty)
    // day 2: remaining files; the RESUMED stream processes only the new
    // files, extending/merging checkpointed session state
    shipFiles(files.drop(2))
    val day2 = canon(StreamSink.sessionViaSink(spark, src, out, ckpt,
      maxFilesPerTrigger = Some(1)))
    val batchAll = canon(Queries.queries("q_stream_session")(spark, TestSpark.sf))
    assert(day2 == batchAll, "checkpoint-resumed catch-up must equal full batch")
    val nBatches2 = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(nBatches2 >= nBatches1 + 2 && nBatches2 <= nBatches1 + 3,
      s"day-2 must append ~2 file-batches (got $nBatches1 -> $nBatches2), not reprocess day 1")
    // idle restart: no new files -> sink unchanged (exactly-once replay)
    val day3 = canon(StreamSink.sessionViaSink(spark, src, out, ckpt,
      maxFilesPerTrigger = Some(1)))
    assert(day3 == batchAll)
  }
}
