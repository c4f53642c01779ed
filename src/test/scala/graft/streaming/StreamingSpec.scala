package graft.streaming

import graft.TestSpark
import graft.streaming.EventStreams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** End-to-end Structured Streaming demos over MemoryStream: the B9 batch
  * operators lift unchanged, plus streaming-only watermark semantics.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  final case class E(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

  test("streaming tumbling window with watermark matches batch semantics") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[E]
    val q = tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    try {
      mem.addData(
        E(1, ts(10), 1, "click"), E(2, ts(20), 1, "click"),
        E(3, ts(60 * 24 + 5), 2, "view"))
      q.processAllAvailable()
      // advance watermark past day 0 so its window finalizes (append mode)
      mem.addData(E(4, ts(60 * 49), 2, "view"))
      q.processAllAvailable()
      val rows = spark.table("tumb").select("wstart", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows.contains((ts(0), "click", 2L)), s"got $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed event ids") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[E]
    val q = dedupedEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(E(1, ts(10), 1, "click"), E(1, ts(10), 1, "click"), E(2, ts(11), 1, "view"))
      q.processAllAvailable()
      mem.addData(E(1, ts(12), 1, "click")) // replay within watermark
      q.processAllAvailable()
      assert(spark.table("dedup").select("event_id").as[Long].collect().sorted
        .sameElements(Array(1L, 2L)))
    } finally q.stop()
  }

  test("stream-stream non-equi join: purchases match prior-hour clicks only") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[E]
    val purchases = MemoryStream[E]
    val q = purchaseClickJoin(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      clicks.addData(
        E(10, ts(0), 1, "click"),    // 70 min before purchase -> out of range
        E(11, ts(30), 1, "click"),   // 40 min before -> match
        E(12, ts(80), 2, "click"))   // other user
      purchases.addData(E(20, ts(70), 1, "purchase"))
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData(E(13, ts(300), 2, "click"))
      purchases.addData(E(21, ts(300), 2, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(rows.contains((20L, 11L)), s"expected in-range match, got $rows")
      assert(!rows.contains((20L, 10L)), "out-of-range click must not match")
      assert(!rows.exists(_._2 == 12L), "cross-user click must not match")
    } finally q.stop()
  }

  test("outer stream-stream join emits unmatched purchases after watermark expiry") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[E]
    val purchases = MemoryStream[E]
    val q = purchaseClickJoinOuter(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssjoin_outer").outputMode("append").start()
    try {
      clicks.addData(E(11, ts(30), 1, "click"))     // matches user 1's purchase
      purchases.addData(
        E(20, ts(70), 1, "purchase"),               // matched
        E(21, ts(75), 2, "purchase"))               // never matched
      q.processAllAvailable()
      // the unmatched row may not finalize until both watermarks pass its
      // horizon — push them far forward
      clicks.addData(E(12, ts(600), 9, "click"))
      purchases.addData(E(22, ts(600), 9, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_outer")
        .select("purchase_id", "click_id").as[(Long, Option[Long])].collect().toMap
      assert(rows.get(20L).contains(Some(11L)), s"matched row wrong: $rows")
      assert(rows.get(21L).contains(None),
        s"unmatched purchase must surface with null click after expiry: $rows")
    } finally q.stop()
  }

  test("right-outer stream-stream join preserves unmatched clicks") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[E]
    val purchases = MemoryStream[E]
    val q = purchaseClickJoinRight(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssjoin_right").outputMode("append").start()
    try {
      clicks.addData(
        E(11, ts(30), 1, "click"),                  // matches user 1's purchase
        E(12, ts(35), 3, "click"))                  // never followed by a purchase
      purchases.addData(E(20, ts(70), 1, "purchase"))
      q.processAllAvailable()
      clicks.addData(E(13, ts(600), 9, "click"))
      purchases.addData(E(22, ts(600), 9, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_right")
        .select("purchase_id", "click_id")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(rows.contains((Some(20L), Some(11L))), s"matched row missing: $rows")
      assert(rows.contains((None, Some(12L))),
        s"unmatched click must surface with null purchase: $rows")
      assert(!rows.exists(r => r._1.isDefined && r._2.isEmpty),
        s"right-outer must not emit purchase-side orphans: $rows")
    } finally q.stop()
  }

  test("full-outer stream-stream join surfaces orphans of BOTH sides") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[E]
    val purchases = MemoryStream[E]
    val q = purchaseClickJoinFull(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssjoin_full").outputMode("append").start()
    try {
      clicks.addData(
        E(11, ts(30), 1, "click"),                  // matches user 1's purchase
        E(12, ts(35), 3, "click"))                  // never followed by a purchase
      purchases.addData(
        E(20, ts(70), 1, "purchase"),               // matched
        E(21, ts(75), 2, "purchase"))               // never preceded by a click
      q.processAllAvailable()
      // orphans finalize only once both watermarks pass their horizons
      clicks.addData(E(13, ts(600), 9, "click"))
      purchases.addData(E(22, ts(600), 9, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_full")
        .select("purchase_id", "click_id")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(rows.contains((Some(20L), Some(11L))), s"matched row missing: $rows")
      assert(rows.contains((Some(21L), None)),
        s"unmatched purchase must surface with null click: $rows")
      assert(rows.contains((None, Some(12L))),
        s"unmatched click must surface with null purchase: $rows")
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events with dimension rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[E]
    val q = enrichedEvents(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      mem.addData(E(1, ts(1), 1, "click"), E(2, ts(2), 2, "view"), E(3, ts(3), 9, "view"))
      q.processAllAvailable()
      val rows = spark.table("enriched").select("event_id", "tier")
        .as[(Long, Option[String])].collect().toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None), rows)
    } finally q.stop()
  }

  test("streaming parquet file sink with checkpoint produces exactly-once output") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = "/tmp/graft_stream_sink_test"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val mem = MemoryStream[E]
    val q = dedupedEvents(mem.toDF())
      .writeStream.format("parquet")
      .option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      mem.addData(E(1, ts(10), 1, "click"), E(1, ts(10), 1, "click"), E(2, ts(11), 1, "view"))
      q.processAllAvailable()
      mem.addData(E(3, ts(12), 2, "view"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/data").select("event_id").as[Long].collect().sorted
      assert(out.sameElements(Array(1L, 2L, 3L)),
        s"file sink must contain each event exactly once, got ${out.mkString(",")}")
    } finally q.stop()
  }

  test("batch sessionizer matches session_window cuts") {
    import spark.implicits._
    val evs = Seq(
      Ev(1, 0L), Ev(1, 60L * 1000000), Ev(1, 3600L * 1000000), // gap 59 min => new session
      Ev(2, 0L)).toDS()
    val out = sessionizeBatch(evs).collect().toSet
    assert(out == Set(
      SessionOut(1, 0L, 60L * 1000000 + 1800000000L, 2),
      SessionOut(1, 3600L * 1000000, 3600L * 1000000 + 1800000000L, 1),
      SessionOut(2, 0L, 1800000000L, 1)))
  }

  test("streaming sessionizer: session spanning batches emits once, open session closes on timeout") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SEv]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    val base = 1440L // start a day after epoch so nothing sits at watermark 0
    def us(min: Long): Long = (base + min) * 60000000L
    try {
      // batch 1: two events 10 min apart (one open session)
      mem.addData(SEv(1, ts(base + 0)), SEv(1, ts(base + 10)))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0, "open session must not emit yet")
      // batch 2: +20 min — still the SAME session (gap < 30 min across batches)
      mem.addData(SEv(1, ts(base + 30)))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0, "session spanning batches must not split")
      // batch 3: event far in the future -> in-stream gap closes user 1's session
      mem.addData(SEv(1, ts(base + 600)))
      q.processAllAvailable()
      val afterGap = spark.table("sess").as[SessionOut].collect().toSet
      assert(afterGap == Set(SessionOut(1, us(0), us(30) + 1800000000L, 3)),
        s"expected the merged 3-event session once, got $afterGap")
      // batch 4: advance watermark (other user) far enough that user 1's
      // open session at ts(600) times out and flushes
      mem.addData(SEv(2, ts(base + 2000)))
      q.processAllAvailable()
      mem.addData(SEv(2, ts(base + 2001)))
      q.processAllAvailable()
      val finals = spark.table("sess").as[SessionOut].collect().toSet
      assert(finals.contains(SessionOut(1, us(600), us(600) + 1800000000L, 1)),
        s"open session must flush on event-time timeout, got $finals")
      assert(finals.count(_.user_id == 1) == 2, s"no double-emission, got $finals")
    } finally q.stop()
  }

  test("streaming CDC latest-wins survives out-of-order and cross-batch stale updates") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import EventStreams.Change
    val mem = MemoryStream[Change]
    val q = cdcLatest(mem.toDS())
      .writeStream.format("memory").queryName("cdc").outputMode("update").start()
    def latest(): Map[Long, Change] = spark.table("cdc").as[Change].collect()
      .groupBy(_.key).map { case (k, cs) => k -> cs.maxBy(c => (c.version, c.deleted)) }
    try {
      // batch 1: initial inserts
      mem.addData(Change(1, 1, "a", false), Change(2, 1, "x", false))
      q.processAllAvailable()
      // batch 2: out-of-order WITHIN the batch (v3 then v2) — v3 must win
      mem.addData(Change(1, 3, "c", false), Change(1, 2, "b", false))
      q.processAllAvailable()
      assert(latest()(1L) == Change(1, 3, "c", false), s"got ${latest()}")
      // batch 3: delete key 2 at v2
      mem.addData(Change(2, 2, "x", true))
      q.processAllAvailable()
      assert(latest()(2L).deleted, s"got ${latest()}")
      // batch 4: stale cross-batch updates (lower versions) must not regress
      mem.addData(Change(1, 2, "stale", false), Change(2, 1, "stale", false))
      q.processAllAvailable()
      assert(latest()(1L) == Change(1, 3, "c", false), s"got ${latest()}")
      assert(latest()(2L).deleted, s"stale update revived a deleted key: ${latest()}")
    } finally q.stop()
  }

  // ---- stream-batch parity: the judged batch window queries and the
  // streaming lift are the SAME transform (EventWindows.tumblingOnTs /
  // sessionOnTs) on the same events, so their outputs must be
  // bit-identical.  The real sf0.001 events table is replayed through a
  // MemoryStream in event-time-ordered chunks (no late drops), then a
  // far-future sentinel advances the watermark so every real window
  // finalizes in append mode; the sentinel's own contribution is excluded
  // on both sides by its impossible event_type / user_id.

  final case class PE(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private def replayedEvents(): (Seq[Seq[PE]], Timestamp) = {
    import spark.implicits._
    val rows = graft.io.Tables.eventsUs(spark, graft.TestSpark.sf)
      .select(col("ts_us"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
      .map { case (us, uid, et, v) =>
        val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
        PE(t, uid, et, v)
      }.toSeq
    val maxUs = graft.io.Tables.eventsUs(spark, graft.TestSpark.sf)
      .agg(max(col("ts_us"))).head().getLong(0)
    // sentinel 30 days past the data: watermark (sentinel - 1 h) clears
    // every real window/session end
    val sentinelUs = maxUs + 30L * 86400000000L
    val st = new Timestamp(sentinelUs / 1000000L * 1000L)
    (rows.grouped(math.max(1, rows.size / 4 + 1)).toSeq, st)
  }

  test("stream-batch parity: streaming tumbling output is bit-identical to q_stream_tumbling") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (chunks, sentinel) = replayedEvents()
    val mem = MemoryStream[PE]
    val q = graft.time.EventWindows.tumblingOnTs(
        mem.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("parity_tumb").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      mem.addData(PE(sentinel, -1L, "__sentinel", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("parity_tumb")
        .filter(col("event_type") =!= "__sentinel")
        .as[(Long, String, Long, Double)].collect().toSeq.sorted
      val batch = graft.Queries.queries("q_stream_tumbling")(spark, graft.TestSpark.sf)
        .as[(Long, String, Long, Double)].collect().toSeq.sorted
      assert(batch.nonEmpty && streamed == batch,
        s"streaming tumbling diverged from batch: stream=${streamed.size} rows, batch=${batch.size} rows")
    } finally q.stop()
  }

  test("stream-batch parity: streaming sliding output is bit-identical to q_stream_sliding") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (chunks, sentinel) = replayedEvents()
    val mem = MemoryStream[PE]
    val q = graft.time.EventWindows.slidingOnTs(
        mem.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("parity_slide").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      mem.addData(PE(sentinel, -1L, "__sentinel", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("parity_slide")
        .filter(col("event_type") =!= "__sentinel")
        .as[(Long, String, Long)].collect().toSeq.sorted
      val batch = graft.Queries.queries("q_stream_sliding")(spark, graft.TestSpark.sf)
        .as[(Long, String, Long)].collect().toSeq.sorted
      assert(batch.nonEmpty && streamed == batch,
        s"streaming sliding diverged from batch: stream=${streamed.size} rows, batch=${batch.size} rows")
    } finally q.stop()
  }

  test("stream-batch parity: streaming session output is bit-identical to q_stream_session") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (chunks, sentinel) = replayedEvents()
    val mem = MemoryStream[PE]
    val q = graft.time.EventWindows.sessionOnTs(
        mem.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("parity_sess").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      mem.addData(PE(sentinel, -1L, "__sentinel", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("parity_sess")
        .filter(col("user_id") >= 0)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      val batch = graft.Queries.queries("q_stream_session")(spark, graft.TestSpark.sf)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      assert(batch.nonEmpty && streamed == batch,
        s"streaming session diverged from batch: stream=${streamed.size} rows, batch=${batch.size} rows")
    } finally q.stop()
  }

  test("stream-stream join state stays bounded once watermarks advance") {
    // The watermark + time-range condition is the join's STATE BOUND: rows
    // older than the horizon must leave the state store, or a 100 TB/day
    // stream grows state without limit.  Feed batches whose event time
    // advances well past both watermark delays and read the state-store
    // metrics after each — the footprint must plateau at the recent
    // window, never track total rows ingested.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[E]
    val purchases = MemoryStream[E]
    val q = purchaseClickJoin(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssjoin_state").outputMode("append").start()
    try {
      // 16 batches, event time stepping 200 min — far beyond the 2 h click
      // watermark + 1 h range, so each batch expires its predecessors
      val totals = (1 to 16).map { i =>
        clicks.addData(E(1000L + i, ts(i * 200L), 1, "click"))
        purchases.addData(E(2000L + i, ts(i * 200L), 1, "purchase"))
        q.processAllAvailable()
        q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      }
      // 32 rows ingested; the plateau must hold only the un-expired tail
      assert(totals.last <= 8,
        s"state after 16 batches holds ${totals.last} rows — not evicting (series: $totals)")
      assert(totals.drop(8).max <= totals.take(8).max,
        s"state still growing after watermarks advanced (series: $totals)")
    } finally q.stop()
  }
}
