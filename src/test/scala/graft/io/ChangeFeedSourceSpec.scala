package graft.io

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the registered streaming change-feed source: readStream →
  * foreachBatch with fenced commits equals the batch recompute, a
  * checkpointed resume delivers only the delta, and a WIPED checkpoint
  * replays exactly-once (the redelivered feed's fences are already
  * applied). */
class ChangeFeedSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newBase() =
    s"/tmp/graft_cdf_source/${java.util.UUID.randomUUID()}"

  private def chain(src: String): Unit = {
    Versioned.commitAppendClustered(spark, src,
      (1L to 20L).map(i => (i, i)).toDF("id", "m"), "id", 4)
    Versioned.commitMerge(spark, src,
      ((5L to 8L).map(i => (i, i + 100L)) ++ (21L to 25L).map(i => (i, i)))
        .toDF("id", "m"), "id")
    Versioned.commitUpdate(spark, src, col("id") % 2 === 0,
      d => d.filter(col("id") % 2 =!= 0))
  }

  /** Fenced fold sink: per-batch ±delta into a one-row (cnt, sum). */
  private def fold(agg: String)(feed: DataFrame, fence: Long): Unit = {
    val add = col("_change_type").isin("insert", "update_postimage")
    val d = feed.agg(
      sum(when(add, 1L).otherwise(-1L)).as("d_cnt"),
      sum(when(add, col("m")).otherwise(-col("m"))).as("d_m"))
      .withColumn("k", lit(0L))
    val head = Versioned.currentVersion(spark, agg)
    if (head == 0)
      Versioned.commitBatch(spark, agg, fence,
        d.select(col("k"), col("d_cnt").as("cnt"), col("d_m").as("s")))
    else {
      val cur = Versioned.readAt(spark, agg, head)
      Versioned.commitMergeBatch(spark, agg, fence,
        d.join(cur, Seq("k"), "left").select(col("k"),
          (coalesce(col("cnt"), lit(0L)) + col("d_cnt")).as("cnt"),
          (coalesce(col("s"), lit(0L)) + col("d_m")).as("s")), "k")
    }
    ()
  }

  private def state(agg: String): (Long, Long) = {
    val r = Versioned.readAt(spark, agg, Versioned.currentVersion(spark, agg))
      .select("cnt", "s").head()
    (r.getLong(0), r.getLong(1))
  }

  private def recompute(src: String): (Long, Long) = {
    val r = Versioned.readAt(spark, src, Versioned.currentVersion(spark, src))
      .agg(count(lit(1)), sum(col("m"))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def run(src: String, agg: String, ckpt: String): Unit = {
    val q = spark.readStream
      .format("graft.io.ChangeFeedSourceProvider")
      .option("path", src).option("key", "id")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((b: DataFrame, id: Long) => fold(agg)(b, id))
      .start()
    try { q.processAllAvailable() } finally q.stop()
  }

  test("readStream e2e: fenced sink = recompute; resume = delta; wipe = exactly-once") {
    val b = newBase()
    val src = s"$b/src"; val agg = s"$b/agg"; val ckpt = s"$b/ckpt"
    chain(src)
    run(src, agg, ckpt)
    assert(state(agg) == recompute(src), "streamed fold must equal the recompute")
    // the source advances; a checkpointed RESUME delivers only the delta
    Versioned.commitAppend(spark, src, Seq((100L, 100L)).toDF("id", "m"))
    run(src, agg, ckpt)
    assert(state(agg) == recompute(src), "resume must fold exactly the new delta")
    // WIPED checkpoint: the engine replays the whole feed from version 0
    // as batch 0 — but every fence it would land is already applied, so
    // the sink skips and state is untouched (exactly-once without the
    // checkpoint)
    val cp = new org.apache.hadoop.fs.Path(ckpt)
    Versioned.fs(spark, cp).delete(cp, true)
    run(src, agg, ckpt)
    assert(state(agg) == recompute(src),
      "a wiped-checkpoint replay must not double-fold")
  }

  test("maxVersionsPerTrigger drains a backlog as bounded micro-batches") {
    val b = newBase()
    val src = s"$b/src"; val agg = s"$b/agg"; val ckpt = s"$b/ckpt"
    chain(src) // 3 commits BEFORE the stream starts: the backlog case
    var batches = 0
    val q = spark.readStream
      .format("graft.io.ChangeFeedSourceProvider")
      .option("path", src).option("key", "id")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (feed: DataFrame, id: Long) =>
        batches += 1; fold(agg)(feed, id)
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    assert(batches == 3,
      s"a 3-commit backlog at maxVersionsPerTrigger=1 must drain as 3 batches, got $batches")
    assert(state(agg) == recompute(src))
    // the cap watermark survives a restart: one more commit, resume —
    // exactly the delta arrives, still capped
    Versioned.commitAppend(spark, src, Seq((200L, 200L)).toDF("id", "m"))
    var batches2 = 0
    val q2 = spark.readStream
      .format("graft.io.ChangeFeedSourceProvider")
      .option("path", src).option("key", "id")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (feed: DataFrame, id: Long) =>
        batches2 += 1; fold(agg)(feed, id)
      }
      .start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(batches2 == 1, s"the resume must deliver exactly the delta, got $batches2")
    assert(state(agg) == recompute(src))
  }

  test("maxRowsPerTrigger: a 10-dir commit streams as bounded chunk batches") {
    val b = newBase()
    val src = s"$b/src"; val agg = s"$b/agg"; val ckpt = s"$b/ckpt"
    // ONE commit lands 10 clustered dirs of ~100 rows each
    Versioned.commitAppendClustered(spark, src,
      (0L until 1000L).map(i => (i, i)).toDF("id", "m"), "id", 10)
    var batches = 0; var maxBatchRows = 0L
    val q = spark.readStream
      .format("graft.io.ChangeFeedSourceProvider")
      .option("path", src).option("key", "id")
      .option("maxRowsPerTrigger", "250")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (feed: DataFrame, id: Long) =>
        batches += 1
        maxBatchRows = math.max(maxBatchRows, feed.count())
        fold(agg)(feed, id)
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    assert(batches >= 3,
      s"a 1000-row commit at maxRowsPerTrigger=250 must stream as chunks, got $batches")
    assert(maxBatchRows <= 250L, s"chunk cap violated: $maxBatchRows rows")
    assert(state(agg) == recompute(src))
    // the chunk cursor survives a restart: a new commit resumes cleanly
    Versioned.commitAppend(spark, src, Seq((2000L, 2000L)).toDF("id", "m"))
    val q2 = spark.readStream
      .format("graft.io.ChangeFeedSourceProvider")
      .option("path", src).option("key", "id")
      .option("maxRowsPerTrigger", "250")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((feed: DataFrame, id: Long) => fold(agg)(feed, id))
      .start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(state(agg) == recompute(src))
  }

  test("includeCommitVersions stamps per-commit provenance on the stream") {
    val b = newBase()
    val src = s"$b/src"; val out = s"$b/out"; val ckpt = s"$b/ckpt"
    chain(src)
    val q = spark.readStream
      .format("graft.io.ChangeFeedSourceProvider")
      .option("path", src).option("key", "id")
      .option("includeCommitVersions", "true")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (feed: DataFrame, id: Long) =>
        Versioned.commitBatch(spark, out, id, feed); ()
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val got = Versioned.readAt(spark, out, Versioned.currentVersion(spark, out))
    assert(got.columns.takeRight(3).toSeq ==
      Seq("_change_type", "_commit_version", "_commit_timestamp"))
    // the streamed relation equals changesByCommit over the same span
    val want = ChangeFeed.changesByCommit(spark, src, 0, 3, "id")
      .select(got.columns.map(col).toSeq: _*)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // per-commit history preserved through the stream: id 22 shows both
    assert(got.filter(col("id") === 22L).count() == 2)
  }

  test("mid-stream upstream ALTER fails loudly; a restarted stream picks up the new schema") {
    val b = newBase()
    val src = s"$b/src"; val out1 = s"$b/out1"; val out2 = s"$b/out2"
    val ckpt = s"$b/ckpt"
    Versioned.commit(spark, src, Seq((1L, 10L), (2L, 20L)).toDF("id", "m"))
    def start(out: String) = spark.readStream
      .format("graft.io.ChangeFeedSourceProvider")
      .option("path", src).option("key", "id").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (feed: DataFrame, id: Long) =>
        Versioned.commitBatch(spark, out, id, feed); ()
      }
      .start()
    val q1 = start(out1)
    try q1.processAllAvailable() finally ()
    // upstream evolves while the stream runs: the next batch must fail
    // LOUDLY (named columns), never silently mis-map the renamed column
    Versioned.commitAlterRename(spark, src, "m", "metric")
    Versioned.commitAppend(spark, src, Seq((3L, 30L)).toDF("id", "metric"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("evolved its schema")),
      s"expected the schema-evolution contract error, got: ${e.getMessage}")
    // a restarted stream (same checkpoint — offsets are table versions)
    // resolves the evolved schema and delivers the pending delta under it
    val q2 = start(out2)
    try q2.processAllAvailable() finally q2.stop()
    val got = Versioned.readAt(spark, out2, Versioned.currentVersion(spark, out2))
    assert(got.columns.toSeq == Seq("id", "metric", "_change_type"))
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq((3L, 30L, "insert")))
  }

  test(".schema(...) starts a stream on a not-yet-written table") {
    val b = newBase()
    val src = s"$b/src"; val out = s"$b/out"; val ckpt = s"$b/ckpt"
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sch = StructType(Seq(StructField("id", LongType), StructField("m", LongType)))
    val df = spark.readStream.format("graft.io.ChangeFeedSourceProvider")
      .schema(sch).option("path", src).option("key", "id").load()
    assert(df.schema.fieldNames.toSeq == Seq("id", "m", "_change_type"))
    val q = df.writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (feed: DataFrame, id: Long) =>
        Versioned.commitBatch(spark, out, id, feed); ()
      }
      .start()
    try {
      q.processAllAvailable() // table still unborn: no batch fires
      assert(Versioned.currentVersion(spark, out) == 0)
      Versioned.commit(spark, src, Seq((1L, 10L)).toDF("id", "m"))
      q.processAllAvailable()
    } finally q.stop()
    val got = Versioned.readAt(spark, out, Versioned.currentVersion(spark, out))
    assert(got.columns.toSeq == Seq("id", "m", "_change_type"))
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq((1L, 10L, "insert")))
  }

  test("option validation and schema") {
    val b = newBase(); val src = s"$b/src"
    Versioned.commit(spark, src, Seq((1L, 2L)).toDF("id", "m"))
    val df = spark.readStream.format("graft.io.ChangeFeedSourceProvider")
      .option("path", src).option("key", "id").load()
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq == Seq("id", "m", "_change_type"))
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft.io.ChangeFeedSourceProvider")
        .option("key", "id").load()
    }
  }
}
