package graft.io

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the registered transactional sink: append mode ingests
  * exactly-once (wiped-checkpoint replays are fence-voided), update
  * mode merges streaming aggregates to the batch answer, and the
  * source+sink compose into a fenced table-to-table pipeline. */
class GraftSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newBase() =
    s"/tmp/graft_sink_spec/${java.util.UUID.randomUUID()}"

  test("append mode: file stream lands exactly-once; checkpoint wipe is fence-voided") {
    val b = newBase()
    val files = s"$b/files"; val dst = s"$b/dst"; val ckpt = s"$b/ckpt"
    val rows = (1L to 300L).map(i => (i, i % 7)).toDF("id", "m")
    rows.repartition(3).write.parquet(files)
    def run(): Unit = {
      val q = spark.readStream.schema(spark.read.parquet(files).schema)
        .option("maxFilesPerTrigger", 1).parquet(files)
        .writeStream.format("graft.io.GraftSinkProvider")
        .option("path", dst).option("checkpointLocation", ckpt)
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }
    run()
    val v = Versioned.currentVersion(spark, dst)
    assert(v >= 3, "one fenced commit per micro-batch")
    assert(Versioned.readAt(spark, dst, v).count() == 300)
    // history shows the fenced stream appends
    assert(Versioned.history(spark, dst).select("op").as[Option[String]]
      .collect().forall(_.contains("stream-append")))
    // wiped checkpoint: every replayed batch id is already fenced
    val cp = new org.apache.hadoop.fs.Path(ckpt)
    Versioned.fs(spark, cp).delete(cp, true)
    run()
    assert(Versioned.currentVersion(spark, dst) == v, "replays must be voided")
    assert(Versioned.readAt(spark, dst, v).count() == 300)
  }

  test("update mode: streaming aggregate merges to the batch answer") {
    val b = newBase()
    val files = s"$b/files"; val dst = s"$b/dst"; val ckpt = s"$b/ckpt"
    val rows = (1L to 400L).map(i => (i % 10, i)).toDF("g", "x")
    rows.repartition(4).write.parquet(files)
    val q = spark.readStream.schema(spark.read.parquet(files).schema)
      .option("maxFilesPerTrigger", 1).parquet(files)
      .groupBy(col("g")).agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .writeStream.format("graft.io.GraftSinkProvider")
      .option("path", dst).option("key", "g")
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val got = Versioned.readAt(spark, dst, Versioned.currentVersion(spark, dst))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val want = rows.groupBy(col("g")).agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == want, "update-mode merge must land the batch aggregate")
  }

  test("table-to-table: graft source feeds graft sink, both ends fenced") {
    val b = newBase()
    val src = s"$b/src"; val dst = s"$b/dst"; val ckpt = s"$b/ckpt"
    Versioned.commitAppendClustered(spark, src,
      (1L to 200L).map(i => (i, i % 5)).toDF("id", "m"), "id", 4)
    def follow(): Unit = {
      val q = spark.readStream.format("graft.io.ChangeFeedSourceProvider")
        .option("path", src).option("key", "id")
        .load()
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .select(col("id"), col("m"))
        .writeStream.format("graft.io.GraftSinkProvider")
        .option("path", dst).option("key", "id").option("mode", "merge")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }
    follow()
    assert(Versioned.readAt(spark, dst, Versioned.currentVersion(spark, dst))
      .count() == 200)
    // the source advances (merge bumps a window); the follower converges
    Versioned.commitMerge(spark, src,
      (50L to 80L).map(i => (i, 99L)).toDF("id", "m"), "id")
    follow()
    val got = Versioned.readAt(spark, dst, Versioned.currentVersion(spark, dst))
    assert(got.count() == 200)
    assert(got.filter(col("m") === 99L).count() == 31,
      "the upstream merge must propagate through the pipeline")
  }

  test("clustered append mode keeps the zone map live from ingest on") {
    val b = newBase()
    val files = s"$b/files"; val dst = s"$b/dst"; val ckpt = s"$b/ckpt"
    // time-keyed micro-batches: each file a disjoint id window
    (0 until 4).foreach(k =>
      (k * 500L until (k + 1) * 500L).map(i => (i, i % 3)).toDF("id", "m")
        .coalesce(1).write.parquet(s"$files/part$k"))
    val q = spark.readStream.schema(spark.read.parquet(s"$files/part0").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$files/part*")
      .writeStream.format("graft.io.GraftSinkProvider")
      .option("path", dst).option("statsCol", "id").option("buckets", "4")
      .option("checkpointLocation", ckpt)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val v = Versioned.currentVersion(spark, dst)
    assert(Versioned.readAt(spark, dst, v).count() == 2000)
    // every dir carries a tight stats entry and a narrow probe prunes
    val st = Versioned.dirStats(spark, dst, v)
    val dirs = Versioned.manifest(spark, dst, v)
    assert(dirs.forall(st.contains), "every streamed bucket must be measured")
    val probe = Versioned.readRange(spark, dst, v, 100L, 140L)
    assert(probe.count() == 41)
    val read = dirs.count(d => probe.inputFiles.exists(_.contains(s"/$d/")))
    assert(read < dirs.size / 2,
      s"the streamed zone map must prune ($read of ${dirs.size} dirs read)")
    // steady state: nothing for maintenance to heal on a time-keyed stream
    assert(Versioned.maintain(spark, dst).isEmpty)
  }

  test("deleteOn: CDC deletes physically evict — the follower is a true replica") {
    val b = newBase()
    val src = s"$b/src"; val dst = s"$b/dst"; val ckpt = s"$b/ckpt"
    // groups A (ids 1..5) and B (ids 6..10)
    Versioned.commitAppendClustered(spark, src,
      (1L to 10L).map(i => (i, if (i <= 5) "A" else "B", i)).toDF("id", "g", "m"),
      "id", 2)
    def follow(): Unit = {
      val q = spark.readStream
        .format("graft.io.ChangeFeedSourceProvider")
        .option("path", src).option("key", "id").load()
        .filter(col("_change_type") =!= "update_preimage")
        .select(col("id"), col("g"), col("m"), col("_change_type"))
        .writeStream.format("graft.io.GraftSinkProvider")
        .option("path", dst).option("key", "id").option("mode", "merge")
        .option("deleteOn", "_change_type = 'delete'")
        .option("dropCols", "_change_type")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }
    follow()
    // v2 wipes group B ENTIRELY at the source
    Versioned.commitUpdate(spark, src, col("g") === "B",
      d => d.filter(col("g") =!= "B"))
    follow()
    // the follower physically dropped the group: a raw, unfiltered read
    // of the head has no B rows and no tombstone column
    val got = Versioned.readAt(spark, dst, Versioned.currentVersion(spark, dst))
    assert(got.columns.toSeq == Seq("id", "g", "m"), "no tombstone column lands")
    assert(got.filter(col("g") === "B").count() == 0,
      "a full-group delete must physically leave the follower")
    val want = Versioned.readAt(spark, src, Versioned.currentVersion(spark, src))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("composite key option: an (hi, lo)-keyed table streams end-to-end") {
    val b = newBase()
    val src = s"$b/src"; val dst = s"$b/dst"; val ckpt = s"$b/ckpt"
    val rows = (1L to 30L).map(i => (i % 5, i / 5, i)).toDF("hi", "lo", "m")
    Versioned.commit(spark, src, rows)
    def follow(): Unit = {
      val q = spark.readStream
        .format("graft.io.ChangeFeedSourceProvider")
        .option("path", src).option("key", "hi,lo").load()
        .filter(col("_change_type") =!= "update_preimage")
        .select(col("hi"), col("lo"), col("m"), col("_change_type"))
        .writeStream.format("graft.io.GraftSinkProvider")
        .option("path", dst).option("key", "hi,lo").option("mode", "merge")
        .option("deleteOn", "_change_type = 'delete'")
        .option("dropCols", "_change_type")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }
    follow()
    // composite MERGE (every-column matching) + a CoW delete upstream
    Versioned.commitMergeKeys(spark, src,
      Seq((1L, 0L, 101L), (2L, 3L, 102L), (0L, 9L, 103L)).toDF("hi", "lo", "m"),
      Seq("hi", "lo"))
    Versioned.commitUpdate(spark, src, col("hi") === 4L,
      d => d.filter(col("hi") =!= 4L))
    follow()
    val got = Versioned.readAt(spark, dst, Versioned.currentVersion(spark, dst))
    val want = Versioned.readAt(spark, src, Versioned.currentVersion(spark, src))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "the (hi, lo)-keyed follower must equal the source head")
    // the natural key really drove the merge: (1, 0) updated in place
    assert(got.filter(col("hi") === 1L && col("lo") === 0L)
      .select("m").head().getLong(0) == 101L)
  }

  test("option and mode validation") {
    val b = newBase()
    val e1 = intercept[Exception] {
      spark.readStream.format("rate").load()
        .writeStream.format("graft.io.GraftSinkProvider")
        .option("checkpointLocation", s"$b/c1").start()
    }
    assert(e1.getMessage.contains("path"))
    val e2 = intercept[Exception] {
      spark.readStream.format("rate").load()
        .writeStream.format("graft.io.GraftSinkProvider")
        .option("path", s"$b/t").option("mode", "merge")
        .option("checkpointLocation", s"$b/c2").start()
    }
    assert(e2.getMessage.contains("key"))
  }
}
