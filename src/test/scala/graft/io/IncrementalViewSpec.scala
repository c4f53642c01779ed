package graft.io

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for copy-on-write updates and incremental MV maintenance: the
  * refreshed MV must equal a full recompute under appends, deletes and
  * group-migrating updates (including groups vanishing and being born),
  * and commitUpdate must rewrite ONLY the dirs containing matched rows,
  * carrying every other dir into the new manifest verbatim. */
class IncrementalViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_ivm_spec/${java.util.UUID.randomUUID()}"

  private val keys = Seq("k")
  private val measures = Seq("cnt" -> lit(1L), "sum_m" -> col("m"))

  private def build(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("cnt"), sum(col("m")).as("sum_m"))

  private def asMap(df: DataFrame): Map[String, (Long, Long)] =
    df.select("k", "cnt", "sum_m").as[(String, Long, Long)]
      .collect().map { case (k, c, s) => k -> (c, s) }.toMap

  test("append refresh equals the full recompute") {
    val root = newRoot()
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("id", "k", "m")
    Versioned.commit(spark, root, base)
    val mv1 = build(Versioned.readAt(spark, root, 1))
    Versioned.commitAppend(spark, root,
      Seq((4L, "b", 7L), (5L, "c", 1L)).toDF("id", "k", "m"))
    val mv2 = IncrementalView.refresh(mv1, Versioned.diff(spark, root, 1, 2), keys, measures)
    assert(asMap(mv2) == asMap(build(Versioned.readAt(spark, root, 2))))
    assert(asMap(mv2) == Map("a" -> (2L, 30L), "b" -> (2L, 12L), "c" -> (1L, 1L)))
  }

  test("null group keys merge instead of duplicating (null-safe join)") {
    val root = newRoot()
    val base = Seq((1L, "a", 10L), (2L, null, 20L), (3L, null, 30L))
      .toDF("id", "k", "m")
    Versioned.commit(spark, root, base)
    val mv1 = build(Versioned.readAt(spark, root, 1))
    // append more null-keyed rows: the null group must FOLD into the
    // existing null MV row, not appear beside it
    Versioned.commitAppend(spark, root,
      Seq((4L, null, 5L), (5L, "a", 1L)).toDF("id", "k", "m"))
    val mv2 = IncrementalView.refresh(mv1, Versioned.diff(spark, root, 1, 2), keys, measures)
    assert(mv2.count() == 2, "one row per group, null group included")
    val nullRow = mv2.filter(col("k").isNull)
      .select("cnt", "sum_m").as[(Long, Long)].collect().toSeq
    assert(nullRow == Seq((3L, 55L)))
    // and the null group's counts CANCEL under delete, vanishing it
    Versioned.commitUpdate(spark, root, col("k").isNull, d => d.filter(col("k").isNotNull))
    val mv3 = IncrementalView.refresh(mv2, Versioned.diff(spark, root, 2, 3), keys, measures)
    assert(asMap(mv3) == Map("a" -> (2L, 11L)))
    assert(asMap(mv3) == asMap(build(Versioned.readAt(spark, root, 3))))
  }

  test("group-migrating update: old group vanishes, new group is born") {
    val root = newRoot()
    Versioned.commit(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 30L)).toDF("id", "k", "m"))
    val mv1 = build(Versioned.readAt(spark, root, 1))
    // relabel ALL of group a to group z: a must vanish, z must appear
    Versioned.commitUpdate(spark, root, col("k") === "a",
      d => d.withColumn("k", when(col("k") === "a", lit("z")).otherwise(col("k"))))
    val mv2 = IncrementalView.refresh(mv1, Versioned.diff(spark, root, 1, 2), keys, measures)
    assert(asMap(mv2) == Map("b" -> (2L, 50L), "z" -> (1L, 10L)))
    assert(asMap(mv2) == asMap(build(Versioned.readAt(spark, root, 2))))
  }

  test("delete refresh drops rows and vanished groups") {
    val root = newRoot()
    Versioned.commit(spark, root,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("id", "k", "m"))
    val mv1 = build(Versioned.readAt(spark, root, 1))
    // delete group b entirely and one of group a's rows
    Versioned.commitUpdate(spark, root, col("k") === "b" || col("id") === 2L,
      d => d.filter(!(col("k") === "b" || col("id") === 2L)))
    val mv2 = IncrementalView.refresh(mv1, Versioned.diff(spark, root, 1, 2), keys, measures)
    assert(asMap(mv2) == Map("a" -> (1L, 10L)))
  }

  test("commitUpdate rewrites only the touched dirs") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, Seq((1L, "a", 1L)).toDF("id", "k", "m"))
    Versioned.commitAppend(spark, root, Seq((2L, "b", 2L)).toDF("id", "k", "m"))
    val m2 = Versioned.manifest(spark, root, 2)
    assert(m2.size == 2)
    // pred matches rows only in the second dir
    Versioned.commitUpdate(spark, root, col("k") === "b",
      d => d.withColumn("m", when(col("k") === "b", col("m") * 10).otherwise(col("m"))))
    val m3 = Versioned.manifest(spark, root, 3)
    assert(m3.size == 2)
    assert(m3.contains(m2.head), "untouched dir must carry through verbatim")
    assert(!m3.contains(m2(1)), "touched dir must be replaced")
    assert(Versioned.readAt(spark, root, 3)
      .as[(Long, String, Long)].collect().sorted.toSeq ==
      Seq((1L, "a", 1L), (2L, "b", 20L)))
    // time travel unaffected: v2 still reads the pre-update rows
    assert(Versioned.readAt(spark, root, 2)
      .as[(Long, String, Long)].collect().sorted.toSeq ==
      Seq((1L, "a", 1L), (2L, "b", 2L)))
  }

  test("no-match update commits a version with the same dirs") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a", 1L)).toDF("id", "k", "m"))
    Versioned.commitUpdate(spark, root, col("k") === "nope", d => d)
    assert(Versioned.manifest(spark, root, 2) == Versioned.manifest(spark, root, 1))
    assert(Versioned.diff(spark, root, 1, 2).count() == 0)
  }

  test("streaming MV: foreachBatch ingest keeps the MV fresh, replays are no-ops") {
    val root = newRoot()
    val src = s"$root/src"; val table = s"$root/table"
    (1 to 4).foreach { i =>
      Seq((i.toLong, s"k${i % 2}", i.toLong)).toDF("id", "k", "m").coalesce(1)
        .write.mode("append").parquet(src)
    }
    // MV state on the driver; refreshed ONLY when the fence admits the batch
    var mv = build(Seq.empty[(Long, String, Long)].toDF("id", "k", "m"))
    var refreshes = 0
    def ingest(cp: String): Unit = {
      val q = spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Versioned.commitBatch(spark, table, id, b).foreach { v =>
            mv = IncrementalView.refresh(mv,
              Versioned.diff(spark, table, v - 1, v), keys, measures)
              .localCheckpoint()
            refreshes += 1
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    ingest(s"$root/ckpt")
    val head = Versioned.currentVersion(spark, table)
    assert(refreshes == head && head >= 1)
    assert(asMap(mv) == asMap(build(Versioned.readAt(spark, table, head))))
    assert(asMap(mv) == Map("k0" -> (2L, 6L), "k1" -> (2L, 4L)))
    ingest(s"$root/ckpt2") // wiped checkpoint: every batch replays from 0
    assert(refreshes == head, "fenced replays must not refresh the MV")
    assert(asMap(mv) == Map("k0" -> (2L, 6L), "k1" -> (2L, 4L)))
  }

  test("refreshTo: the MV heals a crash between table commit and refresh") {
    val root = newRoot()
    val table = s"$root/table"; val mv = s"$root/mv"
    Versioned.commit(spark, table,
      (1L to 10L).map(i => (i, s"k${i % 2}", i)).toDF("id", "k", "m"))
    Versioned.commitSnapshotBatch(spark, mv, 1L,
      build(Versioned.readAt(spark, table, 1)))
    // batches 10 and 11 land, but the "process crashed" before any
    // refresh ran — the MV is two table versions behind
    Versioned.commitBatch(spark, table, 10L,
      Seq((11L, "k0", 100L)).toDF("id", "k", "m"))
    Versioned.commitBatch(spark, table, 11L,
      Seq((12L, "k1", 200L)).toDF("id", "k", "m"))
    // one poll jumps the whole gap, fenced at the table head
    assert(IncrementalView.refreshTo(spark, table, mv, keys, measures).nonEmpty)
    val mvNow = Versioned.readAt(spark, mv, Versioned.currentVersion(spark, mv))
    assert(asMap(mvNow) == asMap(build(Versioned.readAt(spark, table, 3))))
    // a replayed poll is a no-op: version and content unchanged
    val vMv = Versioned.currentVersion(spark, mv)
    assert(IncrementalView.refreshTo(spark, table, mv, keys, measures).isEmpty)
    assert(Versioned.currentVersion(spark, mv) == vMv)
  }

  test("zone map: readRange prunes non-overlapping dirs before any file I/O") {
    val root = newRoot()
    Versioned.commitAppend(spark, root,
      (1L to 100L).map(i => (i, "a", i)).toDF("id", "k", "m"), statsCol = Some("id"))
    Versioned.commitAppend(spark, root,
      (101L to 200L).map(i => (i, "b", i)).toDF("id", "k", "m"))
    Versioned.commitAppend(spark, root,
      (201L to 300L).map(i => (i, "c", i)).toDF("id", "k", "m"))
    // statsCol inherited by later commits; stats cover all three dirs
    assert(Versioned.statsColOf(spark, root, 3).contains("id"))
    val st = Versioned.dirStats(spark, root, 3)
    assert(st.size == 3 && st.values.toSet == Set((1L, 100L), (101L, 200L), (201L, 300L)))
    val r = Versioned.readRange(spark, root, 3, 120L, 180L)
    assert(r.as[(Long, String, Long)].collect().map(_._1).sorted.toSeq == (120L to 180L))
    // the scan must touch ONLY the middle dir's files
    val m3 = Versioned.manifest(spark, root, 3)
    val middle = m3.find(d => st(d) == (101L, 200L)).get
    assert(r.inputFiles.nonEmpty && r.inputFiles.forall(_.contains(s"/$middle/")),
      s"expected a single-dir scan, got ${r.inputFiles.mkString(",")}")
    // a miss range reads nothing but stays a well-typed empty relation
    assert(Versioned.readRange(spark, root, 3, 1000L, 2000L).count() == 0)
    // CoW update re-measures the rewritten dir's stats
    Versioned.commitUpdate(spark, root, col("id") === 150L,
      d => d.withColumn("id", when(col("id") === 150L, lit(5000L)).otherwise(col("id"))))
    val st4 = Versioned.dirStats(spark, root, 4)
    assert(st4.values.toSet.contains((101L, 5000L)))
    assert(Versioned.readRange(spark, root, 4, 4999L, 5001L)
      .as[(Long, String, Long)].collect().map(_._1).toSeq == Seq(5000L))
  }

  test("AS OF timestamp resolves the snapshot live at that wall clock") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a", 1L)).toDF("id", "k", "m"))
    val t1 = Versioned.tsOf(spark, root, 1)
    Thread.sleep(5)
    Versioned.commitAppend(spark, root, Seq((2L, "b", 2L)).toDF("id", "k", "m"))
    val t2 = Versioned.tsOf(spark, root, 2)
    assert(t1 <= t2, "commit timestamps must be monotone along the log")
    assert(Versioned.versionAt(spark, root, t1) == 1)
    assert(Versioned.versionAt(spark, root, t2 + 1000) == 2)
    assert(Versioned.readAsOf(spark, root, t1).count() == 1)
    assert(Versioned.readAsOf(spark, root, t2).count() == 2)
    intercept[IllegalArgumentException](Versioned.versionAt(spark, root, t1 - 1000000))
  }

  test("clustered append: shuffled input lands as near-disjoint bucket dirs") {
    val root = newRoot()
    // adversarial layout: ids arrive hash-shuffled, so a plain append
    // would give one dir spanning [0,3999] and zone maps would prune
    // nothing inside the ingest
    val shuffled = spark.range(0, 4000)
      .select(col("id"), lit("x").as("k"), (col("id") % 7).as("m"))
      .repartition(8, expr("hash(id)"))
    Versioned.commitAppendClustered(spark, root, shuffled, "id", buckets = 8)
    val st = Versioned.dirStats(spark, root, 1)
    assert(st.size == 8, s"each range bucket must be its own manifest dir, got ${st.size}")
    // buckets tile [0,3999] without overlap
    val spans = st.values.toSeq.sortBy(_._1)
    assert(spans.head._1 == 0L && spans.last._2 == 3999L)
    spans.sliding(2).foreach { case Seq((_, hi), (lo, _)) => assert(hi < lo) }
    val r = Versioned.readRange(spark, root, 1, 100L, 150L)
    assert(r.as[(Long, String, Long)].collect().map(_._1).sorted.toSeq == (100L to 150L))
    // dir-level pruning: the window overlaps at most 2 of the 8 buckets
    val parents = r.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(parents.length <= 2, s"expected <=2 bucket dirs, got ${parents.mkString(",")}")
    // streaming ingest inherits the declared zone-map column
    Versioned.commitBatch(spark, root, 1L,
      Seq((9000L, "y", 1L)).toDF("id", "k", "m"))
    val st2 = Versioned.dirStats(spark, root, 2)
    assert(st2.values.toSet.contains((9000L, 9000L)),
      "commitBatch must measure stats for its new dir via the inherited statsCol")
    // vacuum understands bucket-nested manifest entries: after a full
    // compaction only the fresh dir survives on disk
    Versioned.commit(spark, root, Versioned.readAt(spark, root, 2))
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    assert(new java.io.File(s"$root/data").listFiles().count(_.isDirectory) == 1)
    assert(Versioned.readAt(spark, root, 3).count() == 4001)
  }

  test("racing append during a CoW update: neither commit is lost") {
    val root = newRoot()
    Versioned.commit(spark, root,
      (1L to 100L).map(i => (i, "a", i)).toDF("id", "k", "m"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fu = Future(Versioned.commitUpdate(spark, root, col("id") <= 50L,
      d => d.withColumn("m", when(col("id") <= 50L, col("m") * 100).otherwise(col("m")))))
    val fa = Future(Versioned.commitAppend(spark, root,
      Seq((999L, "z", 999L)).toDF("id", "k", "m")))
    val (vu, va) = (Await.result(fu, 2.minutes), Await.result(fa, 2.minutes))
    assert(Set(vu, va) == Set(2, 3), s"got versions $vu/$va")
    val head = Versioned.readAt(spark, root, 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(head.length == 101, "the append must survive the racing update")
    assert(head.last == ((999L, "z", 999L)))
    assert(head.take(50).forall { case (i, _, m) => m == i * 100 },
      "the update must survive the racing append")
    assert(head.slice(50, 100).forall { case (i, _, m) => m == i })
  }

  test("clustering-preserving compaction keeps pruning sharp, history intact") {
    val root = newRoot()
    // fragmented history: 6 appends + a merge leave many dirs
    (0 until 6).foreach { i =>
      Versioned.commitAppendClustered(spark, root,
        (i * 100L until (i + 1) * 100L).map(j => (j, "a", j)).toDF("id", "k", "m"),
        "id", buckets = 4)
    }
    Versioned.commitMerge(spark, root,
      Seq((250L, "M", 9999L)).toDF("id", "k", "m"), "id")
    val vC = Versioned.compactClustered(spark, root, "id", buckets = 4)
      .getOrElse(fail("uncontended compaction must land"))
    val mC = Versioned.manifest(spark, root, vC)
    assert(mC.size == 4, s"compaction must land exactly the bucket dirs, got ${mC.size}")
    // content identical to the pre-compaction head
    assert(Versioned.readAt(spark, root, vC)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq ==
      Versioned.readAt(spark, root, vC - 1)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq)
    // pruning stays sharp after compaction: a narrow window reads 1 dir
    val r = Versioned.readRange(spark, root, vC, 10L, 20L)
    assert(r.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.length == 1)
    assert(r.count() == 11)
    // old versions still readable until vacuum; vacuum then reclaims
    assert(Versioned.readAt(spark, root, 3).count() == 300)
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    assert(Versioned.readAt(spark, root, vC).count() == 600)
    intercept[Exception](Versioned.readAt(spark, root, 3).count())
  }

  test("commitMerge: matched rows replaced, unmatched inserted, other dirs verbatim") {
    val root = newRoot()
    Versioned.commitAppend(spark, root,
      (1L to 50L).map(i => (i, "a", i)).toDF("id", "k", "m"))
    Versioned.commitAppend(spark, root,
      (51L to 100L).map(i => (i, "b", i)).toDF("id", "k", "m"))
    val m2 = Versioned.manifest(spark, root, 2)
    // updates match only the second dir's keys, plus brand-new keys
    val updates = Seq((60L, "B", 6000L), (70L, "B", 7000L), (200L, "n", 200L))
      .toDF("id", "k", "m")
    val v = Versioned.commitMerge(spark, root, updates, "id")
    assert(v == 3)
    val m3 = Versioned.manifest(spark, root, 3)
    assert(m3.contains(m2.head), "unmatched dir must carry through verbatim")
    assert(!m3.contains(m2(1)), "matched dir must be rewritten")
    val got = Versioned.readAt(spark, root, 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // merge semantics = latest-wins recompute
    val want = ((1L to 100L).map(i =>
      (i, if (i == 60 || i == 70) "B" else if (i <= 50) "a" else "b",
        if (i == 60) 6000L else if (i == 70) 7000L else i)) :+ ((200L, "n", 200L))).toSeq
    assert(got == want)
    // time travel unaffected
    assert(Versioned.readAt(spark, root, 2).count() == 100)
    // the refresh algebra holds across a merge too
    val mv2 = build(Versioned.readAt(spark, root, 2))
    val mv3 = IncrementalView.refresh(mv2, Versioned.diff(spark, root, 2, 3), keys, measures)
    assert(asMap(mv3) == asMap(build(Versioned.readAt(spark, root, 3))))
  }

  test("judged q_table_merge equals the expression recompute at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.Queries.queries("q_table_merge")(spark, sfDir)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val want = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 10 < 8 && col("doc_id").between(260, 490),
          col("n_chars") + 1000).otherwise(col("n_chars")).as("n_chars"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("vacuumOlderThan keeps the retention window readable, reclaims the rest") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a", 1L)).toDF("id", "k", "m"))
    Thread.sleep(5)
    val cut = System.currentTimeMillis()
    Thread.sleep(5)
    Versioned.commit(spark, root, Seq((2L, "b", 2L)).toDF("id", "k", "m"))
    Versioned.commitAppend(spark, root, Seq((3L, "c", 3L)).toDF("id", "k", "m"))
    Versioned.vacuumOlderThan(spark, root, cut, graceMs = 0)
    // v2 and v3 are inside the window; v1 predates it and is reclaimed
    assert(Versioned.readAt(spark, root, 3).count() == 2)
    assert(Versioned.readAt(spark, root, 2).count() == 1)
    intercept[Exception](Versioned.readAt(spark, root, 1).count())
    // a cut in the future still keeps the head readable
    Versioned.vacuumOlderThan(spark, root, System.currentTimeMillis() + 1000000, graceMs = 0)
    assert(Versioned.readAt(spark, root, 3).count() == 2)
    intercept[Exception](Versioned.readAt(spark, root, 2).count())
  }

  test("history lists every commit with its timestamp and batch fence") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a", 1L)).toDF("id", "k", "m"))
    Versioned.commitAppend(spark, root, Seq((2L, "b", 2L)).toDF("id", "k", "m"))
    Versioned.commitBatch(spark, root, 7L, Seq((3L, "c", 3L)).toDF("id", "k", "m"))
    val h = Versioned.history(spark, root)
      .as[(Int, Option[Long], Option[String], Int, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(h.map(_._1) == Seq(1, 2, 3))
    assert(h.map(_._4) == Seq(1, 2, 3), "dir counts grow with each append")
    assert(h.forall(_._2.isDefined), "every commit carries a timestamp")
    assert(h.map(_._3) == Seq(Some("commit"), Some("append"), Some("stream-append")),
      "operation labels per version")
    assert(h.map(_._5) == Seq(Some(1L), Some(2L), Some(3L)),
      "metadata row counts per version")
    assert(h.map(_._6) == Seq(None, None, Some(7L)), "batch fences per version")
  }

  test("judged q_mv_incremental equals the direct group-by at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.Queries.queries("q_mv_incremental")(spark, sfDir)
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    val want = Tables.documents(spark, sfDir)
      .withColumn("lang",
        when(col("doc_id") % 10 >= 8 && col("doc_id") % 7 === 0, lit("xx"))
          .otherwise(col("lang")))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }
}
