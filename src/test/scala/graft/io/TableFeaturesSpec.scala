package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the round-15 table surface: metadata-only row counts
  * (proven by answering AFTER the data files are deleted), the keyed
  * change data feed (exact change rows; unchanged rows emit nothing;
  * key-changing rewrites surface as delete+insert), the bloom dir-index
  * (prunes unclustered point probes, conservative on unindexed dirs,
  * never loses rows), and write-audit-publish (a rejected batch leaves
  * no trace — head, manifest, and data dirs all unchanged). */
class TableFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_tablefeat_spec/${java.util.UUID.randomUUID()}"

  test("countAt answers every version from manifest metadata alone") {
    val root = newRoot()
    Versioned.commitAppendClustered(spark, root,
      (1L to 800L).map(i => (i, i % 50)).toDF("id", "p"), "id", buckets = 4)
    Versioned.commitAppend(spark, root,
      (801L to 1000L).map(i => (i, i % 50)).toDF("id", "p"))
    val pred = col("id") % 7 === 0
    Versioned.commitUpdate(spark, root, pred, d => d.filter(!pred))
    assert(Versioned.countAt(spark, root, 1) == 800L)
    assert(Versioned.countAt(spark, root, 2) == 1000L)
    assert(Versioned.countAt(spark, root, 3) == (1L to 1000L).count(_ % 7 != 0))
    // the metadata-only proof: delete every parquet file, ask again
    val dataDir = new org.apache.hadoop.fs.Path(s"$root/data")
    val f = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = f.listFiles(dataDir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) f.delete(st.getPath, false)
    }
    assert(Versioned.countAt(spark, root, 3) == (1L to 1000L).count(_ % 7 != 0))
  }

  test("change feed: exact insert/delete/update rows, silence on unchanged") {
    val root = newRoot()
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "s", "n")
    Versioned.commit(spark, root, v1)
    // k=1 unchanged, k=2 payload update, k=3 deleted, k=5 inserted,
    // k=4 -> k=6 key-changing rewrite (CDC convention: delete + insert)
    val v2 = Seq((1L, "a", 10L), (2L, "b", 99L), (5L, "e", 50L), (6L, "d", 40L))
      .toDF("k", "s", "n")
    Versioned.commit(spark, root, v2)
    val ch = ChangeFeed.changes(spark, root, 1, 2, "k")
      .as[(Long, String, Long, String)].collect().sortBy(r => (r._1, r._4))
    assert(ch.toSeq == Seq(
      (2L, "b", 99L, "update_postimage"), (2L, "b", 20L, "update_preimage"),
      (3L, "c", 30L, "delete"),
      (4L, "d", 40L, "delete"),
      (5L, "e", 50L, "insert"),
      (6L, "d", 40L, "insert")))
    // self-diff is empty
    assert(ChangeFeed.changes(spark, root, 2, 2, "k").isEmpty)
  }

  test("bloom index: point probe prunes unclustered dirs, never loses rows") {
    val root = newRoot()
    // 4 interleaved slices: every dir spans the full id domain
    (0 until 4).foreach { r =>
      BloomIndex.commitAppendBloom(spark, root,
        (0L until 4000L).filter(_ % 4 == r).map(i => (i, i % 13)).toDF("id", "p"),
        "id", bits = 1 << 14)
    }
    val v = Versioned.currentVersion(spark, root)
    def dirsOf(d: org.apache.spark.sql.DataFrame): Int =
      d.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.length
    // two probes living in two specific dirs (mod-4 classes 1 and 2)
    val hit = BloomIndex.readPoint(spark, root, v, Seq(137L, 1042L))
    assert(hit.as[(Long, Long)].collect().sorted.toSeq ==
      Seq((137L, 137L % 13), (1042L, 1042L % 13)))
    assert(dirsOf(hit) <= 3, "bloom must prune at least one of the 4 dirs")
    // an absent key: every dir may reject it (fp allowed, rows never)
    assert(BloomIndex.readPoint(spark, root, v, Seq(999999L)).isEmpty)
    // an unindexed dir (plain append) is conservatively read
    Versioned.commitAppend(spark, root, Seq((100001L, 1L)).toDF("id", "p"))
    val v2 = Versioned.currentVersion(spark, root)
    assert(BloomIndex.readPoint(spark, root, v2, Seq(100001L))
      .as[(Long, Long)].collect().toSeq == Seq((100001L, 1L)))
    assert(BloomIndex.readPoint(spark, root, v2, Seq(137L))
      .as[(Long, Long)].collect().toSeq == Seq((137L, 137L % 13)))
  }

  test("bloom sidecar: big filters live next to the data, prune identically") {
    val root = newRoot()
    (0 until 4).foreach { r =>
      BloomIndex.commitAppendBloom(spark, root,
        (0L until 4000L).filter(_ % 4 == r).map(i => (i, i % 13)).toDF("id", "p"),
        "id", bits = 1 << 20) // > inline max -> sidecar
    }
    val v = Versioned.currentVersion(spark, root)
    // the record carries only markers; the bitsets are _bloom.bin files
    assert(Versioned.dirBlooms(spark, root, v).values.toSet == Set("@"))
    val hit = BloomIndex.readPoint(spark, root, v, Seq(137L, 1042L))
    assert(hit.as[(Long, Long)].collect().sorted.toSeq ==
      Seq((137L, 137L % 13), (1042L, 1042L % 13)))
    assert(hit.inputFiles.map(_.replaceAll("/[^/]*$", "")).distinct.length <= 3)
    // the sidecar is invisible to a plain scan of the dir
    assert(Versioned.readAt(spark, root, v).count() == 4000)
    // vacuum after compaction reclaims dir AND sidecar together
    Versioned.commit(spark, root, Versioned.readAt(spark, root, v))
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftover = f.listStatus(new org.apache.hadoop.fs.Path(s"$root/data"))
    assert(leftover.length == 1, "only the compacted dir survives the vacuum")
  }

  test("shallow clone: zero copy, carried metadata, CoW isolation, vacuum safety") {
    val base = newRoot()
    val src = s"$base/src"; val dst = s"$base/clone"
    Versioned.commitAppendClustered(spark, src,
      (1L to 1000L).map(i => (i, i % 17)).toDF("id", "p"), "id", buckets = 4)
    Versioned.cloneAt(spark, src, dst, 1)
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // zero copy: the clone owns no data dir yet
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dst/data")))
    assert(Versioned.readAt(spark, dst, 1).as[(Long, Long)].collect().sorted.toSeq
      == (1L to 1000L).map(i => (i, i % 17)))
    // carried metadata: counts answer without I/O, zone map prunes
    assert(Versioned.countAt(spark, dst, 1) == 1000L)
    val pruned = Versioned.readRange(spark, dst, 1, 10L, 20L)
    assert(pruned.inputFiles.map(_.replaceAll("/[^/]*$", "")).distinct.length == 1)
    assert(pruned.count() == 11)
    // CoW isolation: a merge on the clone never touches the source
    val before = Versioned.readAt(spark, src, 1).as[(Long, Long)].collect().sorted.toSeq
    Versioned.commitMerge(spark, dst,
      Seq((5L, 999L), (2000L, 1L)).toDF("id", "p"), "id")
    assert(Versioned.currentVersion(spark, src) == 1)
    assert(Versioned.readAt(spark, src, 1).as[(Long, Long)].collect().sorted.toSeq == before)
    val merged = Versioned.readAt(spark, dst, 2).as[(Long, Long)].collect().toMap
    assert(merged(5L) == 999L && merged(2000L) == 1L && merged.size == 1001)
    // vacuum on the clone reclaims only ITS dirs; the source stays whole
    Versioned.vacuum(spark, dst, keep = 1, graceMs = 0)
    assert(Versioned.readAt(spark, dst, 2).count() == 1001)
    assert(Versioned.readAt(spark, src, 1).count() == 1000)
  }

  test("CDC replication: applying the feed lands the replica on the source head") {
    val base = newRoot()
    val src = s"$base/src"; val rep = s"$base/rep"
    Versioned.commitAppendClustered(spark, src,
      (1L to 1000L).map(i => (i, i % 17)).toDF("id", "p"), "id", buckets = 4)
    Versioned.cloneAt(spark, src, rep, 1)
    // day-2 on the source: merge (update + insert) then a CoW delete
    Versioned.commitMerge(spark, src,
      Seq((5L, 999L), (2000L, 1L), (2001L, 2L)).toDF("id", "p"), "id")
    val pred = col("id") % 13 === 0
    Versioned.commitUpdate(spark, src, pred, d => d.filter(!pred))
    def snap(root: String, v: Int) =
      Versioned.readAt(spark, root, v).as[(Long, Long)].collect().sorted.toSeq
    ChangeFeed.applyChanges(spark, rep,
      ChangeFeed.changes(spark, src, 1, 3, "id"), "id")
    assert(snap(rep, 2) == snap(src, 3))
    // incremental chaining: a second feed catches the replica up again
    Versioned.commitUpdate(spark, src, col("id") > 1990,
      d => d.filter(!(col("id") > 1990)))
    ChangeFeed.applyChanges(spark, rep,
      ChangeFeed.changes(spark, src, 3, 4, "id"), "id")
    assert(snap(rep, 3) == snap(src, 4))
  }

  test("CDC follow: durable fenced progress, idempotent polls") {
    val base = newRoot()
    val src = s"$base/src"; val rep = s"$base/rep"
    Versioned.commitAppendClustered(spark, src,
      (1L to 1000L).map(i => (i, i % 17)).toDF("id", "p"), "id", buckets = 4)
    Versioned.cloneAt(spark, src, rep, 1)
    def snap(root: String) = Versioned
      .readAt(spark, root, Versioned.currentVersion(spark, root))
      .as[(Long, Long)].collect().sorted.toSeq
    // nothing to do: follow is a no-op poll
    assert(ChangeFeed.follow(spark, src, rep, "id", clonedAt = 1).isEmpty)
    // source advances twice; ONE follow jumps both versions
    Versioned.commitMerge(spark, src, Seq((5L, 999L), (1500L, 1L)).toDF("id", "p"), "id")
    val pred = col("id") % 11 === 0
    Versioned.commitUpdate(spark, src, pred, d => d.filter(!pred))
    assert(ChangeFeed.follow(spark, src, rep, "id", clonedAt = 1).nonEmpty)
    assert(snap(rep) == snap(src))
    // the progress fence is durable: a replayed poll applies nothing
    val vRep = Versioned.currentVersion(spark, rep)
    assert(ChangeFeed.follow(spark, src, rep, "id", clonedAt = 1).isEmpty)
    assert(Versioned.currentVersion(spark, rep) == vRep)
    // next source commit: follow picks up from the fenced version
    Versioned.commitAppend(spark, src, Seq((3000L, 7L)).toDF("id", "p"))
    assert(ChangeFeed.follow(spark, src, rep, "id", clonedAt = 1).nonEmpty)
    assert(snap(rep) == snap(src))
  }

  test("streaming MERGE fence: a wiped-checkpoint replay merges nothing") {
    val base = newRoot()
    val src = s"$base/src"; val table = s"$base/table"
    Versioned.commitAppendClustered(spark, table,
      (1L to 1000L).map(i => (i, i % 17)).toDF("id", "p"), "id", buckets = 4)
    (300L to 400L).map(i => (i, 999L)).toDF("id", "p")
      .repartition(2).write.parquet(src)
    def drive(ckpt: String): Unit = {
      val q = spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          Versioned.commitMergeBatch(spark, table, id, b, "id"); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drive(s"$base/ckpt1")
    val v1 = Versioned.currentVersion(spark, table)
    val snap = Versioned.readAt(spark, table, v1)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(snap.count(_._2 == 999L) == 101 && snap.size == 1000)
    // a fresh checkpoint replays every batch; the fence must skip all
    drive(s"$base/ckpt2")
    assert(Versioned.currentVersion(spark, table) == v1)
    assert(Versioned.readAt(spark, table, v1)
      .as[(Long, Long)].collect().sorted.toSeq == snap)
  }

  test("merge keyed on an altered-in column skips the pre-alter generation") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 100L).map(i => (i, s"s$i")).toDF("id", "s"))
    Versioned.commitAlterAdd(spark, root, "k", "bigint")
    Versioned.commitAppend(spark, root,
      (101L to 200L).map(i => (i, s"s$i", i % 10)).toDF("id", "s", "k"))
    val d1 = Versioned.manifest(spark, root, 1).head
    // merge on k: pre-alter rows hold only null k and can never match
    val v = Versioned.commitMerge(spark, root,
      Seq((300L, "up", 3L)).toDF("id", "s", "k"), "k")
    val out = Versioned.readAt(spark, root, v)
    assert(out.count() == 191) // 100 + 100 - 10 evicted (k=3) + 1 upsert
    assert(out.filter(col("k") === 3).count() == 1)
    assert(out.filter(col("k").isNull).count() == 100, "pre-alter rows untouched")
    assert(Versioned.manifest(spark, root, v).contains(d1),
      "the keyless generation's dir must carry through unrewritten")
    // duplicate alters are loud, not silent data loss
    intercept[IllegalArgumentException] {
      Versioned.commitAlterAdd(spark, root, "s", "string")
    }
    intercept[IllegalArgumentException] {
      Versioned.commitAlterAdd(spark, root, "k", "bigint")
    }
  }

  test("bloom re-declaration with different parameters is rejected") {
    val root = newRoot()
    BloomIndex.commitAppendBloom(spark, root,
      Seq((1L, 1L)).toDF("id", "p"), "id", bits = 1 << 14)
    intercept[IllegalArgumentException] {
      BloomIndex.commitAppendBloom(spark, root,
        Seq((2L, 2L)).toDF("id", "p"), "id", bits = 1 << 16)
    }
    intercept[IllegalArgumentException] {
      BloomIndex.commitAppendBloom(spark, root,
        Seq((3L, 3L)).toDF("id", "p"), "p", bits = 1 << 14)
    }
    // same declaration composes
    BloomIndex.commitAppendBloom(spark, root,
      Seq((4L, 4L)).toDF("id", "p"), "id", bits = 1 << 14)
    assert(Versioned.countAt(spark, root, 2) == 2L)
  }

  test("optimize racing a CoW delete never resurrects rows") {
    (1 to 3).foreach { round =>
      val root = newRoot()
      (0 until 3).foreach { r =>
        Versioned.commitAppendClustered(spark, root,
          (1L to 900L).filter(_ % 3 == r).map(i => (i, i % 7)).toDF("id", "p"),
          "id", buckets = 4)
      }
      val pred = col("id") % 5 === 0
      val t1 = new Thread(() =>
        Versioned.optimizeClustered(spark, root, "id", buckets = 4): Unit)
      val t2 = new Thread(() =>
        Versioned.commitUpdate(spark, root, pred, d => d.filter(!pred)): Unit)
      t1.start(); t2.start(); t1.join(); t2.join()
      // whatever serialized: the delete must hold at the final head —
      // an optimize publishing its pre-delete fold would resurrect them
      val head = Versioned.currentVersion(spark, root)
      val got = Versioned.readAt(spark, root, head)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == (1L to 900L).filterNot(_ % 5 == 0).map(i => (i, i % 7)),
        s"round $round: racing optimize corrupted the table")
    }
  }

  test("optimize racing a MOR delete never resurrects rows") {
    // the metadata-only flavor of the race above: the MOR delete moves
    // no manifest dir, only vector state — the optimizer's abort check
    // must see it (a fold computed under the old vectors would re-add
    // the deleted rows), and the delete's own abort must see a fold
    // that replaced its touched dirs (its positions would be orphaned)
    (1 to 3).foreach { round =>
      val root = newRoot()
      (0 until 3).foreach { r =>
        Versioned.commitAppendClustered(spark, root,
          (1L to 900L).filter(_ % 3 == r).map(i => (i, i % 7)).toDF("id", "p"),
          "id", buckets = 4)
      }
      val t1 = new Thread(() =>
        Versioned.optimizeClustered(spark, root, "id", buckets = 4): Unit)
      val t2 = new Thread(() =>
        Versioned.commitDeleteMOR(spark, root, col("id") % 5 === 0): Unit)
      t1.start(); t2.start(); t1.join(); t2.join()
      val head = Versioned.currentVersion(spark, root)
      val got = Versioned.readAt(spark, root, head)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == (1L to 900L).filterNot(_ % 5 == 0).map(i => (i, i % 7)),
        s"round $round: racing optimize corrupted the vectored table")
      assert(Versioned.countAt(spark, root, head) == got.size,
        s"round $round: metadata count diverged under the race")
    }
  }

  test("two racing MOR merges on the same dirs both land exactly once") {
    (1 to 3).foreach { round =>
      val root = newRoot()
      Versioned.commitAppendClustered(spark, root,
        (1L to 400L).map(i => (i, 0L)).toDF("id", "p"), "id", buckets = 4)
      // overlapping touched dirs -> vector-state conflict; the loser
      // must retry with fresh positions, never double-vector a row
      val t1 = new Thread(() =>
        Versioned.commitMergeMOR(spark, root,
          (10L to 30L).map(i => (i, 111L)).toDF("id", "p"), "id"): Unit)
      val t2 = new Thread(() =>
        Versioned.commitMergeMOR(spark, root,
          (40L to 60L).map(i => (i, 222L)).toDF("id", "p"), "id"): Unit)
      t1.start(); t2.start(); t1.join(); t2.join()
      val head = Versioned.currentVersion(spark, root)
      val got = Versioned.readAt(spark, root, head)
        .as[(Long, Long)].collect().toMap
      assert(got.size == 400, s"round $round: lost or duplicated keys")
      assert((10L to 30L).forall(got(_) == 111L), s"round $round: merge 1 lost")
      assert((40L to 60L).forall(got(_) == 222L), s"round $round: merge 2 lost")
      assert(Versioned.countAt(spark, root, head) == 400,
        s"round $round: dvRows double-counted under the race")
    }
  }

  test("two racing merges on the same dir both land (conflict retry liveness)") {
    (1 to 3).foreach { round =>
      val root = newRoot()
      Versioned.commitAppendClustered(spark, root,
        (1L to 400L).map(i => (i, 0L)).toDF("id", "p"), "id", buckets = 4)
      // both update sets live in the same bucket dir -> guaranteed
      // write-write conflict; the loser must retry and still apply
      val t1 = new Thread(() =>
        Versioned.commitMerge(spark, root,
          (10L to 30L).map(i => (i, 111L)).toDF("id", "p"), "id"): Unit)
      val t2 = new Thread(() =>
        Versioned.commitMerge(spark, root,
          (40L to 60L).map(i => (i, 222L)).toDF("id", "p"), "id"): Unit)
      t1.start(); t2.start(); t1.join(); t2.join()
      val got = Versioned
        .readAt(spark, root, Versioned.currentVersion(spark, root))
        .as[(Long, Long)].collect().toMap
      assert(got.size == 400, s"round $round: lost or duplicated keys")
      assert((10L to 30L).forall(got(_) == 111L), s"round $round: merge 1 lost")
      assert((40L to 60L).forall(got(_) == 222L), s"round $round: merge 2 lost")
      assert((61L to 400L).forall(got(_) == 0L))
    }
  }

  test("write-audit-publish: a rejected batch leaves no trace") {
    val root = newRoot()
    val checks = Seq(
      "n_nonneg" -> (col("n") >= 0),
      "k_notnull" -> col("k").isNotNull)
    Versioned.commitAppendChecked(spark, root,
      (1L to 100L).map(i => (i, i)).toDF("k", "n"), checks)
    val before = Versioned.manifest(spark, root, 1)
    val poisoned = (101L to 110L).map(i => (i, if (i % 2 == 0) -i else i)).toDF("k", "n")
    val e = intercept[Versioned.CommitRejected] {
      Versioned.commitAppendChecked(spark, root, poisoned, checks)
    }
    assert(e.violations == Map("n_nonneg" -> 5L))
    assert(Versioned.currentVersion(spark, root) == 1)
    assert(Versioned.manifest(spark, root, 1) == before)
    // the staged dir was reclaimed: only v1's dir remains under data/
    val dataDir = new org.apache.hadoop.fs.Path(s"$root/data")
    val f = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.listStatus(dataDir).length == 1)
    // SQL CHECK semantics: NULL passes (reject explicitly if wanted)
    val withNull = Seq((Some(200L), None: Option[Long]), (Some(201L), Some(5L)))
      .toDF("k", "n")
    Versioned.commitAppendChecked(spark, root, withNull, checks)
    assert(Versioned.countAt(spark, root, 2) == 102L)
  }
}
