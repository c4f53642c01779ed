package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for merge-on-read deletes (positional deletion vectors) and
  * RESTORE: a MOR delete must equal the filtered relation WITHOUT
  * rewriting any data dir; vectors are positional (re-appended identical
  * values survive); every rewrite path (CoW update, OPTIMIZE, compaction)
  * retires the vectors it folds; metadata counts subtract with zero data
  * I/O; diff/clone/zone-map reads stay exact under live vectors; and
  * restore rolls the head back in one metadata commit without losing
  * history or the streaming fence. */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() = s"/tmp/graft_dv_spec/${java.util.UUID.randomUUID()}"

  private def base(n: Long) =
    (1L to n).map(i => (i, i % 13, s"t$i")).toDF("id", "grp", "s")

  test("MOR delete equals the filtered relation without rewriting any dir") {
    val root = newRoot()
    Versioned.commitAppendClustered(spark, root, base(1000), "id", buckets = 4)
    val m1 = Versioned.manifest(spark, root, 1)
    val v = Versioned.commitDeleteMOR(spark, root, col("id") % 7 === 0)
    assert(v == 2)
    assert(Versioned.manifest(spark, root, 2) == m1, "pure metadata: same dirs")
    val got = Versioned.readAt(spark, root, 2).select("id").as[Long].collect().sorted.toSeq
    assert(got == (1L to 1000L).filterNot(_ % 7 == 0))
    // time travel: the pre-delete version is untouched
    assert(Versioned.readAt(spark, root, 1).count() == 1000)
  }

  test("countAt/history subtract vector cardinalities from METADATA (zero data I/O)") {
    val root = newRoot()
    Versioned.commitAppendClustered(spark, root, base(1000), "id", buckets = 4)
    Versioned.commitDeleteMOR(spark, root, col("id") % 7 === 0)
    val expect = (1L to 1000L).count(_ % 7 != 0).toLong
    assert(Versioned.countAt(spark, root, 2) == expect)
    // the proof it never touches data: delete every DATA parquet file
    // (sparing the sidecar + log) and ask again
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration).getRawFileSystem
    val sidecars = Versioned.dvOf(spark, root, 2).values.flatten.toSet
    Versioned.manifest(spark, root, 2).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$d"), true)
    }
    assert(sidecars.forall(s =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$root/$s"))))
    assert(Versioned.countAt(spark, root, 2) == expect)
    val h = Versioned.history(spark, root)
      .select("version", "n_rows").as[(Int, Long)].collect().toMap
    assert(h(1) == 1000L && h(2) == expect)
  }

  test("vectors are positional: re-appended identical values survive") {
    val root = newRoot()
    Versioned.commit(spark, root, base(100))
    Versioned.commitDeleteMOR(spark, root, col("id") <= 50)
    // the SAME 50 rows, value-identical, land again — a keyed delete
    // would kill them; a positional one must not
    Versioned.commitAppend(spark, root, base(100).filter(col("id") <= 50))
    val got = Versioned.readAt(spark, root, 3).select("id").as[Long].collect().sorted.toSeq
    assert(got == (1L to 100L))
  }

  test("stacked MOR deletes compose; a no-op delete publishes nothing") {
    val root = newRoot()
    Versioned.commit(spark, root, base(300))
    Versioned.commitDeleteMOR(spark, root, col("id") % 3 === 0)
    Versioned.commitDeleteMOR(spark, root, col("id") % 5 === 0)
    assert(Versioned.currentVersion(spark, root) == 3)
    val live = (1L to 300L).filter(i => i % 3 != 0 && i % 5 != 0)
    assert(Versioned.readAt(spark, root, 3).count() == live.size)
    assert(Versioned.countAt(spark, root, 3) == live.size)
    // matched rows are gone, so re-deleting them matches nothing: the
    // head must NOT advance (and dvRows must not double-count)
    val v = Versioned.commitDeleteMOR(spark, root, col("id") % 3 === 0)
    assert(v == 3 && Versioned.currentVersion(spark, root) == 3)
  }

  test("diff across a MOR delete surfaces the removals (dv-aware cancel)") {
    val root = newRoot()
    Versioned.commit(spark, root, base(500))
    Versioned.commitDeleteMOR(spark, root, col("id") % 5 === 0)
    val d = Versioned.diff(spark, root, 1, 2)
      .select(col("op"), col("id")).as[(String, Long)].collect()
    assert(d.forall(_._1 == "removed"))
    assert(d.map(_._2).sorted.toSeq == (5L to 500L by 5L))
    val d2 = Versioned.diff(spark, root, 2, 1)
    assert(d2.filter(col("op") === "added").count() == 100)
  }

  test("a CoW touch of a vectored dir retires exactly that dir's vectors") {
    val root = newRoot()
    Versioned.commitAppendClustered(spark, root, base(1000), "id", buckets = 4)
    Versioned.commitDeleteMOR(spark, root, col("id") % 7 === 0)
    val dvBefore = Versioned.dvOf(spark, root, 2)
    assert(dvBefore.nonEmpty)
    // touch only the low-id dir; its vector entry must drop WITH the dir
    // while the deletes stay applied (the rewrite read DV-applied rows)
    val pred = col("id").between(1, 10)
    val v = Versioned.commitUpdate(spark, root, pred,
      d => d.withColumn("s", when(pred, concat(col("s"), lit("!"))).otherwise(col("s"))))
    val m3 = Versioned.manifest(spark, root, v).toSet
    val dvAfter = Versioned.dvOf(spark, root, v)
    assert(dvAfter.nonEmpty && dvAfter.keySet.subsetOf(m3))
    assert(dvAfter.size == dvBefore.size - 1, "one dir rewritten, one entry retired")
    val got = Versioned.readAt(spark, root, v)
      .select("id", "s").as[(Long, String)].collect().sortBy(_._1)
    val want = (1L to 1000L).filterNot(_ % 7 == 0)
      .map(i => (i, if (i <= 10) s"t$i!" else s"t$i"))
    assert(got.toSeq == want)
  }

  test("OPTIMIZE folds vectors; vacuum reclaims the sidecars only then") {
    val root = newRoot()
    (0 until 3).foreach { r =>
      Versioned.commitAppendClustered(spark, root,
        base(900).filter(col("id") % 3 === r), "id", buckets = 4)
    }
    Versioned.commitDeleteMOR(spark, root, col("id") % 10 === 0)
    val sidecars = Versioned.dvOf(spark, root, 4).values.flatten.toSet
    assert(sidecars.nonEmpty)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration).getRawFileSystem
    // while a surviving manifest references them, vacuum must NOT reclaim
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    assert(sidecars.forall(s => fs.exists(new org.apache.hadoop.fs.Path(s"$root/$s"))))
    // live vectors veto the metadata min/max (extremum may be deleted)
    assert(Versioned.statsRangeAt(spark, root, 4).isEmpty)
    val v = Versioned.optimizeClustered(spark, root, "id", buckets = 4)
      .getOrElse(sys.error("3 spanning layers must fold"))
    assert(Versioned.dvOf(spark, root, v).isEmpty, "fold retires all vectors")
    assert(Versioned.statsRangeAt(spark, root, v).nonEmpty)
    val live = (1L to 900L).filterNot(_ % 10 == 0)
    assert(Versioned.readAt(spark, root, v).count() == live.size)
    assert(Versioned.readRange(spark, root, v, 100L, 200L).count() ==
      live.count(i => i >= 100 && i <= 200))
    // now nothing references the sidecars — vacuum reclaims them
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    assert(sidecars.forall(s => !fs.exists(new org.apache.hadoop.fs.Path(s"$root/$s"))))
  }

  test("zone-map range reads and keyed MERGE stay exact under live vectors") {
    val root = newRoot()
    Versioned.commitAppendClustered(spark, root, base(1000), "id", buckets = 8)
    Versioned.commitDeleteMOR(spark, root, col("id") % 4 === 0)
    assert(Versioned.readRange(spark, root, 2, 100L, 300L)
      .count() == (100L to 300L).count(_ % 4 != 0))
    // MERGE on a vectored table: matched keys replaced, deleted rows do
    // not resurrect, the touched dirs' vectors retire
    val ups = Seq((200L, 0L, "UP200"), (201L, 1L, "UP201")).toDF("id", "grp", "s")
    val v = Versioned.commitMerge(spark, root, ups, "id")
    val got = Versioned.readAt(spark, root, v)
      .filter(col("id").between(196, 204))
      .select("id", "s").as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = (196L to 204L).filterNot(i => i % 4 == 0 && i != 200)
      .map(i => (i, if (i == 200L) "UP200" else if (i == 201L) "UP201" else s"t$i"))
    assert(got == want)
  }

  test("shallow clone carries the vectors (same files, same positions)") {
    val run = newRoot()
    val src = s"$run/src"; val dst = s"$run/dst"
    Versioned.commitAppendClustered(spark, src, base(400), "id", buckets = 4)
    Versioned.commitDeleteMOR(spark, src, col("id") % 2 === 0)
    Versioned.cloneAt(spark, src, dst, 2)
    assert(Versioned.readAt(spark, dst, 1).count() == 200)
    assert(Versioned.countAt(spark, dst, 1) == 200)
    val got = Versioned.readAt(spark, dst, 1).select("id").as[Long].collect().sorted.toSeq
    assert(got == (1L to 399L by 2L))
  }

  test("restore rolls back deletes and appends in one metadata commit") {
    val root = newRoot()
    Versioned.commit(spark, root, base(100))
    Versioned.commitDeleteMOR(spark, root, col("id") % 2 === 0)
    Versioned.commitAppend(spark, root,
      (101L to 120L).map(i => (i, i % 13, s"bad$i")).toDF("id", "grp", "s"))
    val v = Versioned.restore(spark, root, 1)
    assert(v == 4)
    assert(Versioned.readAt(spark, root, 4).select("id").as[Long]
      .collect().sorted.toSeq == (1L to 100L))
    assert(Versioned.countAt(spark, root, 4) == 100)
    // the bad versions stay time-travelable for the post-mortem
    assert(Versioned.readAt(spark, root, 2).count() == 50)
    assert(Versioned.readAt(spark, root, 3).count() == 70)
    // restoring a vectored version re-publishes its vectors
    val v5 = Versioned.restore(spark, root, 2)
    assert(Versioned.readAt(spark, root, v5).select("id").as[Long]
      .collect().sorted.toSeq == (1L to 99L by 2L))
  }

  test("restore does not carry the batch fence (no replay re-admission)") {
    val root = newRoot()
    Versioned.commitBatch(spark, root, 5L, base(10))
    Versioned.commitBatch(spark, root, 10L, base(5))
    Versioned.restore(spark, root, 1)
    // the old fence still wins: a replay of batch 10 must stay fenced
    assert(Versioned.commitBatch(spark, root, 10L, base(5)).isEmpty)
    assert(Versioned.commitBatch(spark, root, 11L, base(3)).nonEmpty)
  }

  test("restore to a pre-alter version returns the old schema") {
    val root = newRoot()
    Versioned.commit(spark, root, base(50))
    Versioned.commitAlterAdd(spark, root, "extra", "bigint")
    Versioned.commitAppend(spark, root,
      (51L to 60L).map(i => (i, i % 13, s"t$i", i * 2)).toDF("id", "grp", "s", "extra"))
    assert(Versioned.readAt(spark, root, 3).columns.contains("extra"))
    val v = Versioned.restore(spark, root, 1)
    assert(!Versioned.readAt(spark, root, v).columns.contains("extra"))
    assert(Versioned.readAt(spark, root, v).count() == 50)
  }

  test("MOR merge equals the CoW merge relation with zero dir rewrites") {
    val run = newRoot()
    val morRoot = s"$run/mor"; val cowRoot = s"$run/cow"
    val ups = ((200L to 210L).map(i => (i, i % 13, s"UP$i")) ++
      Seq((2001L, 0L, "NEW1"), (2002L, 1L, "NEW2"))).toDF("id", "grp", "s")
    Versioned.commitAppendClustered(spark, morRoot, base(1000), "id", buckets = 4)
    Versioned.commitAppendClustered(spark, cowRoot, base(1000), "id", buckets = 4)
    val vm = Versioned.commitMergeMOR(spark, morRoot, ups, "id")
    val vc = Versioned.commitMerge(spark, cowRoot, ups, "id")
    // identical relations...
    val a = Versioned.readAt(spark, morRoot, vm)
    val b = Versioned.readAt(spark, cowRoot, vc)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(Versioned.countAt(spark, morRoot, vm) == 1002)
    // ...but the MOR side rewrote NOTHING: every base dir carried
    assert(Versioned.manifest(spark, morRoot, 1)
      .forall(Versioned.manifest(spark, morRoot, vm).contains))
    // and the vector is confined to the zone-map-overlapping dir(s)
    assert(Versioned.dvOf(spark, morRoot, vm).size <= 2)
  }

  test("chained MOR merges supersede each other's upserts") {
    val root = newRoot()
    Versioned.commit(spark, root, base(100))
    Versioned.commitMergeMOR(spark, root,
      Seq((50L, 0L, "v1"), (101L, 1L, "n1")).toDF("id", "grp", "s"), "id")
    Versioned.commitMergeMOR(spark, root,
      Seq((50L, 0L, "v2"), (101L, 1L, "n2")).toDF("id", "grp", "s"), "id")
    val got = Versioned.readAt(spark, root, 3)
      .select("id", "s").as[(Long, String)].collect().toMap
    assert(got.size == 101 && got(50L) == "v2" && got(101L) == "n2")
    // the second merge vectored the FIRST merge's upsert dir
    assert(Versioned.countAt(spark, root, 3) == 101)
    // a compaction folds the whole chain back to vector-free
    Versioned.compactClustered(spark, root, "id", buckets = 2)
    val head = Versioned.currentVersion(spark, root)
    assert(Versioned.dvOf(spark, root, head).isEmpty)
    assert(Versioned.readAt(spark, root, head)
      .select("id", "s").as[(Long, String)].collect().toMap == got)
  }

  test("streaming MOR merge is batch-fenced (replay merges nothing)") {
    val root = newRoot()
    Versioned.commit(spark, root, base(100))
    val ups = Seq((10L, 0L, "UP")).toDF("id", "grp", "s")
    assert(Versioned.commitMergeBatchMOR(spark, root, 1L, ups, "id").nonEmpty)
    val head = Versioned.currentVersion(spark, root)
    // a replay of batch 1 must publish nothing and leave no orphan state
    assert(Versioned.commitMergeBatchMOR(spark, root, 1L, ups, "id").isEmpty)
    assert(Versioned.currentVersion(spark, root) == head)
    assert(Versioned.readAt(spark, root, head)
      .filter(col("id") === 10L).select("s").as[String].head() == "UP")
  }

  test("judged q_table_delete_mor and q_table_restore match their oracles' shape") {
    val sf = "/root/testdata/sf0.001"
    val mor = graft.Queries.queries("q_table_delete_mor")(spark, sf)
    val exp = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .filter((col("doc_id") % 10 < 8 &&
        !(col("doc_id") % 7 === 0 || col("doc_id").between(260, 340))) ||
        col("doc_id") % 10 >= 8)
    assert(mor.exceptAll(exp).isEmpty && exp.exceptAll(mor).isEmpty)
    val rst = graft.Queries.queries("q_table_restore")(spark, sf)
    val exp2 = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .filter(col("doc_id") % 10 < 8)
    assert(rst.exceptAll(exp2).isEmpty && exp2.exceptAll(rst).isEmpty)
  }
}
