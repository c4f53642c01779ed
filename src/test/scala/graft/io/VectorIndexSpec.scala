package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the exact-kNN vector table: the two-phase bounded search
  * returns the brute-force answer bit-for-bit on real embeddings, the
  * angular bounds actually skip dirs when the corpus clusters, and
  * unindexed appends degrade to extra reads — never to a wrong
  * neighbor. */
class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_vecindex_spec/${java.util.UUID.randomUUID()}"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("qid", "nid", "rn", "sim").as[(Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  test("bounded search equals brute force on the real embeddings") {
    val root = newRoot()
    val base = graft.llm.Similarity.quantized(spark, TestSpark.sf)
      .select(col("vec_id"), col("qv"), col("nrm"))
    VectorIndex.commitClustered(spark, root, base, cells = 16)
    val got = rows(VectorIndex.searchTopk(spark, root, 1))
    val want = rows(graft.llm.Similarity.bruteTopkOn(spark,
      graft.llm.Similarity.quantized(spark, TestSpark.sf)))
    assert(got == want)
  }

  /** 8 tight clusters on near-orthogonal 64-dim directions; all queries
    * in cluster 0. */
  private def clusteredCorpus() = {
    val vecs = (0L until 400L).map { i =>
      val c = (i % 8).toInt
      val qv = Array.fill(64)(0L)
      (0 until 8).foreach(j => qv(c * 8 + j) = 1000000L)
      qv((c * 8 + (i % 8)).toInt) += (i % 97) * 1000L // jitter inside the cone
      (i, qv.toSeq)
    }
    // queries (vec_id < 10) must live in ONE cluster: remap ids so that
    // ids 0..9 are all cluster-0 members
    val reindexed = vecs.sortBy { case (i, _) => (i % 8 != 0, i) }
      .zipWithIndex.map { case ((_, qv), nid) => (nid.toLong, qv) }
    reindexed.toDF("vec_id", "qv")
      .withColumn("nrm", aggregate(col("qv"), lit(0L),
        (a, x) => a + x * x).cast("double"))
  }

  test("angular bounds prune dirs on a clustered corpus") {
    val root = newRoot()
    VectorIndex.commitClustered(spark, root, clusteredCorpus(), cells = 8)
    val res = VectorIndex.searchTopk(spark, root, 1)
    val dirsRead = res.inputFiles.map(_.split("/data/")(1).split("/part")(0)).distinct
    val total = Versioned.manifest(spark, root, 1).size
    assert(dirsRead.length < total,
      s"expected pruning: read ${dirsRead.length} of $total dirs")
    // and still exact: brute force over the same stored table
    val base = Versioned.readAt(spark, root, 1)
    assert(rows(res) == rows(graft.llm.Similarity.bruteTopkOn(spark, base)))
  }

  test("assigned appends stay exact and keep pruning (append == rebuild)") {
    val root = newRoot()
    VectorIndex.commitClustered(spark, root, clusteredCorpus()
      .filter(col("vec_id") < 300), cells = 8)
    VectorIndex.commitAppendAssigned(spark, root, clusteredCorpus()
      .filter(col("vec_id") >= 300 && col("vec_id") < 360))
    VectorIndex.commitAppendAssigned(spark, root, clusteredCorpus()
      .filter(col("vec_id") >= 360))
    val v = Versioned.currentVersion(spark, root)
    val res = VectorIndex.searchTopk(spark, root, v)
    assert(rows(res) == rows(graft.llm.Similarity.bruteTopkOn(spark,
      Versioned.readAt(spark, root, v))))
    // appended dirs carry their own sidecars: pruning still skips dirs
    val dirsRead = res.inputFiles.map(_.split("/data/")(1).split("/part")(0)).distinct
    val total = Versioned.manifest(spark, root, v).size
    assert(dirsRead.length < total,
      s"expected pruning after appends: read ${dirsRead.length} of $total dirs")
  }

  test("a table whose sidecars were all compacted away degrades to the scan") {
    val root = newRoot()
    VectorIndex.commitClustered(spark, root, clusteredCorpus(), cells = 8)
    // a full compaction through a non-vector path drops every sidecar
    Versioned.commit(spark, root, Versioned.readAt(spark, root, 1))
    val v = Versioned.currentVersion(spark, root)
    val got = rows(VectorIndex.searchTopk(spark, root, v))
    assert(got == rows(graft.llm.Similarity.bruteTopkOn(spark,
      Versioned.readAt(spark, root, v))))
  }

  test("assigned append refuses a table with no vector sidecars") {
    val root = newRoot()
    Versioned.commit(spark, root, clusteredCorpus().filter(col("vec_id") < 50))
    intercept[IllegalArgumentException] {
      VectorIndex.commitAppendAssigned(spark, root,
        clusteredCorpus().filter(col("vec_id") >= 50))
    }
  }

  test("plain appends (no sidecar) are read conservatively and stay exact") {
    val root = newRoot()
    val base = graft.llm.Similarity.quantized(spark, TestSpark.sf)
      .select(col("vec_id"), col("qv"), col("nrm"))
    VectorIndex.commitClustered(spark, root, base.filter(col("vec_id") < 400), cells = 8)
    Versioned.commitAppend(spark, root, base.filter(col("vec_id") >= 400))
    val v = Versioned.currentVersion(spark, root)
    val got = rows(VectorIndex.searchTopk(spark, root, v))
    val want = rows(graft.llm.Similarity.bruteTopkOn(spark, base))
    assert(got == want)
  }

  test("optimizeCells folds accreted cell dirs: one dir per cell, still exact") {
    val root = newRoot()
    VectorIndex.commitClustered(spark, root, clusteredCorpus()
      .filter(col("vec_id") < 280), cells = 8)
    VectorIndex.commitAppendAssigned(spark, root, clusteredCorpus()
      .filter(col("vec_id") >= 280 && col("vec_id") < 340))
    VectorIndex.commitAppendAssigned(spark, root, clusteredCorpus()
      .filter(col("vec_id") >= 340))
    val vPre = Versioned.currentVersion(spark, root)
    val nPre = Versioned.manifest(spark, root, vPre).size
    val vf = VectorIndex.optimizeCells(spark, root).get
    val nPost = Versioned.manifest(spark, root, vf).size
    assert(nPost < nPre, s"fold must shrink the manifest ($nPre -> $nPost)")
    // every surviving dir carries a sidecar (measured fresh for fold dirs)
    val res = VectorIndex.searchTopk(spark, root, vf)
    assert(rows(res) == rows(graft.llm.Similarity.bruteTopkOn(spark,
      Versioned.readAt(spark, root, vf))))
    val dirsRead = res.inputFiles.map(_.split("/data/")(1).split("/part")(0)).distinct
    assert(dirsRead.length < nPost,
      s"post-fold pruning must still skip dirs: read ${dirsRead.length} of $nPost")
    // steady state: a second optimize is a no-op
    assert(VectorIndex.optimizeCells(spark, root).isEmpty)
  }

  test("optimizeCells restores pruning for orphaned (sidecar-less) dirs") {
    val root = newRoot()
    VectorIndex.commitClustered(spark, root, clusteredCorpus()
      .filter(col("vec_id") < 350), cells = 8)
    // a non-vector append path leaves an orphan dir: search must read it
    // every time until the re-index moves its rows into cells
    Versioned.commitAppend(spark, root, clusteredCorpus().filter(col("vec_id") >= 350))
    val vf = VectorIndex.optimizeCells(spark, root).get
    val res = VectorIndex.searchTopk(spark, root, vf)
    assert(rows(res) == rows(graft.llm.Similarity.bruteTopkOn(spark,
      Versioned.readAt(spark, root, vf))))
    val total = Versioned.manifest(spark, root, vf).size
    val dirsRead = res.inputFiles.map(_.split("/data/")(1).split("/part")(0)).distinct
    assert(dirsRead.length < total,
      s"re-land must restore pruning: read ${dirsRead.length} of $total dirs")
    assert(VectorIndex.optimizeCells(spark, root).isEmpty, "steady state after re-land")
  }

  test("optimizeCells retires deletion vectors on folded dirs") {
    val root = newRoot()
    VectorIndex.commitClustered(spark, root, clusteredCorpus()
      .filter(col("vec_id") < 300), cells = 8)
    VectorIndex.commitAppendAssigned(spark, root,
      clusteredCorpus().filter(col("vec_id") >= 300))
    val vd = Versioned.commitDeleteMOR(spark, root, col("vec_id") === 320L)
    assert(Versioned.dvOf(spark, root, vd).nonEmpty)
    val vf = VectorIndex.optimizeCells(spark, root).get
    assert(Versioned.dvOf(spark, root, vf).isEmpty,
      "the fold reads DV-applied content, so the vectors retire with it")
    val v = Versioned.readAt(spark, root, vf)
    assert(v.filter(col("vec_id") === 320L).count() == 0)
    assert(rows(VectorIndex.searchTopk(spark, root, vf)) ==
      rows(graft.llm.Similarity.bruteTopkOn(spark, v)))
  }

  test("optimizeCells races an assigned append x3: exact either way") {
    for (round <- 1 to 3) {
      val root = newRoot()
      VectorIndex.commitClustered(spark, root, clusteredCorpus()
        .filter(col("vec_id") < 280), cells = 8)
      VectorIndex.commitAppendAssigned(spark, root, clusteredCorpus()
        .filter(col("vec_id") >= 280 && col("vec_id") < 340))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val t1 = new Thread(() =>
        try VectorIndex.commitAppendAssigned(spark, root, clusteredCorpus()
          .filter(col("vec_id") >= 340))
        catch { case e: Throwable => errs.add(e) })
      val t2 = new Thread(() =>
        try VectorIndex.optimizeCells(spark, root) // may fold or abort-retry
        catch { case e: Throwable => errs.add(e) })
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(errs.isEmpty, s"round $round: $errs")
      // whatever interleaved: nothing lost, search bit-exact, and a
      // sequential optimize converges to the steady state
      VectorIndex.optimizeCells(spark, root)
      val v = Versioned.currentVersion(spark, root)
      assert(Versioned.countAt(spark, root, v) == 400, s"round $round lost rows")
      assert(rows(VectorIndex.searchTopk(spark, root, v)) ==
        rows(graft.llm.Similarity.bruteTopkOn(spark,
          Versioned.readAt(spark, root, v))), s"round $round inexact")
      assert(VectorIndex.optimizeCells(spark, root).isEmpty, s"round $round steady")
    }
  }

  /** Cluster-7 membership marker on [[clusteredCorpus]] vectors (their
    * 57th element is the cluster-7 basis coordinate). */
  private def withTag(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("tag", when(element_at(col("qv"), 57) > 0L, 1L).otherwise(0L))

  private def queriesOf(df: org.apache.spark.sql.DataFrame): Array[(Long, Array[Long], Double)] =
    df.filter(col("vec_id") < 10).select(col("vec_id"), col("qv"), col("nrm"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getDouble(2)))

  test("filtered kNN is exact and WIDENS when the promising cell has no match") {
    val root = newRoot(); val ctrl = newRoot()
    // every query lives in cluster 0; tag=1 only in cluster 7, so each
    // query's most promising cell holds ZERO matches — the kth-best
    // floor stays unset and the search must widen to the other cells
    // instead of returning short (or, worse, unfiltered neighbors)
    val base = withTag(clusteredCorpus())
    VectorIndex.commitClustered(spark, root, base, cells = 8)
    val qs = queriesOf(base)
    val got = rows(VectorIndex.searchTopkFor(spark, root, 1, qs,
      pred = Some(col("tag") === 1L)))
    // control: an exact table holding ONLY the matching rows
    VectorIndex.commitClustered(spark, ctrl, base.filter(col("tag") === 1L), cells = 4)
    val want = rows(VectorIndex.searchTopkFor(spark, ctrl, 1, qs))
    assert(got == want)
    assert(got.size == 50, "10 queries x full k=5 — cluster 7 has 50 members")
  }

  test("filtered kNN returns min(k, matches) rows when matches run short") {
    val root = newRoot(); val ctrl = newRoot()
    val base = withTag(clusteredCorpus())
    VectorIndex.commitClustered(spark, root, base, cells = 8)
    val three = base.filter(col("tag") === 1L)
      .select("vec_id").as[Long].collect().sorted.take(3)
    val qs = queriesOf(base)
    val got = rows(VectorIndex.searchTopkFor(spark, root, 1, qs,
      pred = Some(col("vec_id").isin(three: _*))))
    VectorIndex.commitClustered(spark, ctrl,
      base.filter(col("vec_id").isin(three: _*)), cells = 1)
    val want = rows(VectorIndex.searchTopkFor(spark, ctrl, 1, qs))
    assert(got == want)
    assert(got.size == 30, "10 queries x exactly 3 matches each — short, never wrong")
    assert(got.forall(r => three.contains(r._2)))
  }

  test("payload columns survive assigned appends and cell folds") {
    val root = newRoot(); val ctrl = newRoot()
    val base = withTag(clusteredCorpus())
    VectorIndex.commitClustered(spark, root, base, cells = 8)
    // day-2 batch: 20 more cluster-7 vectors (tag rides along the append)
    val extra = (0L until 20L).map { i =>
      val qv = Array.fill(64)(0L)
      (0 until 8).foreach(j => qv(56 + j) = 1000000L)
      qv(56 + (i % 8).toInt) += (i % 89) * 1000L
      (1000L + i, qv.toSeq)
    }.toDF("vec_id", "qv")
      .withColumn("nrm", aggregate(col("qv"), lit(0L), (a, x) => a + x * x).cast("double"))
      .withColumn("tag", lit(1L))
    VectorIndex.commitAppendAssigned(spark, root, extra)
    VectorIndex.optimizeCells(spark, root) // fold must keep the payload
    val v = Versioned.currentVersion(spark, root)
    val qs = queriesOf(base)
    val got = rows(VectorIndex.searchTopkFor(spark, root, v, qs,
      pred = Some(col("tag") === 1L)))
    VectorIndex.commitClustered(spark, ctrl,
      base.filter(col("tag") === 1L).unionByName(extra), cells = 4)
    val want = rows(VectorIndex.searchTopkFor(spark, ctrl, 1, qs))
    assert(got == want)
  }
}
