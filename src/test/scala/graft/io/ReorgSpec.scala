package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the deletion-vector REWRITE policy (REORG/PURGE): healthy
  * tables answer None at zero I/O, the threshold is respected per dir,
  * rewrites compose with clustered zone maps (fresh dirs re-measure),
  * fully-deleted dirs leave the manifest, and vector-index tables are
  * refused (their sidecar-aware rewrite is the cell fold). */
class ReorgSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_reorg_spec/${java.util.UUID.randomUUID()}"

  test("healthy layouts answer None; sub-threshold vectors are left alone") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, (0L until 1000L).map(i => (i, i % 7)).toDF("id", "m"))
    // no vectors at all: None, no version bump
    assert(Versioned.rewriteVectored(spark, root).isEmpty)
    assert(Versioned.currentVersion(spark, root) == 1)
    // a 1% delete is far below the 30% default threshold: still None
    Versioned.commitDeleteMOR(spark, root, col("id") % 100 === 0)
    assert(Versioned.rewriteVectored(spark, root).isEmpty)
    assert(Versioned.dvOf(spark, root,
      Versioned.currentVersion(spark, root)).nonEmpty, "the cheap vectors stay")
  }

  test("threshold respected per dir: only the heavy dir is rewritten") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, (0L until 1000L).map(i => (i, 0L)).toDF("id", "m"))
    Versioned.commitAppend(spark, root, (1000L until 2000L).map(i => (i, 1L)).toDF("id", "m"))
    val d1 = Versioned.manifest(spark, root, 1).head
    val d2 = Versioned.manifest(spark, root, 2).filterNot(_ == d1).head
    // dir 1 loses 50%, dir 2 loses 2%
    Versioned.commitDeleteMOR(spark, root, col("id") < 500L)
    Versioned.commitDeleteMOR(spark, root, col("id").between(1000L, 1019L))
    val v = Versioned.rewriteVectored(spark, root, maxDvFraction = 0.3).get
    val dirs = Versioned.manifest(spark, root, v)
    assert(!dirs.contains(d1), "the heavy dir must be rewritten away")
    assert(dirs.contains(d2), "the light dir must be left alone")
    val dv = Versioned.dvOf(spark, root, v)
    assert(dv.keySet == Set(d2), "only the light dir keeps its vectors")
    assert(Versioned.readAt(spark, root, v).count() == 1480)
    assert(Versioned.countAt(spark, root, v) == 1480, "dv math still exact")
    // a second pass with the same threshold is the steady state
    assert(Versioned.rewriteVectored(spark, root, maxDvFraction = 0.3).isEmpty)
  }

  test("composes with a clustered zone map: fresh dirs re-measure, pruning holds") {
    val root = newRoot()
    Versioned.commitAppendClustered(spark, root,
      (0L until 4000L).map(i => (i, i % 5)).toDF("id", "m"), "id", buckets = 4)
    // one bucket loses most of its rows
    Versioned.commitDeleteMOR(spark, root, col("id") < 800L)
    val v = Versioned.rewriteVectored(spark, root, maxDvFraction = 0.3).get
    assert(Versioned.dvOf(spark, root, v).isEmpty)
    // every manifest dir carries a stats entry (the rewrite re-measured)
    val st = Versioned.dirStats(spark, root, v)
    assert(Versioned.manifest(spark, root, v).forall(st.contains))
    // and the map still prunes: a probe in the rewritten range reads
    // fewer dirs than the manifest holds
    val probe = Versioned.readRange(spark, root, v, 800L, 900L)
    assert(probe.count() == 101)
    val dirsRead = probe.inputFiles
      .map(f => f.split("/").dropRight(1).mkString("/")).distinct.length
    assert(dirsRead < Versioned.manifest(spark, root, v).size,
      "zone-map pruning must survive the rewrite")
    // exact metadata range works again (no live vectors)
    assert(Versioned.statsRangeAt(spark, root, v).contains((800L, 3999L)))
  }

  test("a fully-deleted dir leaves the manifest") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, (0L until 100L).map(i => (i, 0L)).toDF("id", "m"))
    Versioned.commitAppend(spark, root, (100L until 200L).map(i => (i, 1L)).toDF("id", "m"))
    val d1 = Versioned.manifest(spark, root, 1).head
    Versioned.commitDeleteMOR(spark, root, col("id") < 100L) // ALL of dir 1
    val v = Versioned.rewriteVectored(spark, root, maxDvFraction = 0.5).get
    assert(!Versioned.manifest(spark, root, v).contains(d1))
    assert(Versioned.manifest(spark, root, v).size == 1,
      "nothing re-lands for an empty rewrite")
    assert(Versioned.readAt(spark, root, v).count() == 100)
    assert(Versioned.dvOf(spark, root, v).isEmpty)
  }

  test("vector-index tables are refused (cell sidecars would orphan)") {
    val root = newRoot()
    val vecs = (0L until 100L).map { i =>
      val qv = Array.fill(8)(0L); qv((i % 4).toInt) = 1000000L
      (i, qv.toSeq)
    }.toDF("vec_id", "qv")
      .withColumn("nrm", aggregate(col("qv"), lit(0L), (a, x) => a + x * x).cast("double"))
    VectorIndex.commitClustered(spark, root, vecs, cells = 2)
    Versioned.commitDeleteMOR(spark, root, col("vec_id") < 80L)
    val e = intercept[IllegalArgumentException](
      Versioned.rewriteVectored(spark, root, maxDvFraction = 0.1))
    assert(e.getMessage.contains("optimizeCells"))
  }

  test("rewriteVectored races a concurrent MOR delete x3: never a lost delete") {
    for (round <- 1 to 3) {
      val root = newRoot()
      Versioned.commitAppend(spark, root,
        (0L until 2000L).map(i => (i, i % 5)).toDF("id", "m"))
      Versioned.commitDeleteMOR(spark, root, col("id") < 1000L) // 50% > threshold
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val t1 = new Thread(() =>
        try Versioned.commitDeleteMOR(spark, root, col("id").between(1500L, 1599L))
        catch { case e: Throwable => errs.add(e) })
      val t2 = new Thread(() =>
        try Versioned.rewriteVectored(spark, root, maxDvFraction = 0.3)
        catch { case e: Throwable => errs.add(e) })
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(errs.isEmpty, s"round $round: $errs")
      // whatever interleaved, BOTH effects hold: the racer's 100 deletes
      // are never resurrected by a stale staged copy, and a sequential
      // sweep reaches the clean steady state
      Versioned.rewriteVectored(spark, root, maxDvFraction = 0.05)
      val v = Versioned.currentVersion(spark, root)
      assert(Versioned.readAt(spark, root, v).count() == 900, s"round $round lost/resurrected rows")
      assert(Versioned.countAt(spark, root, v) == 900, s"round $round metadata drift")
      assert(Versioned.rewriteVectored(spark, root, maxDvFraction = 0.05).isEmpty)
    }
  }

  test("maintain routes the rewrite on layout-less tables") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, (0L until 1000L).map(i => (i, i % 3)).toDF("id", "m"))
    Versioned.commitDeleteMOR(spark, root, col("id") % 2 === 0L)
    val v = Versioned.maintain(spark, root).get // default maxDvFraction
    assert(Versioned.dvOf(spark, root, v).isEmpty)
    assert(Versioned.readAt(spark, root, v).count() == 500)
    assert(Versioned.maintain(spark, root).isEmpty, "steady state")
  }
}
