package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the self-scheduling OPTIMIZE: a healthy (disjoint) layout
  * is a no-op, a decayed layout folds back to bounded point-read cost,
  * content and history are preserved, and running the policy after
  * EVERY commit keeps read cost flat without any manual compaction —
  * the property that retires the calendar-scheduled weekly rewrite. */
class OptimizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_optimize_spec/${java.util.UUID.randomUUID()}"

  private def dirsTouched(root: String, v: Int, lo: Long, hi: Long): Int = {
    val r = Versioned.readRange(spark, root, v, lo, hi)
    Versioned.manifest(spark, root, v)
      .count(d => r.inputFiles.exists(_.contains(s"/$d/")))
  }

  test("disjoint time-keyed layout: optimize is a no-op") {
    val root = newRoot()
    (0 until 4).foreach { day =>
      Versioned.commitAppendClustered(spark, root,
        ((day * 100L) until (day * 100L + 100L)).map(i => (i, s"r$i")).toDF("id", "s"),
        "id", buckets = 4)
    }
    val head = Versioned.currentVersion(spark, root)
    assert(Versioned.optimizeClustered(spark, root, "id", buckets = 4).isEmpty,
      "near-disjoint components must not be rewritten")
    assert(Versioned.currentVersion(spark, root) == head)
  }

  test("decayed layout folds: bounded point reads, content preserved, history intact") {
    val root = newRoot()
    // three domain-spanning layers -> every point covered by ~3 dirs
    (0 until 3).foreach { r =>
      Versioned.commitAppendClustered(spark, root,
        (0L until 300L).filter(_ % 3 == r).map(i => (i, s"r$i")).toDF("id", "s"),
        "id", buckets = 4)
    }
    assert(Versioned.manifest(spark, root, 3).size == 12)
    assert(dirsTouched(root, 3, 150L, 155L) >= 3, "decayed: point probe touches every layer")
    val v = Versioned.optimizeClustered(spark, root, "id", buckets = 4)
    assert(v.contains(4))
    assert(Versioned.manifest(spark, root, 4).size == 4)
    assert(dirsTouched(root, 4, 150L, 155L) == 1, "folded: point probe is single-dir")
    // content identical, pre-optimize history still readable
    assert(Versioned.readAt(spark, root, 4).as[(Long, String)].collect().sorted.toSeq ==
      (0L until 300L).map(i => (i, s"r$i")))
    assert(Versioned.diff(spark, root, 3, 4).count() == 0)
    // a second pass right after is a no-op
    assert(Versioned.optimizeClustered(spark, root, "id", buckets = 4).isEmpty)
  }

  test("run-after-every-commit keeps read cost flat with no manual compaction") {
    val root = newRoot()
    var folds = 0
    (0 until 8).foreach { day =>
      // every day's batch spans the whole key domain (the decay shape)
      Versioned.commitAppendClustered(spark, root,
        (0L until 200L).map(i => (day * 1000L + i, ())).map { case (r, _) =>
          (r % 200L, s"d$day-${r % 200}") }.toDF("id", "s"),
        "id", buckets = 4)
      if (Versioned.optimizeClustered(spark, root, "id", buckets = 4).isDefined)
        folds += 1
      val head = Versioned.currentVersion(spark, root)
      assert(dirsTouched(root, head, 100L, 101L) <= 3,
        s"day $day: point probe must stay <= maxCover+1 dirs")
      assert(Versioned.manifest(spark, root, head).size <= 12,
        s"day $day: dir count must stay bounded")
    }
    assert(folds >= 2, "the policy must have self-scheduled folds")
    assert(Versioned.readAt(spark, root, Versioned.currentVersion(spark, root))
      .count() == 8 * 200)
  }

  test("optimizeSmall: healthy layouts are a metadata-only no-op") {
    val root = newRoot()
    (0 until 3).foreach { i =>
      Versioned.commitAppendClustered(spark, root,
        ((i * 1000L) until ((i + 1) * 1000L)).map(x => (x, x % 7)).toDF("k", "v"),
        "k", buckets = 1)
    }
    // every dir holds 1000 rows: nothing under the small threshold
    assert(Versioned.optimizeSmall(spark, root, "k",
      smallRows = 100, targetRows = 5000).isEmpty)
    assert(Versioned.currentVersion(spark, root) == 3)
  }

  test("optimizeSmall: tiny disjoint dirs defragment; big dirs carry untouched") {
    val root = newRoot()
    // one big dir + 20 tiny disjoint micro-batches
    Versioned.commitAppendClustered(spark, root,
      (100000L until 110000L).map(x => (x, x % 7)).toDF("k", "v"), "k", buckets = 1)
    (0 until 20).foreach { i =>
      Versioned.commitAppendClustered(spark, root,
        ((i * 50L) until ((i + 1) * 50L)).map(x => (x, x % 7)).toDF("k", "v"),
        "k", buckets = 1)
    }
    val bigDir = Versioned.manifest(spark, root, 1).head
    val v = Versioned.optimizeSmall(spark, root, "k",
      smallRows = 100, targetRows = 500)
      .getOrElse(fail("20 tiny dirs must fold"))
    val m = Versioned.manifest(spark, root, v)
    assert(m.contains(bigDir), "the big dir must carry, not rewrite")
    assert(m.size <= 1 + 3, s"20 tiny dirs must fold to ~2: got ${m.size}")
    // content exact, pruning re-established on the folded range
    assert(Versioned.readAt(spark, root, v).count() == 10000 + 1000)
    assert(Versioned.readRange(spark, root, v, 0L, 49L).count() == 50)
    assert(dirsTouched(root, v, 0L, 49L) == 1)
    // second pass: the folded 500-row dirs are no longer fragments
    assert(Versioned.optimizeSmall(spark, root, "k", 100, 500).isEmpty)
  }

  test("optimizeSmall folds deletion vectors with the dirs it rewrites") {
    val root = newRoot()
    (0 until 10).foreach { i =>
      Versioned.commitAppendClustered(spark, root,
        ((i * 100L) until ((i + 1) * 100L)).map(x => (x, x % 7)).toDF("k", "v"),
        "k", buckets = 1)
    }
    Versioned.commitDeleteMOR(spark, root, col("k") % 10 === 3)
    val v = Versioned.optimizeSmall(spark, root, "k",
      smallRows = 150, targetRows = 400)
      .getOrElse(fail("tiny dirs must fold"))
    assert(Versioned.dvOf(spark, root, v).isEmpty, "the fold retires the vectors")
    assert(Versioned.readAt(spark, root, v).count() == 1000 - 100)
    assert(Versioned.countAt(spark, root, v) == 900)
  }

  test("re-declaring a different zone-map column never inherits stale ranges") {
    val root = newRoot()
    // cluster on k: per-dir [min,max] measured under k
    Versioned.commitAppendClustered(spark, root,
      (0L until 1000L).map(x => (x, 999L - x)).toDF("k", "w"), "k", buckets = 4)
    // re-declare the map on w: carried dirs must be RE-MEASURED under w
    // (inheriting k's ranges would prune by the wrong values — w runs
    // exactly opposite to k here, the worst case)
    Versioned.commitAppendClustered(spark, root,
      (1000L until 1100L).map(x => (x, 2000L + x)).toDF("k", "w"), "w", buckets = 1)
    assert(Versioned.statsColOf(spark, root, 2).contains("w"))
    val got = Versioned.readRange(spark, root, 2, 0L, 99L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == (900L until 1000L), "w in [0,99] is exactly k in [900,999]")
    // and the optimizer refuses to sweep under a mismatched column
    intercept[IllegalArgumentException](
      Versioned.optimizeClustered(spark, root, "k"))
    intercept[IllegalArgumentException](
      Versioned.optimizeSmall(spark, root, "k", 10, 100))
    intercept[IllegalArgumentException](
      Versioned.optimizeSmall(spark, root, "w", 100, 10)) // threshold > target
  }
}
