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
}
