package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for composite-key MERGE: rows match only when EVERY key column
  * matches (same-partial-key rows survive — the trap single-column
  * merges force concat workarounds for), the CoW and MOR forms land the
  * same relation, the streaming fence voids replays, and conjunctive
  * zone-map confinement keeps untouched windows verbatim. */
class MergeKeysSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_merge_keys/${java.util.UUID.randomUUID()}"

  private def base() = (for { a <- 0L until 20L; b <- 0L until 20L }
    yield (a, b, a * 1000 + b)).toDF("a", "b", "v")

  test("matching needs EVERY key column; partial-key rows survive") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, base())
    // upsert (3, 7) and insert (99, 1): no other (3, *) or (*, 7) row moves
    val v = Versioned.commitMergeKeys(spark, root,
      Seq((3L, 7L, -1L), (99L, 1L, -2L)).toDF("a", "b", "v"), Seq("a", "b"))
    val got = Versioned.readAt(spark, root, v)
    assert(got.count() == 401)
    assert(got.filter(col("v") < 0).count() == 2)
    assert(got.filter(col("a") === 3L).count() == 20, "the a=3 stripe must survive")
    assert(got.filter(col("b") === 7L).count() == 20, "the b=7 stripe must survive")
    assert(got.filter(col("a") === 3L && col("b") === 7L)
      .select("v").as[Long].head() == -1L)
  }

  test("MOR composite merge lands the same relation as CoW, zero rewrites") {
    val cow = newRoot(); val mor = newRoot()
    Versioned.commitAppend(spark, cow, base())
    Versioned.commitAppend(spark, mor, base())
    val ups = Seq((5L, 5L, -5L), (0L, 19L, -6L), (50L, 0L, -7L))
      .toDF("a", "b", "v")
    Versioned.commitMergeKeys(spark, cow, ups, Seq("a", "b"))
    val vm = Versioned.commitMergeKeysMOR(spark, mor, ups, Seq("a", "b"))
    // MOR: the base dir survives untouched, vectors carry the evictions
    assert(Versioned.manifest(spark, mor, vm)
      .contains(Versioned.manifest(spark, mor, 1).head))
    assert(Versioned.dvRowsOf(spark, mor, vm).values.sum == 2) // 2 matched
    val a = Versioned.readAt(spark, cow, Versioned.currentVersion(spark, cow))
    val b = Versioned.readAt(spark, mor, vm)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(Versioned.countAt(spark, mor, vm) == 401)
  }

  test("the streaming fence voids a replayed composite-key batch") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, base())
    val ups = Seq((1L, 2L, -9L)).toDF("a", "b", "v")
    assert(Versioned.commitMergeBatchKeys(spark, root, 5L, ups, Seq("a", "b")).isDefined)
    assert(Versioned.commitMergeBatchKeys(spark, root, 5L, ups, Seq("a", "b")).isEmpty)
    assert(Versioned.readAt(spark, root, 2).count() == 400)
  }

  test("conjunctive confinement: untouched windows carry verbatim under a multi-column map") {
    val root = newRoot()
    // 4 disjoint a-windows as separate dirs, mapped on BOTH columns
    (0 until 4).foreach(k => Versioned.commitAppend(spark, root,
      base().filter(col("a") >= k * 5 && col("a") < (k + 1) * 5)))
    Versioned.commitDeclareStatsCols(spark, root, Seq("a", "b"))
    val before = Versioned.manifest(spark, root, 5)
    val v = Versioned.commitMergeKeys(spark, root,
      Seq((17L, 3L, -1L)).toDF("a", "b", "v"), Seq("a", "b"))
    val after = Versioned.manifest(spark, root, v)
    // only the a∈[15,20) dir was rewritten; the other three carried
    assert(before.count(after.contains) == 3,
      s"confinement must keep untouched windows verbatim ($before vs $after)")
    assert(Versioned.readAt(spark, root, v).count() == 400)
  }
}
