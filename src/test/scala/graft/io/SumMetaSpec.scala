package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for metadata sums: answers survive deleting every data file
  * (zero-I/O PROOF), rewrites re-measure only their new dirs, deletion
  * vectors void the answer instead of corrupting it, and untrustworthy
  * dirs (all-null, failed casts) force the scan fallback. */
class SumMetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_summeta_spec/${java.util.UUID.randomUUID()}"

  test("sum answered from metadata alone (files deleted underneath)") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 100L).map(i => (i, i * 2)).toDF("id", "m"))
    Versioned.commitDeclareSum(spark, root, "m")
    val v = Versioned.commitAppend(spark, root,
      (101L to 120L).map(i => (i, i * 2)).toDF("id", "m"))
    val want = (1L to 120L).map(_ * 2).sum
    assert(Versioned.sumAt(spark, root, v).contains(want))
    // the PROOF: physically delete every parquet file; metadata still answers
    val dataDir = new java.io.File(s"$root/data")
    def purge(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(purge)
      else if (f.getName.endsWith(".parquet")) f.delete()
    }
    purge(dataDir)
    assert(Versioned.sumAt(spark, root, v).contains(want))
    assert(Versioned.countAt(spark, root, v) == 120)
  }

  test("CoW rewrite re-measures only its new dirs; the sum follows") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 50L).map(i => (i, 10L)).toDF("id", "m"))
    Versioned.commitDeclareSum(spark, root, "m")
    val v = Versioned.commitUpdate(spark, root, col("id") <= 10,
      df => df.withColumn("m", when(col("id") <= 10, lit(1000L)).otherwise(col("m"))))
    assert(Versioned.sumAt(spark, root, v).contains(10 * 1000L + 40 * 10L))
  }

  test("live deletion vectors void the metadata sum (fallback, not lies)") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 50L).map(i => (i, i)).toDF("id", "m"))
    Versioned.commitDeclareSum(spark, root, "m")
    val v = Versioned.commitDeleteMOR(spark, root, col("id") === 7)
    assert(Versioned.sumAt(spark, root, v).isEmpty)
    // a compaction folds the vectors; metadata answers again, exactly
    val v2 = Versioned.commit(spark, root, Versioned.readAt(spark, root, v))
    assert(Versioned.sumAt(spark, root, v2).contains((1L to 50L).sum - 7L))
  }

  test("untrustworthy dirs void the answer; empty dirs contribute zero") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).map(i => (i, s"$i")).toDF("id", "m"))
    Versioned.commitDeclareSum(spark, root, "m") // castable strings: fine
    assert(Versioned.sumAt(spark, root, 2).contains(55L))
    val v = Versioned.commitAppend(spark, root,
      Seq((11L, "not-a-number")).toDF("id", "m"))
    assert(Versioned.sumAt(spark, root, v).isEmpty, "failed cast must void")
    val root2 = newRoot()
    Versioned.commit(spark, root2, (1L to 5L).map(i => (i, i)).toDF("id", "m"))
    Versioned.commitDeclareSum(spark, root2, "m")
    val v2 = Versioned.commitAppend(spark, root2,
      Seq.empty[(Long, Long)].toDF("id", "m"))
    assert(Versioned.sumAt(spark, root2, v2).contains(15L),
      "an empty dir has rows=0 and contributes nothing")
  }

  test("sums and the void markers survive restore and shallow clone") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 20L).map(i => (i, i)).toDF("id", "m"))
    Versioned.commitDeclareSum(spark, root, "m")
    Versioned.commitAppend(spark, root, Seq((21L, "bad")).toDF("id", "m")) // void dir
    val v3 = Versioned.currentVersion(spark, root)
    assert(Versioned.sumAt(spark, root, v3).isEmpty)
    // restore to the clean version: declaration AND entries must carry
    val v4 = Versioned.restore(spark, root, 2)
    assert(Versioned.sumAt(spark, root, v4).contains(210L),
      "restore must carry the sum declaration and entries")
    // shallow clone: metadata sums work immediately on the clone
    val dst = newRoot()
    Versioned.cloneAt(spark, root, dst, v4)
    assert(Versioned.sumAt(spark, dst, 1).contains(210L),
      "a clone must carry the sum declaration and entries")
    // the void marker itself survives replay: restoring the VOIDED
    // version keeps the dir marked (no metadata answer, no re-scan)
    val v5 = Versioned.restore(spark, root, v3)
    assert(Versioned.sumAt(spark, root, v5).isEmpty)
    assert(Versioned.sumVoidOf(spark, root, v5).nonEmpty)
  }

  test("an unsummable dir is probed once, then remembered as void") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).map(i => (i, i)).toDF("id", "m"))
    Versioned.commitDeclareSum(spark, root, "m")
    val v = Versioned.commitAppend(spark, root, Seq((11L, "x")).toDF("id", "m"))
    assert(Versioned.sumVoidOf(spark, root, v).size == 1)
    val voidDir = Versioned.sumVoidOf(spark, root, v).head
    // delete the poisoned dir's files: a re-scan would now crash, so a
    // green later commit PROVES the void marker skipped the probe
    val p = new java.io.File(s"$root/$voidDir")
    p.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    val v2 = Versioned.commitAppend(spark, root, Seq((12L, 12L)).toDF("id", "m"))
    assert(Versioned.sumVoidOf(spark, root, v2).contains(voidDir))
  }

  test("re-declaration with a different column is refused") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, 2L, 3L)).toDF("id", "a", "b"))
    Versioned.commitDeclareSum(spark, root, "a")
    intercept[IllegalArgumentException] {
      Versioned.commitDeclareSum(spark, root, "b")
    }
    Versioned.commitDeclareSum(spark, root, "a") // idempotent confirm is fine
  }
}
