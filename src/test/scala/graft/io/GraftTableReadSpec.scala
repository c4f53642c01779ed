package graft.io

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the registered batch read path
  * (`spark.read.format("graft-table")`): pushed filters reach buildScan
  * (PushedFilters in the plan) and translate into manifest dir pruning
  * — zone-map ranges, multi-column intersection, bloom point probes —
  * while every filter is re-applied row-level (conservative dirs can
  * never leak rows); column pruning, time travel options, deletion
  * vectors, and the manifest-fed sizeInBytes broadcast estimate. */
class GraftTableReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_table_read/${java.util.UUID.randomUUID()}"

  private def std(root: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graft-table"))((r, o) =>
      r.option(o._1, o._2)).load(root)

  /** A doc_id-clustered table (4 range buckets over ids 0..399, m = 10*id)
    * with a declared m zone map. */
  private def clustered(): String = {
    val root = newRoot()
    Versioned.commitAppendClustered(spark,
      root, (0L until 400L).map(i => (i, 10 * i)).toDF("id", "m"), "id", 4)
    Versioned.commitDeclareStatsCols(spark, root, Seq("m"))
    root
  }

  test("full read = readAt; load(root) positional path works") {
    val root = clustered()
    val got = std(root)
    assert(got.schema.fieldNames.toSeq == Seq("id", "m"))
    val want = Versioned.readAt(spark, root, 2)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("pushed range filters dir-prune and stay row-exact; PushedFilters in the plan") {
    val root = clustered()
    val df = std(root).where(col("id").between(100L, 180L))
    assert(df.queryExecution.executedPlan.toString.contains("PushedFilters"),
      "the filter must reach the relation, not sit above an opaque scan")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val (kept, total) = GraftTable.lastScanDirs
    assert(total == 4 && kept < total, s"expected dir pruning, got $kept/$total")
    assert(rows.toSeq == (100L to 180L).map(i => (i, 10 * i)))
  }

  test("two-column predicates intersect (clustered + declared map prune multiplicatively)") {
    val root = clustered()
    // id's bucket says dirs [100..199]; m = 10*id in [500..1200] says
    // ids [50..120] — the intersection is ONE dir's worth
    val df = std(root).where(col("id") >= 100L && col("m") <= 1200L)
    val n = df.count()
    val (kept, total) = GraftTable.lastScanDirs
    // range-bucket boundaries are sampled, so allow one dir of slack —
    // the point is intersection beats either predicate alone (3 dirs)
    assert(kept <= 2 && total == 4, s"conjunction must intersect, got $kept/$total")
    assert(n == 21) // ids 100..120
  }

  test("pushed IN on the bloom column prunes dirs; equality too") {
    val root = newRoot()
    // interleaved appends: every dir spans all ids — zone maps useless
    (0 until 4).foreach { r =>
      BloomIndex.commitAppendBloom(spark, root,
        (0L until 400L).filter(_ % 4 == r).map(i => (i, 10 * i)).toDF("id", "m"),
        "id")
    }
    val in = std(root).where(col("id").isin(17L, 21L)) // both ≡ 1 (mod 4)
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(17L, 21L))
    val (k1, t1) = GraftTable.lastScanDirs
    assert(t1 == 4 && k1 <= 2, s"bloom IN must prune, got $k1/$t1")
    val eq = std(root).where(col("id") === 138L)
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(138L))
    val (k2, t2) = GraftTable.lastScanDirs
    assert(t2 == 4 && k2 <= 2, s"bloom equality must prune, got $k2/$t2")
  }

  test("unprunable filters (Or, string ops) read everything but stay exact") {
    val root = clustered()
    val df = std(root).where(col("id") === 5L || col("id") === 350L)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 350L))
    val (kept, total) = GraftTable.lastScanDirs
    assert(kept == total, "an OR prunes nothing at dir level (re-applied row-level)")
  }

  test("version / asOfTimestamp time travel; both together refused") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, 10L)).toDF("id", "m"))
    val ts1 = Versioned.tsOf(spark, root, 1)
    Versioned.commitAppend(spark, root, Seq((2L, 20L)).toDF("id", "m"))
    assert(std(root).count() == 2)
    assert(std(root, "version" -> "1").count() == 1)
    assert(std(root, "asOfTimestamp" -> ts1.toString).count() == 1)
    intercept[IllegalArgumentException] {
      std(root, "version" -> "1", "asOfTimestamp" -> ts1.toString).count()
    }
  }

  test("deletion vectors apply through the standard read") {
    val root = clustered()
    Versioned.commitDeleteMOR(spark, root, col("id") % 2 === 0L)
    val got = std(root).where(col("id") < 10L).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 3L, 5L, 7L, 9L))
    assert(std(root).count() == 200)
  }

  test("column pruning and the zero-column count path") {
    val root = clustered()
    val one = std(root).select("m").where(col("id") === 7L)
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(70L))
    assert(std(root).count() == 400) // requiredColumns = [] path
  }

  test("manifest-fed sizeInBytes: a graft-read dim broadcast-joins on Catalyst's own estimate") {
    val root = newRoot()
    Versioned.commit(spark, root, (0L until 50L).map(i => (i, s"n$i")).toDF("k", "name"))
    val fact = spark.range(0, 200000).select((col("id") % 50).as("k"), col("id").as("v"))
    val j = fact.join(std(root), Seq("k"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a tiny versioned dim read via the standard API must broadcast:\n$plan")
    assert(j.count() == 200000)
  }
}
