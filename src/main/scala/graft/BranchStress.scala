package graft

import graft.io.{Branches, Versioned}
import org.apache.spark.sql.functions._

/** Dev-only scale measurement for branches: the costs that make an
  * experiment branch affordable over a wide table.
  *
  *  - **create** must be O(metadata) — one cloned manifest — however
  *    many dirs main holds (no data I/O).
  *  - **fast-forward merge** must cost O(branch-new dirs) renames plus
  *    ONE manifest write; main's dir count must not enter the data path
  *    (the adopted dirs' stats/rows carry, nothing is re-measured).
  *  - **isolation is free**: main appends while the branch exists cost
  *    exactly what they cost without it.
  *
  * `sbt "runMain graft.BranchStress [mainDirs] [rowsPerDir]"` */
object BranchStress {
  def main(args: Array[String]): Unit = {
    val nDirs = if (args.nonEmpty) args(0).toInt else 512
    val rows = if (args.length > 1) args(1).toLong else 20000L
    val spark = DevSession.local()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val root = s"/tmp/graft_branch_stress/${java.util.UUID.randomUUID()}"
    // a wide main: nDirs clustered dirs in a few commits
    val perCommit = 32
    (0 until nDirs / perCommit).foreach { i =>
      Versioned.commitAppendClustered(spark, root,
        spark.range(i * perCommit * rows, (i + 1) * perCommit * rows)
          .select(col("id"), (col("id") % 97).as("v")),
        "id", buckets = perCommit)
    }
    val vHead = Versioned.currentVersion(spark, root)
    val mainDirs = Versioned.manifest(spark, root, vHead).size
    println(s"main: $mainDirs dirs, ${Versioned.countAt(spark, root, vHead)} rows")

    val (_, tCreate) = time(Branches.create(spark, root, "exp"))
    println(f"create branch over $mainDirs dirs: $tCreate%.3f s (pure metadata)")

    val bRoot = s"$root/refs/exp"
    val newRows = spark.range(nDirs * rows, nDirs * rows + 4 * rows)
      .select(col("id"), (col("id") % 97).as("v"))
    val (_, tBranchIngest) = time(
      Versioned.commitAppendClustered(spark, bRoot, newRows, "id", buckets = 4))
    println(f"branch ingest (4 dirs): $tBranchIngest%.3f s")

    // main advances concurrently
    Versioned.commitAppend(spark, root,
      spark.range(-rows, 0L).select(col("id"), (col("id") % 97).as("v")))

    val (vm, tMerge) = time(Branches.merge(spark, root, "exp"))
    println(f"fast-forward merge (4 adopted dirs onto $mainDirs+1): $tMerge%.3f s")
    val n = Versioned.countAt(spark, root, vm)
    assert(n == nDirs * rows + 4 * rows + rows, s"merged rows $n")
    // carried stats must keep range reads pruned post-merge
    val (got, tRange) = time(
      Versioned.readRange(spark, root, vm, nDirs * rows + 1, nDirs * rows + 100).count())
    assert(got == 100, s"range read got $got")
    println(f"post-merge pruned range read: $tRange%.3f s")
    spark.stop()
  }
}
