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

    // REBASE law: a diverged branch (own appends + a MOR delete) replayed
    // onto a moved wide main must cost O(branch delta + manifests), never
    // O(main's data)
    Branches.create(spark, root, "exp2")
    val b2 = s"$root/refs/exp2"
    Versioned.commitAppend(spark, b2,
      spark.range(-3 * rows, -2 * rows).select(col("id"), (col("id") % 97).as("v")))
    Versioned.commitDeleteMOR(spark, b2, col("id") === 5L)
    Versioned.commitAppend(spark, root,
      spark.range(-2 * rows, -rows).select(col("id"), (col("id") % 97).as("v")))
    val (_, tRebase) = time(Branches.rebase(spark, root, "exp2"))
    val (_, tMerge2) = time(Branches.merge(spark, root, "exp2"))
    println(f"rebase (1 append dir + 1 DV delta onto ${mainDirs + 5}-dir main): " +
      f"$tRebase%.3f s; snapshot merge: $tMerge2%.3f s")

    // TXN law: a catalog fence over two members is one metadata record on
    // top of the member commits
    val cat = s"/tmp/graft_branch_stress/cat-${java.util.UUID.randomUUID()}"
    val mv = s"/tmp/graft_branch_stress/mv-${java.util.UUID.randomUUID()}"
    Versioned.commit(spark, mv, spark.range(1).select(col("id")))
    graft.io.TxnCatalog.create(spark, cat, Map("t" -> root, "m" -> mv))
    val (_, tTxn) = time(graft.io.TxnCatalog.commitAtomic(spark, cat, Seq(
      "t" -> (s => Versioned.commitAppend(s, root,
        spark.range(-4 * rows, -3 * rows).select(col("id"), (col("id") % 97).as("v")))),
      "m" -> (s => Versioned.commit(s, mv, spark.range(1).select(col("id")))))))
    val (_, tMember) = time(Versioned.commitAppend(spark, root,
      spark.range(-5 * rows, -4 * rows).select(col("id"), (col("id") % 97).as("v"))))
    println(f"atomic 2-table txn: $tTxn%.3f s vs bare member commit $tMember%.3f s " +
      f"(fence overhead ${tTxn - tMember}%.3f s)")
    spark.stop()
  }
}
