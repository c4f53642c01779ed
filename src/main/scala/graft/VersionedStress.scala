package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Dev-only scale measurement for the versioned-table commit log: commit
  * cost must stay FLAT as history grows (each commit writes one data dir
  * + one O(#dirs) manifest), read cost grows with the dir count of the
  * version being read (the COW trade), and a compaction (full-snapshot
  * commit) restores O(1)-dir reads without touching history — the
  * vacuum/compact economics a 100 TB deployment budgets around.
  *
  * `sbt "runMain graft.VersionedStress [nAppends] [rowsPerAppend]"` */
object VersionedStress {
  def main(args: Array[String]): Unit = {
    val nAppends = if (args.nonEmpty) args(0).toInt else 200
    val rows = if (args.length > 1) args(1).toLong else 10000L
    val spark = DevSession.local()
    val root = s"/tmp/graft_versioned_stress/${java.util.UUID.randomUUID()}"
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def batch(i: Int) = spark.range(i * rows, (i + 1) * rows)
      .select(col("id"), (col("id") % 97).as("v"))

    val commitTimes = (0 until nAppends).map { i =>
      time(Versioned.commitAppend(spark, root, batch(i)))._2
    }
    val head = Versioned.currentVersion(spark, root)
    def q1(xs: Seq[Double]) = xs.sorted.apply(xs.length / 4)
    def q3(xs: Seq[Double]) = xs.sorted.apply(3 * xs.length / 4)
    println(f"VERSIONED commits=$nAppends rows/append=$rows " +
      f"first-quartile ${q1(commitTimes)}%.2f s last-quartile ${q3(commitTimes)}%.2f s " +
      f"(flat-commit law: quartiles within ~1.5x)")

    val (n1, tReadHead) = time(Versioned.readAt(spark, root, head).count())
    val (_, tReadV1) = time(Versioned.readAt(spark, root, 1).count())
    assert(n1 == nAppends * rows, s"head rows $n1")
    println(f"VERSIONED read v1 (1 dir) ${tReadV1}%.2f s vs head ($nAppends dirs) ${tReadHead}%.2f s")

    // compaction: one full-snapshot commit collapses the head to 1 dir
    val (_, tCompact) = time(
      Versioned.commit(spark, root, Versioned.readAt(spark, root, head)))
    val (n2, tReadCompacted) = time(
      Versioned.readAt(spark, root, head + 1).count())
    assert(n2 == n1)
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    val dirsLeft = new java.io.File(s"$root/data").listFiles().count(_.isDirectory)
    assert(dirsLeft == 1, s"vacuum left $dirsLeft dirs")
    println(f"VERSIONED compact ${tCompact}%.1f s, read compacted ${tReadCompacted}%.2f s, " +
      f"vacuum(keep=1) -> $dirsLeft data dir")
    spark.stop()
  }
}
