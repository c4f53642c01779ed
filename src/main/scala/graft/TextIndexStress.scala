package graft

import graft.io.{TextIndex, Versioned}
import org.apache.spark.sql.functions._

/** Dev-only scale measurement for the token index: the probe economics
  * at a dir count where listing alone would hurt.
  *
  *  - **build tax**: the per-commit token-bloom aggregation over the NEW
  *    dir only, vs the plain append of the same data.
  *  - **probe law**: a rare term residing in few dirs must read those
  *    dirs only; wall compared against the full regexp scan.
  *
  * `sbt "runMain graft.TextIndexStress [dirs] [rowsPerDir]"` */
object TextIndexStress {
  def main(args: Array[String]): Unit = {
    val nDirs = if (args.nonEmpty) args(0).toInt else 64
    val rows = if (args.length > 1) args(1).toLong else 100000L
    val spark = DevSession.local()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // ~40-token synthetic docs from a 1000-word vocabulary; the needle
    // token appears once per 'rows' rows, confined to dir 13
    def batch(i: Int) = {
      val words = (0 until 8).map(j =>
        concat(lit(s"w"), pmod(col("id") * (j + 3), lit(997))))
      val text0 = concat_ws(" ", words: _*)
      spark.range(i * rows, (i + 1) * rows)
        .select(col("id"),
          (if (i == 13) when(col("id") === i * rows + 7, concat(text0, lit(" xneedle")))
            .otherwise(text0)
           else text0).as("text"))
    }
    val root = s"/tmp/graft_textindex_stress/${java.util.UUID.randomUUID()}"
    val plainRoot = s"/tmp/graft_textindex_stress/${java.util.UUID.randomUUID()}"
    var tIndexed = 0.0; var tPlain = 0.0
    (0 until nDirs).foreach { i =>
      tIndexed += time(TextIndex.commitAppendIndexed(spark, root, batch(i), "text"))._2
      tPlain += time(Versioned.commitAppend(spark, plainRoot, batch(i)))._2
    }
    println(f"ingest ${nDirs}x$rows: indexed $tIndexed%.1f s vs plain $tPlain%.1f s " +
      f"(build tax ${tIndexed / tPlain}%.2fx)")
    val v = Versioned.currentVersion(spark, root)
    val (probe, tProbe) = time {
      val df = TextIndex.readToken(spark, root, v, "xneedle")
      (df.select("id").collect().map(_.getLong(0)).toSeq, df.inputFiles.length)
    }
    val (nScan, tScan) = time(
      Versioned.readAt(spark, plainRoot, nDirs)
        .filter(lower(col("text")).rlike("(^|[^a-z0-9])xneedle([^a-z0-9]|$)"))
        .count())
    assert(probe._1 == Seq(13 * rows + 7) && nScan == 1)
    println(f"probe: $tProbe%.2f s reading ${probe._2} files vs full scan $tScan%.2f s " +
      f"(${tScan / tProbe}%.1fx)")
    // POST-FOLD law: the OPTIMIZE fold re-measures token blooms for its
    // output dirs, so the needle probe stays dir-pruned after churn
    val (vf, tFold) = time(Versioned.optimizeSmall(spark, root, "id",
      smallRows = rows + 1, targetRows = math.max(1L, nDirs * rows / 8)).get)
    val nDirs2 = Versioned.manifest(spark, root, vf).size
    val (probe2, tProbe2) = time {
      val df = TextIndex.readToken(spark, root, vf, "xneedle")
      (df.select("id").collect().map(_.getLong(0)).toSeq,
        df.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.length)
    }
    assert(probe2._1 == Seq(13 * rows + 7), "post-fold probe lost the needle")
    println(f"post-fold: fold=$tFold%.1f s -> $nDirs2 dirs, probe $tProbe2%.2f s " +
      f"reading ${probe2._2}/$nDirs2 dirs")
    spark.stop()
  }
}
