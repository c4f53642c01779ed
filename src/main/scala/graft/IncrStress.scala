package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement of the incremental-dedup STAGING story
  * (`q_llm_dedup_incremental`, llm/DedupIncr.scala): the corpus shingle
  * index is a durable `graft.io.Staged` artifact, so day-2 runs skip the
  * whole tokenize→shingle→df-cap pipeline and pay only the batch join +
  * Jaccard verify.
  *
  * Three timings, each in its OWN SparkContext (a stopped context drops
  * Staged's in-memory entry, so the day-2 run proves the PARQUET artifact
  * is what's being reused — the daily-application shape, not same-session
  * memoization):
  *
  *   1. cold  — staging dir set, artifact absent: builds + publishes the
  *              index, then runs the query.
  *   2. day2  — NEW context, same staging dir: reads the artifact.
  *   3. batch — the batch-only shingle pipeline WITHOUT staging, the
  *              incremental cost a real day-2 ingest adds for docs the
  *              artifact hasn't seen (here re-derived from the batch
  *              split of the same table).
  *
  * `sbt "runMain graft.IncrStress <sfDir>"` — prints one JSON line; the
  * numbers land in BASELINE.md.
  */
object IncrStress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val stagingDir = java.nio.file.Files.createTempDirectory("graft-incr-staging")
      .toString
    def fresh(): SparkSession = {
      val s = DevSession.local()
      s.conf.set("spark.graft.staging.dir", stagingDir)
      s
    }
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val s1 = fresh()
    val (coldSec, rows1) =
      timed(SparkEntry.queries("q_llm_dedup_incremental")(s1, sfDir).count())
    s1.stop()

    val s2 = fresh()
    val (day2Sec, rows2) =
      timed(SparkEntry.queries("q_llm_dedup_incremental")(s2, sfDir).count())
    s2.stop()
    require(rows1 == rows2, s"cold/day2 row mismatch: $rows1 vs $rows2")

    // incremental-ingest cost: shingle + df-cap ONLY the batch docs,
    // bypassing Staged (no staging conf) so nothing is reused
    val s3 = DevSession.local()
    val (batchSec, batchPostings) = timed {
      val batchShingles = graft.io.Tables.documents(s3, sfDir)
        .filter(col("doc_id") % 10 >= 8)
        .select(col("doc_id"),
          explode(graft.fns.TextKernelCols.shingleHashes(s3, col("text"))).as("s"))
      graft.llm.TextOps.dfCapped(batchShingles, graft.llm.TextOps.DF_CAP).count()
    }
    val artifactBytes = {
      val dir = new java.io.File(stagingDir)
      def size(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      size(dir)
    }
    s3.stop()
    println(f"""{"stress":"dedupIncrStaging","sf":"$sfDir","rows":$rows1,"cold_sec":$coldSec%.2f,"day2_sec":$day2Sec%.2f,"batch_shingle_sec":$batchSec%.2f,"batch_postings":$batchPostings,"artifact_bytes":$artifactBytes}""")
  }
}
