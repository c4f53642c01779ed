package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Zone-map economics at scale (BASELINE.md round-14).  The accretion
  * shape that matters at 100 TB is MANY commits (daily/hourly ingest,
  * each covering its own key chunk — the time-series pattern): after
  * `nCommits` clustered appends the table holds nCommits×buckets data
  * dirs, and a narrow range read must cost O(overlapping dirs) — the
  * manifest prunes on driver-side metadata BEFORE the file listing,
  * while a plain filtered read of the head must list every dir and
  * open every footer first, even though parquet row-group stats then
  * skip the data.  At 10³–10⁵ dirs that listing IS the query.
  *
  * Usage: runMain graft.ZonemapStress [nRows] [nCommits] [buckets]
  */
object ZonemapStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val nCommits = if (args.length > 1) args(1).toInt else 128
    val buckets = if (args.length > 2) args(2).toInt else 8
    val spark = DevSession.local()
    val root = s"/tmp/graft_zonemap_stress/${java.util.UUID.randomUUID()}"
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val chunk = n / nCommits
    val (_, tIngest) = timed {
      (0 until nCommits).foreach { i =>
        val df = spark.range(i * chunk, (i + 1) * chunk).select(
          col("id").as("key"), (col("id") % 1000).as("payload"))
        Versioned.commitAppendClustered(spark, root, df, "key", buckets)
      }
    }
    val v = Versioned.currentVersion(spark, root)
    val nDirs = Versioned.manifest(spark, root, v).size
    // a window interior to one commit's chunk
    val lo = 3 * chunk + chunk / 4; val hi = lo + chunk / 8
    val (nPruned, tPruned) = timed(Versioned.readRange(spark, root, v, lo, hi).count())
    val dirsRead = Versioned.readRange(spark, root, v, lo, hi).inputFiles
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct.length
    val (nFull, tFull) = timed(
      Versioned.readAt(spark, root, v).filter(col("key").between(lo, hi)).count())
    require(nPruned == nFull, s"pruned read lost rows: $nPruned != $nFull")
    println(f"ZONEMAPSTRESS n=$n commits=$nCommits dirs=$nDirs ingest=$tIngest%.1f s  " +
      f"range_read=$tPruned%.2f s ($dirsRead/$nDirs dirs, $nPruned rows)  " +
      f"full_filter=$tFull%.2f s  speedup=${tFull / tPruned}%.1fx")
    spark.stop()
  }
}
