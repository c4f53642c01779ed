package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** MERGE economics at accretion scale (BASELINE.md round-14): on a
  * key-clustered table the zone map confines BOTH the matched-dir
  * discovery scan and the rewrite to the dirs overlapping the updates'
  * key range, so a window-confined upsert costs O(overlapping dirs +
  * updates); on an unclustered table discovery must scan the key
  * column of every dir.  Same updates, both layouts, one run.
  *
  * Usage: runMain graft.MergeStress [nRows] [nCommits] [nUpdates]
  */
object MergeStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000000L
    val nCommits = if (args.length > 1) args(1).toInt else 64
    val nUpd = if (args.length > 2) args(2).toLong else 10000L
    val spark = DevSession.local()
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val chunk = n / nCommits
    def rows(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("key"), (col("id") % 1000).as("payload"))
    // updates confined to one chunk's window (the "re-score yesterday's
    // batch" shape) — replacements only, so the key range stays narrow
    // and the zone map can confine discovery; scattered inserts would
    // widen the conservative range to the whole table (documented trade)
    val updates = rows(3 * chunk, 3 * chunk + nUpd)
      .withColumn("payload", col("payload") + 1000000)

    def buildAndMerge(label: String, clustered: Boolean): Unit = {
      val root = s"/tmp/graft_merge_stress/${java.util.UUID.randomUUID()}"
      val (_, tIngest) = timed {
        (0 until nCommits).foreach { i =>
          // clustered: each commit owns a contiguous key chunk (range
          // ingest). plain: commits are hash slices — the unsorted-ingest
          // reality where EVERY dir spans the whole key domain
          val df = if (clustered) rows(i * chunk, (i + 1) * chunk)
            else rows(0, n).filter(pmod(xxhash64(col("key")), lit(nCommits.toLong)) === i)
          if (clustered) Versioned.commitAppendClustered(spark, root, df, "key", 8)
          else Versioned.commitAppend(spark, root, df)
        }
      }
      val before = Versioned.manifest(spark, root, nCommits).toSet
      val (v, tMerge) = timed(Versioned.commitMerge(spark, root, updates, "key"))
      val after = Versioned.manifest(spark, root, v).toSet
      val rewritten = (before -- after).size
      val (cnt, tCheck) = timed(Versioned.readAt(spark, root, v).count())
      require(cnt == n, s"merge lost rows: $cnt")
      val (bumped, _) = timed(Versioned.readAt(spark, root, v)
        .filter(col("payload") >= 1000000).count())
      require(bumped == nUpd, s"merge lost updates: $bumped")
      println(f"MERGESTRESS $label n=$n dirs=${before.size} ingest=$tIngest%.1f s  " +
        f"merge=$tMerge%.2f s (rewrote $rewritten dirs)  head_count=$tCheck%.2f s")
    }
    buildAndMerge("clustered", clustered = true)
    buildAndMerge("plain    ", clustered = false)
    spark.stop()
  }
}
