package graft

import graft.io.{BloomIndex, Versioned}
import org.apache.spark.sql.functions._

/** Bloom dir-index economics (BASELINE.md round-15).  The query class
  * is the point lookup on a column the LAYOUT does not order: `nCommits`
  * bloom-indexed appends of hash-scattered keys (every dir spans the
  * full key domain — a zone map prunes nothing), then single-key probes.
  * Each key lives in exactly ONE dir, so perfect pruning reads 1 dir;
  * the bloom false-positive rate decides how many extras are read, and
  * the full filtered read is the no-index baseline.  `bits` should be
  * ~10× the per-dir distinct-key count (see BloomIndex sizing note).
  *
  * Usage: runMain graft.BloomStress [nRows] [nCommits] [bits]
  */
object BloomStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val nCommits = if (args.length > 1) args(1).toInt else 64
    val bits = if (args.length > 2) args(2).toInt else 1 << 24
    val spark = DevSession.local()
    val root = s"/tmp/graft_bloom_stress/${java.util.UUID.randomUUID()}"
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val chunk = n / nCommits
    // commit i holds the keys hashing to residue i: scattered by VALUE,
    // so no range layout could serve the probe
    val (_, tIngest) = timed {
      (0 until nCommits).foreach { i =>
        val df = spark.range(i * chunk, (i + 1) * chunk)
          .select((col("id") * lit(2654435761L) % n).as("key"),
            (col("id") % 1000).as("payload"))
        BloomIndex.commitAppendBloom(spark, root, df, "key", bits)
      }
    }
    val v = Versioned.currentVersion(spark, root)
    val nDirs = Versioned.manifest(spark, root, v).size
    val probes = Seq(12345L * 2654435761L % n, 777L * 2654435761L % n,
      98765432L % n * 2654435761L % n)
    def dirsOf(d: org.apache.spark.sql.DataFrame): Int =
      d.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.length
    val pr = BloomIndex.readPoint(spark, root, v, probes)
    val (nHit, tPoint) = timed(pr.count())
    val dirsRead = dirsOf(pr)
    val (nFull, tFull) = timed(
      Versioned.readAt(spark, root, v).filter(col("key").isin(probes: _*)).count())
    require(nHit == nFull, s"bloom read lost rows: $nHit != $nFull")
    println(f"BLOOMSTRESS n=$n commits=$nCommits bits=$bits dirs=$nDirs " +
      f"ingest=$tIngest%.1f s  point_read=$tPoint%.2f s ($dirsRead/$nDirs dirs, " +
      f"$nHit rows)  full_filter=$tFull%.2f s  speedup=${tFull / tPoint}%.1fx")
    // POST-FOLD law: an OPTIMIZE fold re-measures the fold dirs' filters
    // (writeClustered -> bloomsForStaged), so the point probe must stay
    // pruned after the rewrite instead of decaying to a full read
    val (vf, tFold) = timed(Versioned.optimizeSmall(spark, root, "key",
      smallRows = chunk + 1, targetRows = math.max(1L, n / 8)).get)
    val nDirs2 = Versioned.manifest(spark, root, vf).size
    val pr2 = BloomIndex.readPoint(spark, root, vf, probes)
    val (nHit2, tPoint2) = timed(pr2.count())
    require(nHit2 == nFull, s"post-fold bloom read lost rows: $nHit2 != $nFull")
    println(f"BLOOMSTRESS post-fold: fold=$tFold%.1f s -> $nDirs2 dirs, " +
      f"point_read=$tPoint2%.2f s (${dirsOf(pr2)}/$nDirs2 dirs)")
    spark.stop()
  }
}
