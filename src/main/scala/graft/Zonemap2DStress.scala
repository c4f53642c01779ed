package graft

import graft.io.{Versioned, Zonemap2D}
import org.apache.spark.sql.functions._

/** 2-D zone-map economics (BASELINE.md round-15): the query class a 1-D
  * map CANNOT serve is the cross-dimension slice — data clustered on x,
  * probe narrow in y.  Every x-bucket spans the full y domain, so the
  * 1-D manifest prunes nothing and the read is O(all dirs); the Morton
  * map gives each dir a small (x,y) rectangle, so the same probe reads
  * only the dirs whose rectangle crosses the y-slab.  Both tables hold
  * the SAME rows in the SAME number of dirs — the layout is the only
  * variable.  Three probes: point box (both maps prune), y-slice with
  * broad x (the 1-D failure mode), and pure-y (x unconstrained, worst
  * case).  Row counts are cross-checked between the two layouts.
  *
  * Usage: runMain graft.Zonemap2DStress [nRows] [buckets] [bits]
  */
object Zonemap2DStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val buckets = if (args.length > 1) args(1).toInt else 256
    val bits = if (args.length > 2) args(2).toInt else 16
    val side = 1L << bits
    val spark = DevSession.local()
    val base = s"/tmp/graft_z2_stress/${java.util.UUID.randomUUID()}"
    val root1 = s"$base/oned"; val root2 = s"$base/twod"
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // x uniform by construction; y uniform via a fixed multiplicative hash
    // (deterministic — the two layouts must hold identical rows)
    val df = spark.range(n).select(
      (col("id") % side).as("x"),
      pmod(col("id") * lit(2654435761L), lit(side)).as("y"),
      (col("id") % 1000).as("payload"))
    val (v1, t1) = timed(Versioned.commitAppendClustered(spark, root1, df, "x", buckets))
    val (v2, t2) = timed(Zonemap2D.commitAppendClustered2(spark, root2, df, "x", "y", bits, buckets))
    val nDirs1 = Versioned.manifest(spark, root1, v1).size
    val nDirs2 = Versioned.manifest(spark, root2, v2).size

    def dirsOf(d: org.apache.spark.sql.DataFrame): Int =
      d.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.length
    def probe(tag: String, loX: Long, hiX: Long, loY: Long, hiY: Long): Unit = {
      val r1 = Versioned.readRange(spark, root1, v1, loX, hiX)
        .filter(col("y").between(loY, hiY))
      val r2 = Zonemap2D.readRange2(spark, root2, v2, loX, hiX, loY, hiY)
      val (c1, ta) = timed(r1.count()); val (c2, tb) = timed(r2.count())
      require(c1 == c2, s"$tag: layouts disagree: $c1 != $c2")
      val d1 = dirsOf(r1); val d2 = dirsOf(r2)
      println(f"Z2STRESS $tag rows=$c1  oned=$ta%.2f s ($d1/$nDirs1 dirs)  " +
        f"zorder=$tb%.2f s ($d2/$nDirs2 dirs)  speedup=${ta / tb}%.1fx")
    }
    println(f"Z2STRESS n=$n buckets=$buckets bits=$bits  " +
      f"ingest oned=$t1%.1f s zorder=$t2%.1f s  dirs=$nDirs1/$nDirs2")
    // point box: both layouts should prune hard
    probe("point", side / 3, side / 3 + side / 64, side / 5, side / 5 + side / 64)
    // the 1-D failure mode: x spans half the domain, y a 1/256 slab
    probe("yslice", side / 4, side / 4 + side / 2, side / 2, side / 2 + side / 256)
    // pure-y probe: x unconstrained — 1-D reads EVERY dir
    probe("purey", 0, side - 1, side / 7, side / 7 + side / 256)
    spark.stop()
  }
}
