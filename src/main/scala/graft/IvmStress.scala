package graft

import graft.io.{IncrementalView, Versioned}
import org.apache.spark.sql.functions._

/** Scale law for incremental MV maintenance (BASELINE.md round-14):
  * after a fixed-size day-2 append / copy-on-write update, the refresh
  * cost must be BATCH-sized while the full recompute is CORPUS-sized —
  * the economics that make a fresh corpus-wide GROUP BY affordable at
  * 100 TB.  Also measures commitUpdate's touched-dir discovery, whose
  * id-range predicate prunes base dirs via parquet row-group stats.
  *
  * Usage: runMain graft.IvmStress [nBase] [nBatch] [nDirs]
  */
object IvmStress {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 100000000L
    val nBatch = if (args.length > 1) args(1).toLong else 10000L
    val nDirs = if (args.length > 2) args(2).toInt else 8
    val spark = DevSession.local()
    val root = s"/tmp/graft_ivm_stress/${java.util.UUID.randomUUID()}"
    // high-entropy derived columns: periodic id-modulo columns RLE/dict
    // compress so well the recompute scan is unrealistically free
    def rows(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id"), pmod(xxhash64(col("id")), lit(1000L)).as("k"),
        pmod(xxhash64(col("id") + 7), lit(97L)).as("m"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val keys = Seq("k")
    val measures = Seq("cnt" -> lit(1L), "sum_m" -> col("m"))
    def recompute(v: Int) = Versioned.readAt(spark, root, v).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("sum_m"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // base corpus in nDirs append commits
    val per = nBase / nDirs
    val (_, tLoad) = timed {
      (0 until nDirs).foreach { i =>
        Versioned.commitAppend(spark, root,
          rows(i * per, if (i == nDirs - 1) nBase else (i + 1) * per))
      }
    }
    val ((mv0), tBuild) = timed { val m = recompute(nDirs).cache(); m.count(); m }

    // day-2 append: refresh reads ONLY the appended dir
    val vA = Versioned.commitAppend(spark, root, rows(nBase, nBase + nBatch))
    val (mv1, tRefresh1) = timed {
      val m = IncrementalView.refresh(mv0,
        Versioned.diff(spark, root, vA - 1, vA), keys, measures).cache()
      m.count(); m
    }

    // copy-on-write update confined to the batch dir
    val (_, tUpdate) = timed {
      Versioned.commitUpdate(spark, root, col("id") >= nBase,
        d => d.withColumn("m", when(col("id") >= nBase, col("m") + 1).otherwise(col("m"))))
    }
    val (mv2, tRefresh2) = timed {
      val m = IncrementalView.refresh(mv1,
        Versioned.diff(spark, root, vA, vA + 1), keys, measures).cache()
      m.count(); m
    }

    val (full, tFull) = timed { val m = recompute(vA + 1); m.count(); m }
    require(canon(mv2) == canon(full), "incremental != full recompute")
    println(f"IVMSTRESS nBase=$nBase nBatch=$nBatch dirs=$nDirs " +
      f"load=$tLoad%.2f build=$tBuild%.2f append_refresh=$tRefresh1%.2f " +
      f"cow_update=$tUpdate%.2f update_refresh=$tRefresh2%.2f full_recompute=$tFull%.2f s  OK")
    spark.stop()
  }
}
