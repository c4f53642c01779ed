package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale law for the MULTI-COLUMN zone map: a 128-dir, 12.8 M-row table
  * laid out tight on two independent columns (16 id-windows × 8
  * m-bands).  Measures what the second predicate buys at dir level —
  * the conjunction should prune MULTIPLICATIVELY (id window ∩ m band),
  * while the single-column probe is stuck at the id window — and that
  * the whole decision happens on driver-side manifest metadata (the
  * pruned read's wall time tracks the dirs read, not the corpus).
  * Run: `sbt "runMain graft.ZonemapMultiStress"`; record in BASELINE.md. */
object ZonemapMultiStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = s"/tmp/graft_zm_stress/${java.util.UUID.randomUUID()}"
    val perDir = 100000L
    // 16 id-windows x 8 m-bands, one commit per (window, band) pair —
    // the multi-source ingest shape that makes both columns tight
    for (win <- 0L until 16L; band <- 0L until 8L) {
      val lo = win * perDir * 8 + band * perDir
      val df = spark.range(lo, lo + perDir)
        .select(col("id"), (lit(band * 1000000L) + col("id") % 1000L).as("m"))
      io.Versioned.commitAppend(spark, root, df)
    }
    val v = io.Versioned.commitDeclareStatsCols(spark, root, Seq("id", "m"))
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def dirsOf(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.split("/").dropRight(1).mkString("/")).distinct.length
    // probe: one id window's span (8 dirs), one m band (1 of those 8)
    val idLo = 3L * perDir * 8; val idHi = idLo + perDir * 8 - 1
    val mLo = 5000000L; val mHi = 5999999L
    val (one, tOne) = time {
      val d = io.Versioned.readRangeOn(spark, root, v, "id", idLo, idHi)
        .filter(col("m").between(mLo, mHi))
      (dirsOf(d), d.count())
    }
    val (two, tTwo) = time {
      val d = io.Versioned.readRangeAll(spark, root, v,
        Seq(("id", idLo, idHi), ("m", mLo, mHi)))
      (dirsOf(d), d.count())
    }
    val (full, tFull) = time {
      io.Versioned.readAt(spark, root, v)
        .filter(col("id").between(idLo, idHi) && col("m").between(mLo, mHi))
        .count()
    }
    assert(one._2 == two._2 && two._2 == full, s"pruning changed rows: $one $two $full")
    println(f"ZMSTRESS 128 dirs x $perDir rows: id-only probe ${one._1} dirs " +
      f"${tOne}%.2f s; id+m probe ${two._1} dirs ${tTwo}%.2f s; " +
      f"full scan ${tFull}%.2f s; rows ${full}")
    spark.stop()
  }
}
