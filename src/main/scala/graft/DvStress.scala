package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Dev-only scale measurement for merge-on-read deletes: the economics
  * that justify deletion vectors at 100 TB.
  *
  *  - **Write cost**: deleting a sparse scatter (one row in ~1000,
  *    present in EVERY dir) must cost O(deleted rows) — one tiny sidecar
  *    — while the copy-on-write delete of the SAME predicate rewrites
  *    every dir it touches, i.e. the whole table.  The ratio is the
  *    write-amplification the vector defers.
  *  - **Read tax**: the vectored read pays one (broadcast) anti join;
  *    measured against the plain read and the post-fold read.
  *  - **Fold**: one compaction retires all vectors and returns the read
  *    to baseline — the deferred rewrite, paid once on the schedule the
  *    table owner picks instead of at every delete.
  *
  * `sbt "runMain graft.DvStress [dirs] [rowsPerDir]"` */
object DvStress {
  def main(args: Array[String]): Unit = {
    val nDirs = if (args.nonEmpty) args(0).toInt else 32
    val rows = if (args.length > 1) args(1).toLong else 1000000L
    val spark = DevSession.local()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def batch(i: Int) = spark.range(i * rows, (i + 1) * rows)
      .select(col("id"), (col("id") % 97).as("v"),
        concat(lit("payload-"), col("id")).as("s"))
    def dataBytes(root: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$root/data"))
    }
    // the sparse scatter: one row in ~1000, landing in EVERY dir
    val pred = col("id") % 1000 === 7
    val total = nDirs * rows
    val expectLive = (0L until total).count(_ % 1000 == 7) // for the asserts

    // ---- MOR table ----
    val morRoot = s"/tmp/graft_dv_stress/${java.util.UUID.randomUUID()}"
    (0 until nDirs).foreach(i => Versioned.commitAppend(spark, morRoot, batch(i)))
    val bytesBefore = dataBytes(morRoot)
    val (_, tPlainRead) = time(Versioned.readAt(spark, morRoot, nDirs).count())
    val (vMor, tMor) = time(Versioned.commitDeleteMOR(spark, morRoot, pred))
    val morBytes = dataBytes(morRoot) - bytesBefore
    val (nAfterMor, tVectoredRead) =
      time(Versioned.readAt(spark, morRoot, vMor).count())
    assert(nAfterMor == total - expectLive, s"MOR head rows $nAfterMor")
    assert(Versioned.countAt(spark, morRoot, vMor) == nAfterMor)

    // ---- CoW table, same layout, same predicate ----
    val cowRoot = s"/tmp/graft_dv_stress/${java.util.UUID.randomUUID()}"
    (0 until nDirs).foreach(i => Versioned.commitAppend(spark, cowRoot, batch(i)))
    val cowBefore = dataBytes(cowRoot)
    val (_, tCow) = time(
      Versioned.commitUpdate(spark, cowRoot, pred, d => d.filter(!pred)))
    val cowBytes = dataBytes(cowRoot) - cowBefore
    assert(Versioned.readAt(spark, cowRoot,
      Versioned.currentVersion(spark, cowRoot)).count() == nAfterMor)

    println(f"DV delete 1-in-1000 scatter over $nDirs dirs x $rows rows: " +
      f"MOR ${tMor}%.2f s / ${morBytes / 1e6}%.1f MB written vs " +
      f"CoW ${tCow}%.2f s / ${cowBytes / 1e6}%.1f MB written " +
      f"(write amplification ${cowBytes.toDouble / math.max(1, morBytes)}%.0fx)")

    // ---- read tax + fold ----
    // honest read tax: a full-scan aggregate on both sides (a bare
    // count() is answered from parquet footers on the plain path — no
    // data read — and would overstate the vector tax ~25x)
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("v"))).head().getLong(0)
    agg(Versioned.readAt(spark, morRoot, nDirs)) // codegen warm-up
    val (aPlain, tPlainAgg) = time(agg(Versioned.readAt(spark, morRoot, nDirs)))
    agg(Versioned.readAt(spark, morRoot, vMor))
    val (aVec, tVecAgg) = time(agg(Versioned.readAt(spark, morRoot, vMor)))
    Versioned.readAt(spark, morRoot, vMor).queryExecution.executedPlan
      .toString.linesIterator.take(6).foreach(l => println(s"DVPLAN $l"))
    val (_, tCompact) = time(Versioned.compactClustered(spark, morRoot, "id",
      buckets = nDirs).getOrElse(sys.error("compact must publish")))
    val vFold = Versioned.currentVersion(spark, morRoot)
    assert(Versioned.dvOf(spark, morRoot, vFold).isEmpty, "fold retires vectors")
    val (aFold, tFoldAgg) = time(agg(Versioned.readAt(spark, morRoot, vFold)))
    assert(aVec == aFold && aVec < aPlain)
    println(f"DV read (full-scan agg): plain ${tPlainAgg}%.2f s, vectored " +
      f"${tVecAgg}%.2f s (tax ${tVecAgg / tPlainAgg}%.2fx), post-fold " +
      f"${tFoldAgg}%.2f s; count-only: plain(footers) ${tPlainRead}%.2f s, " +
      f"vectored ${tVectoredRead}%.2f s; fold (deferred rewrite, paid once) " +
      f"${tCompact}%.1f s")

    // ---- keyed upsert: MOR merge vs CoW merge on the same scatter ----
    // 1-in-1000 keys updated, present in EVERY dir: the CoW merge
    // rewrites the whole table, the MOR merge writes a sidecar + the
    // update dir
    val ups = spark.range(0, total).filter(col("id") % 1000 === 7)
      .select(col("id"), lit(-1L).as("v"), lit("updated").as("s"))
    val morM = s"/tmp/graft_dv_stress/${java.util.UUID.randomUUID()}"
    (0 until nDirs).foreach(i => Versioned.commitAppend(spark, morM, batch(i)))
    val morMBefore = dataBytes(morM)
    val (_, tMorMerge) = time(Versioned.commitMergeMOR(spark, morM, ups, "id"))
    val morMergeBytes = dataBytes(morM) - morMBefore
    val cowM = s"/tmp/graft_dv_stress/${java.util.UUID.randomUUID()}"
    (0 until nDirs).foreach(i => Versioned.commitAppend(spark, cowM, batch(i)))
    val cowMBefore = dataBytes(cowM)
    val (_, tCowMerge) = time(Versioned.commitMerge(spark, cowM, ups, "id"))
    val cowMergeBytes = dataBytes(cowM) - cowMBefore
    val a1 = Versioned.readAt(spark, morM, Versioned.currentVersion(spark, morM))
    val a2 = Versioned.readAt(spark, cowM, Versioned.currentVersion(spark, cowM))
    assert(a1.count() == total && a2.count() == total)
    assert(a1.filter(col("s") === "updated").count() == expectLive &&
      a2.filter(col("s") === "updated").count() == expectLive)
    println(f"DV upsert 1-in-1000 scatter: MOR merge ${tMorMerge}%.2f s / " +
      f"${morMergeBytes / 1e6}%.1f MB vs CoW merge ${tCowMerge}%.2f s / " +
      f"${cowMergeBytes / 1e6}%.1f MB " +
      f"(write amplification ${cowMergeBytes.toDouble / math.max(1, morMergeBytes)}%.0fx)")

    // ---- fractional tax: a delete confined to ONE dir taxes only that
    // dir's scan (clean dirs bypass the anti join entirely) ----
    val oneRoot = s"/tmp/graft_dv_stress/${java.util.UUID.randomUUID()}"
    (0 until nDirs).foreach(i => Versioned.commitAppend(spark, oneRoot, batch(i)))
    agg(Versioned.readAt(spark, oneRoot, nDirs))
    val (_, tOnePlain) = time(agg(Versioned.readAt(spark, oneRoot, nDirs)))
    val vOne = Versioned.commitDeleteMOR(spark, oneRoot,
      col("id") % 1000 === 7 && col("id") < rows) // dir 0 only
    assert(Versioned.dvOf(spark, oneRoot, vOne).size == 1)
    agg(Versioned.readAt(spark, oneRoot, vOne))
    val (aOne, tOneVec) = time(agg(Versioned.readAt(spark, oneRoot, vOne)))
    assert(aOne < aPlain)
    println(f"DV fractional tax (1 of $nDirs dirs vectored): plain " +
      f"${tOnePlain}%.2f s, vectored ${tOneVec}%.2f s " +
      f"(tax ${tOneVec / tOnePlain}%.2fx - proportional to the vectored " +
      f"fraction, not the table)")

    // ---- REORG law: sidecar GENERATIONS accrete (every sparse delete
    // adds one per touched dir — the folds never fire on this layout-
    // less table), the read tax grows with them, and ONE
    // rewriteVectored retires them all and flattens the read back to
    // baseline — the deferred rewrite, paid once, bounded by threshold ----
    val reorgRoot = s"/tmp/graft_dv_stress/${java.util.UUID.randomUUID()}"
    (0 until nDirs).foreach(i => Versioned.commitAppend(spark, reorgRoot, batch(i)))
    agg(Versioned.readAt(spark, reorgRoot, nDirs))
    val (_, tBase) = time(agg(Versioned.readAt(spark, reorgRoot, nDirs)))
    val gens = (1 to 4).map { g =>
      val v = Versioned.commitDeleteMOR(spark, reorgRoot,
        col("id") % 1000 === (7 + g).toLong)
      agg(Versioned.readAt(spark, reorgRoot, v))
      val (_, t) = time(agg(Versioned.readAt(spark, reorgRoot, v)))
      val sidecars = Versioned.dvOf(spark, reorgRoot, v).values.map(_.size).sum
      (g, sidecars, t)
    }
    val (vReorg, tReorg) = time(Versioned.rewriteVectored(spark, reorgRoot,
      maxDvFraction = 0.001).getOrElse(sys.error("reorg must publish")))
    assert(Versioned.dvOf(spark, reorgRoot, vReorg).isEmpty, "reorg retires all")
    agg(Versioned.readAt(spark, reorgRoot, vReorg))
    val (_, tPost) = time(agg(Versioned.readAt(spark, reorgRoot, vReorg)))
    println(f"DV REORG: baseline ${tBase}%.2f s; " +
      gens.map { case (g, s, t) => f"gen$g ($s sidecars) ${t}%.2f s" }
        .mkString(", ") +
      f"; rewriteVectored ${tReorg}%.1f s once -> post-reorg ${tPost}%.2f s " +
      f"(${tPost / tBase}%.2fx of baseline)")
    spark.stop()
  }
}
