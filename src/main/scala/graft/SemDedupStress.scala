package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only scale stress for semantic (cluster-then-prune) dedup
  * (`SemanticDedup.semanticDedupTrained`) — measures the claim the 100 TB
  * posture rests on: with K cells grown proportionally to N, occupancy
  * N/K stays bounded, the within-cell O(occupancy²) prune stays flat per
  * cell, and total wall scales ~linearly in N while the trainer stays
  * under its sample cap.
  *
  * Corpus with PLANTED ground truth: even ids are independent isotropic
  * vectors (xxhash components in ±1e6, d=64); odd id 2k+1 is a near-copy
  * of 2k (per-component noise ±5e4, cosine ≈ 0.996 ≫ τ = 0.7), while
  * isotropic non-dup cosines concentrate at |cos| ~ 1/√64 with
  * P(cos ≥ 0.7) ≈ 1e-8 — so the expected decision is: every odd id
  * dropped (recall, capped by cell splits — the measured SemDeDup
  * recall limitation: a near-pair straddling a k-means boundary is
  * invisible to within-cell pruning), no even id dropped (precision).
  *
  * `sbt "runMain graft.SemDedupStress [nVectors] [nCells] [hier]"` —
  * `hier` switches the corpus assignment to the two-level
  * `trainedCellsHierK` path (n·(c + K/c)·d instead of n·K·d).
  */
object SemDedupStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val k = if (args.length > 1) args(1).toInt else (n / 1000L).toInt.max(16)
    val hier = args.length > 2 && args(2) == "hier"
    val spark = DevSession.local()
    val dim = 64

    // even id: isotropic; odd id: even partner + small noise
    val anchor = col("vec_id").bitwiseAND(lit(-2L)) // clear bit 0: 2k and 2k+1 share 2k
    val comp = transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(anchor * dim + i, lit(13L)), lit(2000001L)) - 1000000L) +
        when(col("vec_id") % 2L === 1L,
          pmod(xxhash64(col("vec_id") * dim + i, lit(29L)), lit(100001L)) - 50000L)
          .otherwise(lit(0L)))
    val base = spark.range(n).select(col("id").as("vec_id"), comp.as("qv"))
      .withColumn("nrm",
        graft.fns.VecExpressions.vecDot(spark, col("qv"), col("qv")).cast(DoubleType))
      .localCheckpoint()

    val t0 = System.nanoTime()
    val out = graft.llm.SemanticDedup
      .semanticDedupTrained(spark, s"semstress:$n:$k", base, tau = 0.7, k = k,
        hier = hier)
      .localCheckpoint()
    val decided = out.count()
    val wall = (System.nanoTime() - t0) / 1e9

    val dropped = out.filter(!col("kept")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val oddDropped = dropped.count(_ % 2 == 1)
    val evenDropped = dropped.size - oddDropped
    val nOdd = n / 2
    val occ = out.groupBy("cell").agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"), avg(col("c")).as("av")).collect()(0)

    println(f"n=$n k=$k hier=$hier decided=$decided wall=$wall%.1fs " +
      f"recall=${oddDropped.toDouble / nOdd}%.4f falseDrops=$evenDropped " +
      f"occMax=${occ.getLong(0)} occAvg=${occ.getDouble(1)}%.1f")
    spark.stop()
  }
}
