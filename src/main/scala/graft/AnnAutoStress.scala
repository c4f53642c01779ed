package graft

import graft.llm.{AnnAuto, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only deployment-scale demonstration that the ANN chooser's five
  * non-brute routes are genuinely TAKEN and USEFUL at scale — not just
  * unit-routed on synthetic stats (AnnAutoSpec covers that at spec
  * scale).  Two corpora (the IvfStress clustered shape and the LshStress
  * isotropic shape), each driven through `annTopkAuto` with the stats
  * pushed past each crossover exactly the way a deployment would hit it:
  *
  *   - flopsBar forced to 0      → geometry routes:  ivf (clustered),
  *                                                    lsh (isotropic);
  *   - scanBytesBudget under N·d·8 → memory routes:  ivfpq (clustered),
  *                                                    pq  (isotropic);
  *   - defaults at 1 M           → Q·N·d = 6.4×10⁸ < 7×10⁹ ⇒ brute —
  *     the sub-crossover law holding at a million vectors.
  *
  * Per route: wall time (index+query, steady-state rep) and recall@5 of
  * (qid, nid) pairs against the same corpus's exact brute top-5.
  * Results are recorded as BASELINE.md rows per route.
  *
  * `sbt "runMain graft.AnnAutoStress [nVectors]"`
  */
object AnnAutoStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = DevSession.local()
    val dim = 64

    val cl = StressCorpora.clustered(spark, n, dim).localCheckpoint()
    val iso = StressCorpora.isotropic(spark, n, dim, seed = 13L).localCheckpoint()

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (bruteCl, tBruteCl) = time(pairs(Similarity.bruteTopkOn(spark, cl)))
    val (bruteIso, tBruteIso) = time(pairs(Similarity.bruteTopkOn(spark, iso)))
    println(f"ANNAUTO n=$n brute(clustered) ${tBruteCl}%.1f s; brute(iso) ${tBruteIso}%.1f s")

    // default bars at 1M => sub-crossover => the chooser must stay brute
    val (dflt, tDflt) = time {
      val out = AnnAuto.annTopkAuto(spark, s"aas:dflt:$n", cl)
      (out.select("route").distinct().collect().map(_.getString(0)).toSeq, pairs(out))
    }
    require(dflt._1 == Seq("brute"), s"default route at n=$n was ${dflt._1}")
    println(f"ANNAUTO route=brute   corpus=clustered time ${tDflt}%.1f s recall 1.000 (exact; default bars)")

    def drive(route: String, corpus: String, base: DataFrame,
        brute: Set[(Long, Long)], flopsBar: Double, budget: Double,
        topR: Int = 64, walkBar: Double = 1.1e9, nTag: Long = n): Unit = {
      // rep 1 pays index build; rep 2 is the steady state over staged artifacts
      val (r1, t1) = time {
        val out = AnnAuto.annTopkAuto(spark, s"aas:$route:$topR:$nTag", base,
          flopsBar = flopsBar, scanBytesBudget = budget, pqTopR = topR,
          walkBar = walkBar)
        (out.select("route").distinct().collect().map(_.getString(0)).toSeq, pairs(out))
      }
      require(r1._1 == Seq(route), s"expected $route, got ${r1._1}")
      val (_, t2) = time {
        AnnAuto.annTopkAuto(spark, s"aas:$route:$topR:$nTag", base,
          flopsBar = flopsBar, scanBytesBudget = budget, pqTopR = topR,
          walkBar = walkBar).count()
      }
      val recall = (brute & r1._2).size.toDouble / brute.size
      println(f"ANNAUTO route=$route%-6s corpus=$corpus%-9s topR=$topR%-6d index+query ${t1}%.1f s steady ${t2}%.1f s recall $recall%.3f")
    }
    drive("ivf", "clustered", cl, bruteCl, flopsBar = 0.0, budget = Double.MaxValue)
    drive("lsh", "isotropic", iso, bruteIso, flopsBar = 0.0, budget = Double.MaxValue)
    // PQ-family rows: default topR = the documented noise FLOOR on this
    // worst-case generator (recall ~ topR/occupancy), occupancy-sized
    // topR = the measured ESCAPE (re-rank recovers recall at cost < brute)
    val occ = (n / 32L).toInt
    drive("ivfpq", "clustered", cl, bruteCl, flopsBar = 0.0, budget = 1e6)
    drive("ivfpq", "clustered", cl, bruteCl, flopsBar = 0.0, budget = 1e6, topR = occ)
    drive("pq", "isotropic", iso, bruteIso, flopsBar = 0.0, budget = 1e6)
    drive("pq", "isotropic", iso, bruteIso, flopsBar = 0.0, budget = 1e6, topR = 256)
    // graph route: walkBar forced to 0 pushes the clustered corpus past
    // the beam-walk crossover (organically the bar sits at N ≈ 1.4e7 —
    // GraphAnnStress documents the O(n·m²) NN-descent build is the cost
    // that amortizes there; driven here at 100 k so the stress stays
    // minutes, with the chooser's own rounds=4/beam=16 measured-gate row)
    val nG = math.min(n, 100000L)
    val clG = StressCorpora.clustered(spark, nG, dim).localCheckpoint()
    val (bruteClG, _) = time(pairs(Similarity.bruteTopkOn(spark, clG)))
    drive("graph", "clustered", clG, bruteClG, flopsBar = 0.0,
      budget = Double.MaxValue, walkBar = 0.0, nTag = nG)
    spark.stop()
  }
}
