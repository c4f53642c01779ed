package graft

import graft.llm.{GraphAnn, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only scale measurement for the graph-ANN path (NN-descent build +
  * beam search): clustered corpus (the IvfStress generator), graph built
  * once as a staged artifact, search measured cold (includes build) and
  * steady (graph reused).  The family's scale claim is the SEARCH side:
  * hops·beam·degree edge lookups per query against a hash-partitioned
  * edge table, independent of n once the graph exists — the build is the
  * (amortized, incremental-append-able) index cost, like IVF's trainer or
  * PQ's encode.
  *
  * `sbt "runMain graft.GraphAnnStress [nVectors] [blockBits] [rounds] [beam] [hops] [corpus]"`
  * (blockBits sizes seed blocks: occupancy ≈ n / 2^bits; default 10;
  * corpus = clustered | isotropic — the isotropic row is what the ANN
  * chooser's isotropic branch decision rests on)
  */
object GraphAnnStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val bits = if (args.length > 1) args(1).toInt else 10
    val rounds = if (args.length > 2) args(2).toInt else 2
    val beam = if (args.length > 3) args(3).toInt else 8
    val hops = if (args.length > 4) args(4).toInt else 5
    val corpus = if (args.length > 5) args(5) else "clustered"
    val spark = DevSession.local()
    val dim = 64

    val base = (corpus match {
      case "isotropic" => StressCorpora.isotropic(spark, n, dim)
      case _ => StressCorpora.clustered(spark, n, dim)
    }).localCheckpoint()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (brute, tBrute) = time(pairs(Similarity.bruteTopkOn(spark, base)))
    val blocked = GraphAnn.blockedOfQv(base, bits, tables = 4).localCheckpoint()
    val (adj, tBuild) = time {
      val a = GraphAnn.knnGraphOn(spark, s"gstress:$corpus:$n:$bits:$rounds", base,
        blocked, rounds = rounds)
      a.count(); a
    }
    val (got, tSearch1) = time(pairs(
      GraphAnn.searchGraphOn(spark, base, adj, beam = beam, hops = hops)))
    val (_, tSearch2) = time(
      GraphAnn.searchGraphOn(spark, base, adj, beam = beam, hops = hops).count())
    val recall = (brute & got).size.toDouble / brute.size
    println(f"GRAPHANN corpus=$corpus n=$n bits=$bits rounds=$rounds beam=$beam hops=$hops " +
      f"build ${tBuild}%.1f s search ${tSearch1}%.1f/${tSearch2}%.1f s " +
      f"recall $recall%.3f brute ${tBrute}%.1f s")
    spark.stop()
  }
}
