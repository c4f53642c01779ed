package graft

import org.apache.spark.sql.functions._

/** Dev-only scale stress for the graph operators: synthesizes a random
  * regular directed graph with N edges and runs (a) 5 PageRank rounds and
  * (b) oriented-wedge triangle counting THROUGH THE SHARED HYBRID HELPERS
  * (graft.graph.Graphs.pageRankRanks / closeWedges) with the broadcast
  * threshold forced to 0 — i.e. the big-graph co-partitioned/shuffled
  * paths the 100 TB cluster would take.  Asserts no BroadcastExchange (and
  * no nested loop) appears anywhere in either loop's plan, then prints the
  * wall-clock scaling curve.  PageRank must stay linear in |E| per round
  * (one O(|V|) rank shuffle + one partial-agg shuffle); triangles must
  * stay linear in wedges.
  *
  * `sbt "runMain graft.GraphStress <nEdges> [nNodes]"`
  */
object GraphStress {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.nonEmpty) args(0).toLong else 10000000L
    val nNodes = if (args.length > 1) args(1).toLong else nEdges / 20
    val spark = DevSession.local()

    // deterministic ring-lattice edges: each src links to a pseudo-random
    // node within the next 50 — local structure closes wedges into real
    // triangles (a uniform random graph this sparse has essentially none)
    val edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
      pmod(xxhash64(col("id") + 1000000007L), lit(50L)).as("off"))
      .select(col("src"), pmod(col("src") + col("off") + 1, lit(nNodes)).as("dst"))
      .localCheckpoint()

    // --- PageRank: 5 rounds, broadcast disabled -> co-partitioned path ---
    var t0 = System.nanoTime()
    val r = graft.graph.Graphs.pageRankRanks(edges, rounds = 5, maxBroadcastNodes = 0L)
    val prPlan = r.queryExecution.executedPlan.toString
    assert(!prPlan.contains("BroadcastExchange"),
      "big-graph pagerank loop must not broadcast")
    val ranked = r.count()
    val prSec = (System.nanoTime() - t0) / 1e9

    // --- Triangles: orient low->high, wedge join, shuffled closure ---
    val e = edges.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .distinct().localCheckpoint()
    t0 = System.nanoTime()
    val tri = graft.graph.Graphs.closeWedges(e, maxBroadcastEdges = 0L)
    val plan = tri.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "big-graph wedge closure must not broadcast")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "triangle plan degraded to a nested loop")
    val nTri = tri.count()
    val triSec = (System.nanoTime() - t0) / 1e9

    println(f"""{"stress":"graph","edges":$nEdges,"nodes":$nNodes,"rankedNodes":$ranked,"pagerank5Sec":$prSec%.1f,"triangles":$nTri,"triangleSec":$triSec%.1f,"broadcast":false}""")
    spark.stop()
  }
}

/** Dev-only scale stress for the distributed connected-components path
  * (large/small-star, graft.llm.DedupCluster.largeSmallStar) at cluster
  * shape: ~nNodes·degree edges over nNodes nodes in closed-form-known
  * components.
  *
  * Graph: nodes are grouped in fixed blocks of `groupSize`; each group
  * carries a full CHAIN (id -> id+1 — the adversarial O(diameter) case for
  * plain label propagation) plus degree-1 pseudo-random intra-group chords.
  * Every group is therefore connected and never touches another group, so
  * the TRUE label of every node is exactly its group base
  * (id - id % groupSize) — the check is total equality over all nodes, far
  * stronger than a sampled union-find probe, at the cost of one aggregate.
  * Asserts convergence within the Kiveris et al. O(log n) guarantee
  * (<= log2(nodes) + 5 rounds) and exact label/component counts.
  *
  * `sbt "runMain graft.CCStress [nNodes] [degree] [groupSize]"`
  * (100 M edges = nNodes 5000000, degree 20)
  */
object CCStress {
  def main(args: Array[String]): Unit = {
    val nNodes = if (args.nonEmpty) args(0).toLong else 5000000L
    val degree = if (args.length > 1) args(1).toInt else 20
    val groupSize = if (args.length > 2) args(2).toLong else 1000L
    val spark = DevSession.local()

    val ids = spark.range(nNodes)
    val chain = ids
      .filter(pmod(col("id") + 1, lit(groupSize)) =!= 0 && col("id") + 1 < nNodes)
      .select(col("id").as("ia"), (col("id") + 1).as("ib"))
    val chords = ids
      .select(col("id"), explode(sequence(lit(0), lit(degree - 2))).as("j"))
      .select(col("id").as("ia"),
        (col("id") - pmod(col("id"), lit(groupSize)) +
          pmod(xxhash64(col("id"), col("j")), lit(groupSize))).as("ib"))
      .filter(col("ia") =!= col("ib") && col("ib") < nNodes)
    val pairs = chain.unionByName(chords)
    val nEdges = pairs.count()

    val t0 = System.nanoTime()
    val (labels, rounds) = graft.llm.DedupCluster.largeSmallStar(pairs)
    val out = labels.localCheckpoint(eager = true)
    val ccSec = (System.nanoTime() - t0) / 1e9

    val nLabeled = out.count()
    val nWrong = out
      .filter(col("comp") =!= col("id") - pmod(col("id"), lit(groupSize)))
      .limit(1).count()
    val nComp = out.select("comp").distinct().count()
    val expectComp = (nNodes + groupSize - 1) / groupSize
    val bound = (math.log(nNodes.toDouble) / math.log(2.0)).ceil.toLong + 5
    assert(nWrong == 0, "a node's component label diverged from its group base")
    assert(nLabeled == nNodes, s"labeled $nLabeled of $nNodes nodes")
    assert(nComp == expectComp, s"found $nComp components, expected $expectComp")
    assert(rounds <= bound, s"took $rounds rounds, O(log n) bound is $bound")

    println(f"""{"stress":"cc","edges":$nEdges,"nodes":$nNodes,"groupSize":$groupSize,"components":$nComp,"rounds":$rounds,"roundBound":$bound,"ccSec":$ccSec%.1f,"labelErrors":$nWrong}""")
    spark.stop()
  }
}
