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
