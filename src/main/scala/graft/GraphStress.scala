package graft

import org.apache.spark.sql.functions._

/** Dev-only scale stress for the graph operators: synthesizes a random
  * regular directed graph with N edges and runs (a) 5 broadcast-rank
  * PageRank rounds and (b) oriented-wedge triangle counting, printing the
  * wall-clock scaling curve.  PageRank must stay linear in |E| per round
  * (one broadcast map-join + one |V|-sized shuffle); triangles must stay
  * linear in wedges (bounded out-degree — no nested loop anywhere).
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

    // --- PageRank: 5 broadcast rounds ---
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint()
    val n = deg.count()
    val scale = 1000000000000L
    val tel = (scale * 15L / 100L) / n
    val ed = edges.join(broadcast(deg), "src")
    var t0 = System.nanoTime()
    var r = deg.select(col("src").as("node"), lit(scale / n).as("r"))
    for (_ <- 1 to 5)
      r = ed.join(broadcast(r), col("src") === col("node"))
        .groupBy("dst").agg(sum(expr("r div d")).as("inflow"))
        .select(col("dst").as("node"),
          (lit(tel) + expr("(85 * inflow) div 100")).as("r"))
    val ranked = r.count()
    val prSec = (System.nanoTime() - t0) / 1e9

    // --- Triangles: orient low->high, wedge join, close against edges ---
    val e = edges.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .distinct().localCheckpoint()
    t0 = System.nanoTime()
    val wedges = e.select(col("u").as("a"), col("v").as("b"))
      .join(e.select(col("u").as("b"), col("v").as("c")), "b")
    val tri = wedges.join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
    val plan = tri.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "triangle plan degraded to a nested loop")
    val nTri = tri.count()
    val triSec = (System.nanoTime() - t0) / 1e9

    println(f"""{"stress":"graph","edges":$nEdges,"nodes":$n,"rankedNodes":$ranked,"pagerank5Sec":$prSec%.1f,"triangles":$nTri,"triangleSec":$triSec%.1f}""")
    spark.stop()
  }
}
