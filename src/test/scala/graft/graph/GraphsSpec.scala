package graft.graph

import graft.{Queries, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the graph operators: the distributed DataFrame
  * programs must agree exactly with straightforward single-machine
  * reference implementations on the sf0.001 graph (both are deterministic
  * integer algorithms, so equality is exact, not approximate).
  */
class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pagerank matches an in-memory integer reference exactly") {
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select("l_suppkey", "l_partkey").collect()
      .map(r => (r.getLong(0), 1000000000L + r.getLong(1))).distinct
    val edges = li ++ li.map { case (s, p) => (p, s) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size.toLong
    val scale = 1000000000000L
    val tel = (scale * 15L / 100L) / n
    var r: Map[Long, Long] = deg.map { case (k, _) => k -> (scale / n) }.toMap
    for (_ <- 1 to 5) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, v) <- edges) inflow(v) += r(u) / deg(u)
      r = inflow.map { case (v, in) => v -> (tel + 85L * in / 100L) }.toMap
    }
    val expected = r.toSeq.sortBy { case (node, rank) => (-rank, node) }.take(20)
    val got = Queries.queries("q_graph_pagerank")(spark, TestSpark.sf)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
    assert(got == expected)
  }

  test("pagerank conserves rank mass up to floor-division loss") {
    val out = Queries.queries("q_graph_pagerank")(spark, TestSpark.sf).collect()
    assert(out.length == 20)
    assert(out.forall(_.getLong(1) > 0))
    // top-20 of a ~1200-node graph can't hold more than the whole mass
    assert(out.map(_.getLong(1)).sum <= 1000000000000L)
  }

  test("triangle counts match a brute-force reference per nation") {
    val cust = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
      .select("c_custkey", "c_acctbal", "c_nationkey").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100), r.getInt(2)))
    val nations = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val byKey = cust.map(c => c._1 -> c).toMap
    val edges = (for {
      a <- cust; b <- cust
      if a._1 < b._1 && math.abs(a._2 - b._2) <= 2000L
    } yield (a._1, b._1)).toSet
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val triPerNation = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for {
      (a, bs) <- adj; b <- bs
      cs <- adj.get(b); c <- cs
      if edges.contains((a, c))
    } triPerNation(nations(byKey(a)._3)) += 1
    val got = Queries.queries("q_graph_triangles")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == triPerNation.toMap)
  }

  test("triangle edge set comes from the band join, not a cross product") {
    val plan = Queries.queries("q_graph_triangles")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  // --- big-graph hybrid paths: identical results, no broadcast in the loop ---

  private def syntheticEdges() = {
    import org.apache.spark.sql.functions._
    // ring lattice: local structure guarantees wedges that actually close
    spark.range(5000).select(
      pmod(xxhash64(col("id")), lit(400L)).as("src"),
      pmod(xxhash64(col("id") + 7L), lit(20L)).as("off"))
      .select(col("src"), pmod(col("src") + col("off") + 1, lit(400L)).as("dst"))
      .localCheckpoint()
  }

  test("pagerank co-partitioned path == broadcast path, no BroadcastExchange in loop") {
    val edges = syntheticEdges()
    val viaBroadcast = Graphs.pageRankRanks(edges, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaShuffle = Graphs.pageRankRanks(edges, rounds = 5, maxBroadcastNodes = 0L)
    val plan = viaShuffle.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"big-graph pagerank loop must not broadcast:\n$plan")
    assert(viaShuffle.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .sameElements(viaBroadcast))
  }

  test("triangle shuffled wedge closure == broadcast closure, no BroadcastExchange") {
    import org.apache.spark.sql.functions._
    val e = syntheticEdges().filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .distinct().localCheckpoint()
    val viaBroadcast = Graphs.closeWedges(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaBroadcast.nonEmpty, "synthetic lattice must contain triangles")
    val viaShuffle = Graphs.closeWedges(e, maxBroadcastEdges = 0L)
    val plan = viaShuffle.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"big-graph wedge closure must not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert(viaShuffle.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      .sameElements(viaBroadcast))
  }
}
