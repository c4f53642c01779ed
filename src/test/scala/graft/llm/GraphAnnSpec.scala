package graft.llm

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the graph-ANN path (q_llm_ann_graph): beam-search recall
  * against the exact brute top-5, the index's degree bound, determinism
  * of the whole build+search, and that NN-descent refinement does not
  * degrade the graph's neighbor quality. */
class GraphAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("qid").cast("long"), col("nid").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("beam search recall@5 >= 0.8 vs brute force; deterministic") {
    val g1 = Queries.queries("q_llm_ann_graph")(spark, TestSpark.sf)
    val got = pairs(g1)
    val brute = pairs(Queries.queries("q_llm_similarity_topk")(spark, TestSpark.sf))
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.8, s"graph-ANN recall@5 $recall")
    val again = pairs(Queries.queries("q_llm_ann_graph")(spark, TestSpark.sf))
    assert(got == again, "build+search must be deterministic")
  }

  test("graph degree bounded by m; NN-descent keeps or improves quality") {
    val base = Similarity.quantized(spark, TestSpark.sf)
    val blocked = GraphAnn.multiBlocked(spark, TestSpark.sf)
    val adj0 = GraphAnn.knnGraphOn(spark, "gspec:r0", base, blocked, m = 8, rounds = 0)
    val adj2 = GraphAnn.knnGraphOn(spark, "gspec:r2", base, blocked, m = 8, rounds = 2)
    // m similarity links + 2 structural small-world links per node
    val maxDeg = adj2.groupBy("src").count().agg(max("count")).as[Long].first()
    assert(maxDeg <= 10, s"degree bound violated: $maxDeg")
    // The refined graph covers MORE of the true top-5 as out-edges:
    // current edges stay candidates every round, so a node's top-m can
    // only improve by similarity — true-neighbor out-edge coverage is the
    // genuinely monotone property.  (A mean-over-all-edges similarity is
    // NOT: a node seeded with fewer than m edges legitimately GAINS
    // lower-sim edges during refinement, lowering the global mean — a
    // previous assertion here held only empirically on the pinned corpus.)
    val brute = Queries.queries("q_llm_similarity_topk")(spark, TestSpark.sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def coverage(adj: org.apache.spark.sql.DataFrame): Int =
      (adj.select(col("src"), col("dst")).as[(Long, Long)].collect().toSet & brute).size
    val (c0, c2) = (coverage(adj0), coverage(adj2))
    assert(c2 >= c0, s"NN-descent lost true-neighbor edges: $c0 -> $c2")
  }

  test("graph build rank and judged search plan no single-partition exchange") {
    // the backbone's hash-order rank is the one total-order computation in
    // the build — it must ride TotalOrder's range-partitioned shape, never
    // a partitionless window (Exchange SinglePartition = a one-task sort
    // of every id at 10^9-vector scale)
    val base = Similarity.quantized(spark, TestSpark.sf)
    val rankPlan = GraphAnn.hashOrderRank(spark, base.select(col("vec_id")))
      .queryExecution.executedPlan.toString
    assert(!rankPlan.contains("SinglePartition"),
      s"hashOrderRank plans an Exchange SinglePartition:\n$rankPlan")
    // COVERAGE LIMIT: searchOn localCheckpoints every hop eagerly at
    // construction, so this executedPlan covers only the FINAL fragment
    // (top-k over the visited set); the per-hop join plans are already
    // executed by the time we inspect.  Those intermediates are all
    // equi joins / windows partitioned by qid or node — shapes that only
    // plan SinglePartition through a partitionless total order, and the
    // one total order in the family (hashOrderRank) is pinned above on
    // its own plan.  Full-pipeline pinning would need searchOn to expose
    // each hop's frame pre-checkpoint; not worth the API surface.
    val searchPlan = Queries.queries("q_llm_ann_graph")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!searchPlan.contains("SinglePartition"),
      s"graph-ANN search plans an Exchange SinglePartition:\n$searchPlan")
  }
}
