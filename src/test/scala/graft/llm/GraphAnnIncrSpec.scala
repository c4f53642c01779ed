package graft.llm

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Day-2 accretion gates for the graph-ANN index: day-1 edges frozen
  * byte-identical, batch nodes both RETRIEVABLE (queries whose true
  * neighbors are batch nodes find them) and bounded in degree, and the
  * full-corpus search stays at judged recall. */
class GraphAnnIncrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append freezes day-1 edges, retrieves batch nodes, keeps recall") {
    val base = Similarity.quantized(spark, TestSpark.sf).localCheckpoint()
    val day1 = base.filter(col("vec_id") < 400).localCheckpoint()
    val batch = base.filter(col("vec_id") >= 400).localCheckpoint()
    assert(batch.count() == 100)
    // day-1 graph over day-1 rows only (its own blocking)
    val blocked1 = GraphAnn.multiBlocked(spark, TestSpark.sf)
      .join(day1.select(col("vec_id")), "vec_id")
    val adj1 = GraphAnn.knnGraphOn(spark, "gincr:d1", day1, blocked1)
      .localCheckpoint()
    val adj2 = GraphAnn.graphAppendOn(spark, "gincr:d2", base, adj1, batch)
      .localCheckpoint()
    // 1. FROZEN: day-1 out-edges byte-identical after the append
    val d1After = adj2.join(day1.select(col("vec_id").as("src")), "src")
    assert(d1After.select("src", "dst").as[(Long, Long)].collect().toSet ==
      adj1.select("src", "dst").as[(Long, Long)].collect().toSet)
    // 2. batch degree bounded by m (+0: batch rows carry no backbone)
    val deg = adj2.join(batch.select(col("vec_id").as("src")), "src")
      .groupBy("src").count()
    assert(deg.agg(max("count")).as[Long].first() <= 8)
    assert(deg.count() == 100, "every batch node owns edges")
    // 3. full-corpus search over the accreted graph: judged recall holds
    // AND batch nodes that brute ranks top-5 are actually retrieved
    val brute = Queries.queries("q_llm_similarity_topk")(spark, TestSpark.sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val got = GraphAnn.searchGraphOn(spark, base, adj2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.7, s"accreted-graph recall@5 $recall")
    val bruteBatch = brute.filter(_._2 >= 400)
    assert(bruteBatch.nonEmpty, "split must leave batch nodes in some true top-5")
    val batchRecall = (bruteBatch & got).size.toDouble / bruteBatch.size
    assert(batchRecall >= 0.5,
      s"batch nodes not retrievable: $batchRecall of ${bruteBatch.size}")
  }
}
