package graft.llm

import graft.{Queries, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Gates for semantic (cluster-then-prune) dedup (q_llm_dedup_semantic):
  * the leader-by-id prune semantics recomputed independently on the
  * driver, non-trivial output (both kept and dropped rows), cell-leader
  * invariants, partitioning invariance, and consistency of the
  * trained-quantizer variant with the judged rule. */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def judged =
    Queries.queries("q_llm_dedup_semantic")(spark, TestSpark.sf)
      .select("vec_id", "cell", "kept").as[(Long, Long, Boolean)].collect()

  test("decision matches an independent driver-side greedy recomputation") {
    val rows = judged
    assert(rows.length == 500, "one decision per corpus vector")
    val dropped = rows.filterNot(_._3).map(_._1).toSet
    assert(dropped.nonEmpty, "tau=0.7 must drop some within-cell members")
    assert(rows.count(_._3) > dropped.size, "most of the corpus survives")

    // independent recomputation: prefix-16 scaled-int sketch, fixed seeds,
    // leader-by-id rule — plain Scala, no Spark
    val emb = graft.io.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "transform(slice(embedding, 1, 16), x -> cast(round(cast(x as double) * 1000000) as long)) as qv")
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
      .map { case (id, v) => (id, v.toArray) }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val seeds = emb.take(16)
    val cellOf = emb.map { case (id, v) =>
      val best = seeds.zipWithIndex
        .map { case ((_, sv), c) => (cos(v, sv), c) }
        .minBy { case (s, c) => (-s, c) }._2
      id -> best.toLong
    }.toMap
    val byCell = emb.groupBy { case (id, _) => cellOf(id) }
    val expectDropped = byCell.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      sorted.collect { case (idB, vB)
        if sorted.exists { case (idA, vA) => idA < idB && cos(vA, vB) >= 0.7 } => idB }
    }.toSet
    assert(rows.forall { case (id, cell, _) => cellOf(id) == cell },
      "cell assignment disagrees with the driver recomputation")
    assert(dropped == expectDropped,
      s"prune decision disagrees: spark-only=${dropped -- expectDropped} driver-only=${expectDropped -- dropped}")
    // the lowest id of every cell can never be dropped
    val leaders = byCell.values.map(_.map(_._1).min).toSet
    assert(leaders.forall(id => !dropped.contains(id)))
  }

  test("decision is invariant under input partitioning") {
    val a = judged.sortBy(_._1).toSeq
    val base = Similarity.quantized(spark, TestSpark.sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.slice(
          org.apache.spark.sql.functions.col("qv"), 1, 16).as("qv"))
      .withColumn("nrm", graft.fns.VecExpressions.vecDot(spark,
        org.apache.spark.sql.functions.col("qv"),
        org.apache.spark.sql.functions.col("qv"))
        .cast(org.apache.spark.sql.types.DoubleType))
      .repartition(13)
    val b = SemanticDedup.pruneWithinCells(SemanticDedup.seedCells(base))
      .select("vec_id", "cell", "kept").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("two-level assignment: total, unique, and group-consistent") {
    val base = Similarity.quantized(spark, TestSpark.sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.slice(
          org.apache.spark.sql.functions.col("qv"), 1, 16).as("qv"))
      .withColumn("nrm", graft.fns.VecExpressions.vecDot(spark,
        org.apache.spark.sql.functions.col("qv"),
        org.apache.spark.sql.functions.col("qv"))
        .cast(org.apache.spark.sql.types.DoubleType))
    val cells = SemanticDedup.trainedCellsHierK(spark, "semhier:test", base, k = 16)
      .as[(Long, Long)].collect()
    assert(cells.length == 500, "every vector assigned exactly once")
    assert(cells.map(_._1).distinct.length == 500)
    val nCells = cells.map(_._2).distinct.length
    assert(nCells > 1 && nCells <= 16, s"fine cells used: $nCells")
    // the hier prune obeys the same leader-kept invariant as flat
    val out = SemanticDedup.semanticDedupTrained(spark, "semhier:test", base,
      hier = true)
      .select("vec_id", "cell", "kept").as[(Long, Long, Boolean)].collect()
    out.groupBy(_._2).values.foreach { members =>
      val minId = members.map(_._1).min
      assert(members.find(_._1 == minId).get._3, "cell leader must be kept")
    }
  }

  test("trained-quantizer variant obeys the same per-cell semantics") {
    val base = Similarity.quantized(spark, TestSpark.sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.slice(
          org.apache.spark.sql.functions.col("qv"), 1, 16).as("qv"))
      .withColumn("nrm", graft.fns.VecExpressions.vecDot(spark,
        org.apache.spark.sql.functions.col("qv"),
        org.apache.spark.sql.functions.col("qv"))
        .cast(org.apache.spark.sql.types.DoubleType))
    val out = SemanticDedup.semanticDedupTrained(spark, "semdedup:test", base)
      .select("vec_id", "cell", "kept").as[(Long, Long, Boolean)].collect()
    assert(out.length == 500)
    // leaders survive; every dropped row has a kept-or-dropped lower-id
    // member in its cell (the leader-by-id rule's structural signature)
    val byCell = out.groupBy(_._2)
    byCell.values.foreach { members =>
      val minId = members.map(_._1).min
      assert(members.find(_._1 == minId).get._3, "cell leader must be kept")
    }
  }
}
