package graft.llm

import graft.GraftQuery
import graft.fns.VecExpressions.vecDot
import graft.io.Tables.embeddings
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** kNN self-join (B10): every vector's top-k nearest neighbors in ONE pass —
  * the primitive behind semantic dedup, diversity sampling and
  * cluster-based curriculum construction (where `q_llm_similarity_topk`
  * answers a small query set, this joins the corpus against itself).
  *
  * Blocking: a 4-bit axis-hyperplane signature (sign of the first four
  * embedding dimensions) partitions the corpus into 16 cells; candidates
  * are generated only within a cell, so the join cost is sum(|cell|²)
  * ~ n²/16 instead of n² — and the cell count is a knob: at 100 TB the
  * same plan runs with 16-24 sign bits (65k-16M cells), keeping each
  * cell's self-join executor-sized while the shuffle stays a plain
  * hash-partition on the cell id.  Neighbors in other cells are missed by
  * design (that is the ANN trade-off; recall for the LSH family is
  * property-tested in AnnRecallSpec-style suites).
  *
  * Numerics: quantized integer dot products (round(x*1e6), exact < 2^53),
  * so similarity doubles — and the top-k ranking — are bit-identical with
  * the DuckDB oracle.  Ties broken by neighbor id; rank via row_number in
  * both engines.
  */
object KnnJoin {

  private val BITS = 4
  private val K = 3

  val knnJoin: GraftQuery = {
    val blkSql = (0 until BITS)
      .map(d => s"(CASE WHEN embedding[${d + 1}] >= 0 THEN ${1 << d} ELSE 0 END)")
      .mkString(" + ")
    GraftQuery("q_llm_knn_join",
      s"""WITH q AS (SELECT vec_id, embedding,
         |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
         |  FROM embeddings),
         |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nrm,
         |             $blkSql AS blk FROM q)
         |SELECT qid, nid, rn, sim FROM (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    list_dot_product(a.qv, b.qv) / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY list_dot_product(a.qv, b.qv) / (sqrt(a.nrm) * sqrt(b.nrm)) DESC,
         |               b.vec_id) AS rn
         |  FROM n a JOIN n b ON a.blk = b.blk AND a.vec_id <> b.vec_id)
         |WHERE rn <= $K""".stripMargin) { (spark, sfDir) =>
      val blk = (0 until BITS)
        .map(d => when(element_at(col("embedding"), d + 1) >= 0, lit(1L << d)).otherwise(lit(0L)))
        .reduce(_ + _)
      // sign bits come off the raw float column; qv/nrm reuse the
      // session-staged quantized base (one materialization per session)
      val base = embeddings(spark, sfDir).select(col("vec_id"), blk.as("blk"))
        .join(Similarity.quantized(spark, sfDir), "vec_id")
        .select(col("vec_id"), col("blk"), col("qv"), col("nrm"))
      val a = base.select(col("vec_id").as("qid"), col("blk"),
        col("qv").as("qa"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("nid"), col("blk").as("blk2"),
        col("qv").as("qb"), col("nrm").as("nb"))
      val sim = vecDot(spark, col("qa"), col("qb")).cast(DoubleType) /
        (sqrt(col("na")) * sqrt(col("nb")))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
      a.join(b, col("blk") === col("blk2") && col("qid") =!= col("nid"))
        .withColumn("sim", sim)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= K)
        .select("qid", "nid", "rn", "sim")
    }
  }

  /** Hard-negative mining (contrastive-training pair construction): for
    * each vector, the top-2 most-similar vectors with a DIFFERENT label —
    * "close in embedding space, different class" is exactly what a
    * contrastive or reranker objective wants as negatives.  Same
    * cell-blocked join as [[knnJoin]] (the label predicate rides the
    * equi join as a residual filter), same scale knob. */
  val hardNegatives: GraftQuery = {
    val blkSql = (0 until BITS)
      .map(d => s"(CASE WHEN embedding[${d + 1}] >= 0 THEN ${1 << d} ELSE 0 END)")
      .mkString(" + ")
    GraftQuery("q_llm_hard_negatives",
      s"""WITH q AS (SELECT vec_id, label, embedding,
         |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
         |  FROM embeddings),
         |n AS (SELECT vec_id, label, qv, list_dot_product(qv, qv) AS nrm,
         |             $blkSql AS blk FROM q)
         |SELECT qid, nid, nlabel, rn, sim FROM (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid, b.label AS nlabel,
         |    list_dot_product(a.qv, b.qv) / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY list_dot_product(a.qv, b.qv) / (sqrt(a.nrm) * sqrt(b.nrm)) DESC,
         |               b.vec_id) AS rn
         |  FROM n a JOIN n b ON a.blk = b.blk AND a.label <> b.label)
         |WHERE rn <= 2""".stripMargin) { (spark, sfDir) =>
      val blk = (0 until BITS)
        .map(d => when(element_at(col("embedding"), d + 1) >= 0, lit(1L << d)).otherwise(lit(0L)))
        .reduce(_ + _)
      val base = embeddings(spark, sfDir).select(col("vec_id"), blk.as("blk"))
        .join(Similarity.quantized(spark, sfDir), "vec_id")
        .select(col("vec_id"), col("label"), col("blk"), col("qv"), col("nrm"))
      val a = base.select(col("vec_id").as("qid"), col("label").as("la"),
        col("blk"), col("qv").as("qa"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("blk").as("blk2"), col("qv").as("qb"), col("nrm").as("nb"))
      val sim = vecDot(spark, col("qa"), col("qb")).cast(DoubleType) /
        (sqrt(col("na")) * sqrt(col("nb")))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
      a.join(b, col("blk") === col("blk2") && col("la") =!= col("nlabel"))
        .withColumn("sim", sim)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .select("qid", "nid", "nlabel", "rn", "sim")
    }
  }

  /** Embedding QA — per-label centroid outliers: the 2 vectors least
    * similar to their own label's centroid (mislabel / contamination
    * candidates).  Cosine is scale-invariant, so the centroid is the
    * per-dimension mean QUANTIZED back to longs: every dot product stays
    * an exact integer < 2^53 and both engines compute bit-identical
    * similarities (a raw sum-vector centroid would push double
    * accumulation past 2^53 where DuckDB's float fold and the exact long
    * fold can round differently).  Plan: one posexplode aggregate for the
    * centroids (64·|labels| rows), broadcast back, one window. */
  val centroidOutliers: GraftQuery = GraftQuery("q_llm_centroid_outliers",
    """WITH q0 AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |q AS (SELECT vec_id, label, qv, list_dot_product(qv, qv) AS nrm FROM q0),
      |ex AS (SELECT label, generate_subscripts(qv, 1) AS d, unnest(qv) AS v FROM q),
      |s AS (SELECT label, d, CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS n
      |      FROM ex GROUP BY label, d),
      |c AS (SELECT label, list(CAST(round(CAST(sv AS DOUBLE) / n, 0) AS BIGINT) ORDER BY d) AS cq
      |      FROM s GROUP BY label),
      |cn AS (SELECT label, cq, list_dot_product(cq, cq) AS cqn FROM c),
      |j AS (SELECT q.vec_id, q.label,
      |        list_dot_product(q.qv, cq) / (sqrt(q.nrm) * sqrt(cqn)) AS sim
      |      FROM q JOIN cn ON q.label = cn.label)
      |SELECT vec_id, label, sim, rn FROM (
      |  SELECT vec_id, label, sim,
      |    row_number() OVER (PARTITION BY label ORDER BY sim ASC, vec_id) AS rn FROM j)
      |WHERE rn <= 2""".stripMargin) { (spark, sfDir) =>
    val base = Similarity.quantized(spark, sfDir)
    val cent = base.select(col("label"), posexplode(col("qv")).as(Seq("d", "v")))
      .groupBy("label", "d")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .select(col("label"), col("d"),
        round(col("sv").cast(DoubleType) / col("n"), 0).cast("long").as("cq"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("cq")))),
        x => x("cq")).as("cq"))
    val cn = cent.withColumn("cqn", vecDot(spark, col("cq"), col("cq")).cast(DoubleType))
    val sim = vecDot(spark, col("qv"), col("cq")).cast(DoubleType) /
      (sqrt(col("nrm")) * sqrt(col("cqn")))
    val w = Window.partitionBy(col("label")).orderBy(col("sim").asc, col("vec_id"))
    base.join(broadcast(cn), "label")
      .withColumn("sim", sim)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select("vec_id", "label", "sim", "rn")
  }

  val all: Seq[GraftQuery] = Seq(knnJoin, hardNegatives, centroidOutliers)
}
