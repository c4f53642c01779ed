package graft.llm

import graft.GraftQuery
import graft.fns.VecExpressions.vecDot
import graft.io.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** End-to-end EMBEDDING curation — the embedding-side analog of
  * `q_llm_curate2`: what a 100 TB embedding refresh actually runs, as ONE
  * composed, hash-checked manifest query:
  *
  *   1. quantize       — scaled-int embeddings (exact integer dots, the
  *                       shared [[Similarity.quantized]] base);
  *   2. semantic dedup — drop rows pruned by the fixed-seed
  *                       cluster-then-prune rule (`q_llm_dedup_semantic`'s
  *                       judged decision, reused verbatim);
  *   3. centroid QA    — drop each label's 2 least-centroid-similar
  *                       survivors (`q_llm_centroid_outliers`' mislabel
  *                       rule, recomputed over the DEDUPED set — QA after
  *                       dedup, so duplicates can't shield an outlier);
  *   4. hard negatives — for every surviving vector, its top cross-label
  *                       neighbor among the survivors (sign-block-bucketed
  *                       like `q_llm_hard_negatives`; mined from the FINAL
  *                       corpus because that is what trains).
  *
  * Output manifest: (vec_id, label, cell, hard_neg, hn_sim) — hard_neg
  * NULL when a vector's sign block holds no cross-label survivor.  Every
  * stage is deterministic and mirrored in the oracle, so the COMPOSED
  * pipeline — not just its operators in isolation — is hash-checked.
  *
  * 100 TB posture: inherits each stage's audited shape — broadcast seed
  * assignment + bounded within-cell prune (dedup), one posexplode
  * aggregate + broadcast centroids + per-label window (QA), and a
  * sign-block equi self-join (negatives) whose blocking keeps candidate
  * generation linear in block occupancy.  No new shuffle shapes.
  */
object EmbedCurate {

  /** Sign-block bits — same definition as q_llm_hard_negatives (signs of
    * the RAW embedding head; the quantized sign can differ at |x| < 5e-7,
    * so both engines block on the float sign). */
  private val BITS = 4

  val embedCurate: GraftQuery = {
    val blkSql = (0 until BITS)
      .map(d => s"(CASE WHEN embedding[${d + 1}] >= 0 THEN ${1 << d} ELSE 0 END)")
      .mkString(" + ")
    GraftQuery("q_llm_embed_curate",
      s"""WITH q0 AS (SELECT vec_id, label, embedding,
         |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
         |  FROM embeddings),
         |q AS (SELECT vec_id, label, embedding, qv, list_dot_product(qv, qv) AS nrm FROM q0),
         |s16 AS (SELECT vec_id, qv[1:16] AS sv FROM q0),
         |n16 AS (SELECT vec_id, sv, list_dot_product(sv, sv) AS snrm FROM s16),
         |seeds AS (SELECT sv AS cv, snrm AS cnrm,
         |                 row_number() OVER (ORDER BY vec_id) - 1 AS cell
         |          FROM (SELECT * FROM n16 ORDER BY vec_id LIMIT 16)),
         |asg AS (SELECT vec_id, cell, sv, snrm FROM (
         |          SELECT n16.vec_id, seeds.cell, n16.sv, n16.snrm,
         |            row_number() OVER (PARTITION BY n16.vec_id
         |              ORDER BY list_dot_product(n16.sv, seeds.cv)
         |                         / (sqrt(n16.snrm) * sqrt(seeds.cnrm)) DESC,
         |                       seeds.cell) AS rn
         |          FROM n16 CROSS JOIN seeds) WHERE rn = 1),
         |dup AS (SELECT DISTINCT y.vec_id AS dup_id
         |        FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |        WHERE list_dot_product(x.sv, y.sv) / (sqrt(x.snrm) * sqrt(y.snrm)) >= 0.7),
         |kq AS (SELECT q.vec_id, q.label, q.embedding, q.qv, q.nrm, asg.cell
         |       FROM q JOIN asg USING (vec_id) LEFT JOIN dup ON q.vec_id = dup.dup_id
         |       WHERE dup.dup_id IS NULL),
         |ex AS (SELECT label, generate_subscripts(qv, 1) AS d, unnest(qv) AS v FROM kq),
         |st AS (SELECT label, d, CAST(sum(v) AS BIGINT) AS sv2,
         |              CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY label, d),
         |c AS (SELECT label, list(CAST(round(CAST(sv2 AS DOUBLE) / n, 0) AS BIGINT)
         |                         ORDER BY d) AS cq FROM st GROUP BY label),
         |cn AS (SELECT label, cq, list_dot_product(cq, cq) AS cqn FROM c),
         |qa AS (SELECT vec_id FROM (
         |        SELECT kq.vec_id, row_number() OVER (PARTITION BY kq.label
         |          ORDER BY list_dot_product(kq.qv, cq) / (sqrt(kq.nrm) * sqrt(cqn)) ASC,
         |                   kq.vec_id) AS rn
         |        FROM kq JOIN cn USING (label)) WHERE rn <= 2),
         |fin AS (SELECT * FROM kq WHERE vec_id NOT IN (SELECT vec_id FROM qa)),
         |fb AS (SELECT vec_id, label, cell, qv, nrm, $blkSql AS blk FROM fin),
         |hn AS (SELECT qid, nid, sim FROM (
         |        SELECT a.vec_id AS qid, b.vec_id AS nid,
         |          list_dot_product(a.qv, b.qv) / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim,
         |          row_number() OVER (PARTITION BY a.vec_id
         |            ORDER BY list_dot_product(a.qv, b.qv) / (sqrt(a.nrm) * sqrt(b.nrm)) DESC,
         |                     b.vec_id) AS rn
         |        FROM fb a JOIN fb b ON a.blk = b.blk AND a.label <> b.label)
         |       WHERE rn = 1)
         |SELECT fin.vec_id, fin.label, fin.cell, hn.nid AS hard_neg, hn.sim AS hn_sim
         |FROM fin LEFT JOIN hn ON fin.vec_id = hn.qid""".stripMargin) { (spark, sfDir) =>
      val base = Similarity.quantized(spark, sfDir) // vec_id, label, qv, nrm
      // 1+2: the judged semantic-dedup decision, kept rows with their cell
      val kept = SemanticDedup.dedupSemantic.fn(spark, sfDir)
        .filter(col("kept")).select("vec_id", "cell")
      val kq = base.join(kept, "vec_id").localCheckpoint()
      // 3: per-label centroid QA over the deduped set (quantized-mean
      // centroid — exact integer dots, see q_llm_centroid_outliers)
      val cent = kq.select(col("label"), posexplode(col("qv")).as(Seq("d", "v")))
        .groupBy("label", "d")
        .agg(sum("v").as("sv2"), count(lit(1)).as("n"))
        .select(col("label"), col("d"),
          round(col("sv2").cast(DoubleType) / col("n"), 0).cast(LongType).as("cq"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("d"), col("cq")))),
          x => x("cq")).as("cq"))
      val cn = cent.withColumn("cqn", vecDot(spark, col("cq"), col("cq")).cast(DoubleType))
      val simQa = vecDot(spark, col("qv"), col("cq")).cast(DoubleType) /
        (sqrt(col("nrm")) * sqrt(col("cqn")))
      val wqa = Window.partitionBy(col("label")).orderBy(col("simqa").asc, col("vec_id"))
      val qa = kq.join(broadcast(cn), "label")
        .withColumn("simqa", simQa)
        .withColumn("rn", row_number().over(wqa))
        .filter(col("rn") <= 2)
        .select("vec_id")
      val fin = kq.join(qa, Seq("vec_id"), "left_anti").localCheckpoint()
      // 4: top-1 cross-label hard negative among survivors (sign blocks)
      val blk = (0 until BITS)
        .map(d => when(element_at(col("embedding"), d + 1) >= 0, lit(1L << d))
          .otherwise(lit(0L)))
        .reduce(_ + _)
      val fb = embeddings(spark, sfDir).select(col("vec_id"), blk.as("blk"))
        .join(fin, "vec_id")
      val a = fb.select(col("vec_id").as("qid"), col("label").as("la"),
        col("blk"), col("qv").as("qa"), col("nrm").as("na"))
      val b = fb.select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("blk").as("blk2"), col("qv").as("qb"), col("nrm").as("nb"))
      val simHn = vecDot(spark, col("qa"), col("qb")).cast(DoubleType) /
        (sqrt(col("na")) * sqrt(col("nb")))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
      val hn = a.join(b, col("blk") === col("blk2") && col("la") =!= col("nlabel"))
        .withColumn("sim", simHn)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("qid"), col("nid").as("hard_neg"), col("sim").as("hn_sim"))
      fin.select(col("vec_id"), col("label"), col("cell"))
        .join(hn, col("vec_id") === col("qid"), "left")
        .select(col("vec_id"), col("label"), col("cell"),
          col("hard_neg"), col("hn_sim"))
    }
  }

  val all: Seq[GraftQuery] = Seq(embedCurate)
}
