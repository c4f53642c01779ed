package graft.llm

import graft.GraftQuery
import graft.llm.TextOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Token-distribution drift monitor — the data-quality gate a training
  * pipeline runs on every incoming batch: compare the batch's unigram
  * distribution against the corpus reference and surface the KL(Q‖P)
  * decomposition per token, so a topic shift, a language flip, or a
  * boilerplate flood shows up as named tokens with signed contributions
  * before the batch is admitted.  Batch = the planted day-2 slice
  * (`doc_id % 10 >= 8`), the same slice every incremental query uses.
  *
  * Smoothing is add-one over the CORPUS vocabulary (the batch is a
  * slice, so its tokens are a subset): q = (b+1)/(B+V),
  * p = (c+1)/(C+V); the judged output is one row per vocab token with
  * the exact integer counts and `lnr_micro` = round(10⁶·ln(q/p)) — the
  * BM25 determinism discipline (quantize the transcendental per term,
  * BEFORE anything sums it; the engines' libm-vs-JVM `ln` differs by 1
  * ulp on ~2×10⁻⁵ of arguments, so floats must never meet the hash
  * compare un-rounded) — plus `contrib` = (b+1)·lnr_micro, the exact
  * integer numerator of the token's KL share: total KL =
  * Σ contrib / ((B+V)·10⁶), recoverable from the output without a
  * single float.
  *
  * 100 TB posture: corpus counts come from the STAGED unigram table
  * ([[TextStats.lmCounts]] c1/nv — built once per corpus fingerprint,
  * shared with the trigram LM family); the per-batch cost is one
  * map-side-combined count over the batch slice plus a hash join
  * against the staged counts — batch-sized, not corpus-sized, work per
  * admitted batch.  Totals are broadcast 1-row frames. */
object Drift {

  private def batchPred = col("doc_id") % 10 >= 8
  private val batchPredSql = "doc_id % 10 >= 8"

  val driftKl: GraftQuery = GraftQuery("q_llm_drift_kl",
    s"""WITH x AS MATERIALIZED (SELECT doc_id, $toksSql AS t FROM documents),
       |tokc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS c
       |        FROM (SELECT unnest(t) AS w FROM x) GROUP BY w),
       |tokb AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS b
       |        FROM (SELECT unnest(t) AS w FROM x WHERE $batchPredSql) GROUP BY w),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS ctot, CAST(count(*) AS BIGINT) AS v
       |        FROM tokc),
       |btot AS (SELECT CAST(coalesce(sum(b), 0) AS BIGINT) AS btot FROM tokb)
       |SELECT tokc.w AS token,
       |  coalesce(tokb.b, 0) AS c_batch,
       |  tokc.c AS c_corpus,
       |  CAST(round(ln((coalesce(tokb.b, 0) + 1.0) * (ctot + v)
       |                / ((tokc.c + 1.0) * (btot + v))) * 1000000, 0) AS BIGINT)
       |    AS lnr_micro,
       |  (coalesce(tokb.b, 0) + 1)
       |    * CAST(round(ln((coalesce(tokb.b, 0) + 1.0) * (ctot + v)
       |                    / ((tokc.c + 1.0) * (btot + v))) * 1000000, 0) AS BIGINT)
       |    AS contrib
       |FROM tokc LEFT JOIN tokb USING (w)
       |CROSS JOIN tot CROSS JOIN btot""".stripMargin) { (spark, sfDir) =>
    val lm = TextStats.lmCounts(spark, sfDir)
    val corpus = lm.c1.select(col("w"), col("c1").cast(LongType).as("c"))
    val batch = graft.io.Tables.documents(spark, sfDir).filter(batchPred)
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("b"))
    val tot = lm.nv.select(col("n").cast(LongType).as("ctot"),
      col("v").cast(LongType).as("v"))
    val btot = batch.agg(coalesce(sum("b"), lit(0L)).cast(LongType).as("btot"))
    val joined = corpus.join(batch, Seq("w"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
    val b0 = coalesce(col("b"), lit(0L))
    val lnr = round(log((b0 + lit(1.0)) * (col("ctot") + col("v"))
      / ((col("c") + lit(1.0)) * (col("btot") + col("v")))) * lit(1000000))
      .cast(LongType)
    joined.select(col("w").as("token"),
      b0.as("c_batch"), col("c").as("c_corpus"),
      lnr.as("lnr_micro"), ((b0 + lit(1L)) * lnr).as("contrib"))
  }

  /** Embedding-space drift monitor — the vector-side companion of
    * [[driftKl]]: per (label, component) the batch slice's centroid is
    * compared against the corpus centroid ENTIRELY in exact integers by
    * cross-multiplying the mean difference —
    * `shift_num = |n_corpus·s_batch − n_batch·s_corpus|` over the
    * 10⁻⁶-quantized components (the engine-wide embedding quantization,
    * [[Similarity.quantized]]), so no float ever meets the hash compare
    * and a per-cluster topic shift shows up as named (label, component)
    * cells.  The true mean shift is shift_num/(n_c·n_b·10⁶), recoverable
    * exactly.
    *
    * Shape: one posexplode (×dim row fan-out) into a map-side-combined
    * (label, pos) aggregate — a single corpus pass, no join, no window;
    * grouping cardinality = labels × dim, corpus-size independent.
    * Long headroom: |s| ≤ n·10⁶ so the cross product needs
    * n_c·n_b·10⁶ < 2⁶³ — fine to ~10⁵ rows per label at judged scale; a
    * deployment lifts the fold to DECIMAL(38,0) exactly as the AUC fold
    * does. */
  val driftEmbed: GraftQuery = GraftQuery("q_llm_drift_embed",
    s"""WITH q AS (SELECT vec_id, label,
       |  list_transform(embedding,
       |                 x -> CAST(round(CAST(x AS DOUBLE)*1000000,0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |e AS (SELECT label, vec_id % 10 >= 8 AS isb,
       |        unnest(list_transform(range(1, len(qv)+1),
       |               i -> struct_pack(pos := i, x := qv[i])), recursive := true)
       |      FROM q),
       |g AS (SELECT label, pos,
       |        CAST(sum(x) AS BIGINT) AS s_corpus,
       |        CAST(count(*) AS BIGINT) AS n_corpus,
       |        CAST(coalesce(sum(x) FILTER (WHERE isb), 0) AS BIGINT) AS s_batch,
       |        CAST(count(*) FILTER (WHERE isb) AS BIGINT) AS n_batch
       |      FROM e GROUP BY label, pos)
       |SELECT label, pos, n_corpus, n_batch, s_corpus, s_batch,
       |  abs(n_corpus * s_batch - n_batch * s_corpus) AS shift_num
       |FROM g""".stripMargin) { (spark, sfDir) =>
    val isb = (col("vec_id") % 10 >= 8).as("isb")
    val g = Similarity.quantized(spark, sfDir)
      .select(col("label"), isb, posexplode(col("qv")).as(Seq("pos0", "x")))
      .groupBy(col("label"), (col("pos0") + 1).cast(LongType).as("pos"))
      .agg(sum("x").as("s_corpus"),
        count(lit(1)).as("n_corpus"),
        coalesce(sum(when(col("isb"), col("x"))), lit(0L)).as("s_batch"),
        count(when(col("isb"), lit(1))).as("n_batch"))
    g.select(col("label"), col("pos"), col("n_corpus"), col("n_batch"),
      col("s_corpus"), col("s_batch"),
      abs(col("n_corpus") * col("s_batch") - col("n_batch") * col("s_corpus"))
        .as("shift_num"))
  }

  val all: Seq[GraftQuery] = Seq(driftKl, driftEmbed)
}
