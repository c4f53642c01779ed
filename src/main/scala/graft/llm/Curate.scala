package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** End-to-end corpus curation — the whole training-data preparation
  * pipeline as ONE composed query, the way a user of this library would
  * actually run it:
  *
  *   1. exact dedup        — keep the lowest doc_id of each byte-identical
  *                           text group;
  *   2. near-dup pruning   — drop any doc that has a 3-gram-Jaccard ≥ 0.3
  *                           near-duplicate with a smaller doc_id (the
  *                           df-capped inverted-index pairs — same
  *                           candidate discipline as q_llm_dedup_ngram);
  *   3. quality filter     — keep 20 ≤ tokens and repetition ratio ≤ 0.3
  *                           (milli-scaled integer arithmetic);
  *   4. split assignment   — reproducible md5-hash train/val/test.
  *
  * Output: the surviving manifest (doc_id, split, n_tok, rep_milli).
  * Every stage is deterministic and mirrored in the oracle, so the entire
  * pipeline — not just its operators in isolation — is hash-checked.
  * 100 TB posture: stages 1/3/4 are map-side or one hash shuffle; stage 2
  * reuses the session-staged capped shingle index.
  */
object Curate {

  private val TAU = 0.3

  val curate: GraftQuery = GraftQuery("q_llm_curate",
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |${Dedup.pairCtesSql},
       |drop_near AS (
       |  SELECT DISTINCT ib AS doc_id
       |  FROM p JOIN sz x ON ia = x.doc_id JOIN sz y ON ib = y.doc_id
       |  WHERE common / (x.n + y.n - common) >= $TAU),
       |exact_keep AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
       |    FROM documents) WHERE doc_id = keep_id),
       |q AS (
       |  SELECT doc_id,
       |         CAST(len(t) AS BIGINT) AS n_tok,
       |         CAST(round(CAST(1000 AS DOUBLE)
       |                    - CAST(1000 * len($shinglesSql) AS BIGINT)
       |                      / CAST(len(t) - 2 AS DOUBLE), 0) AS BIGINT) AS rep_milli
       |  FROM toks WHERE len(t) >= 3)
       |SELECT q.doc_id,
       |  CASE WHEN ${md5LongSql("q.doc_id")} % 100 < 80 THEN 'train'
       |       WHEN ${md5LongSql("q.doc_id")} % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split,
       |  q.n_tok, q.rep_milli
       |FROM q
       |JOIN exact_keep k ON q.doc_id = k.doc_id
       |WHERE q.doc_id NOT IN (SELECT doc_id FROM drop_near)
       |  AND q.n_tok >= 20 AND q.rep_milli <= 300""".stripMargin) { (spark, sfDir) =>
    val docs = documents(spark, sfDir)
    // stage 2: near-dup victims (larger id of each qualifying pair)
    val dropNear = Dedup.jaccardPairs(cappedShingles(spark, sfDir))
      .filter(col("jacc") >= TAU)
      .select(col("ib").as("doc_id"))
      .distinct()
    // stage 1: exact-dup keepers — groupBy on the hash, so the shuffle
    // carries (hash, id) pairs, never the document text
    val exactKeep = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // stage 3: quality stats — distinct-shingle counts via the codegen'd
    // kernel (the interpreted shingle lambda is ~5x slower per doc)
    val t = toks(col("text"))
    val nDistinct = size(graft.fns.TextKernelCols.shingleHashes(spark, col("text")))
    val q = docs.filter(size(t) >= 3)
      .select(col("doc_id"),
        size(t).cast(LongType).as("n_tok"),
        round(lit(1000.0) -
          (lit(1000L) * nDistinct.cast(LongType)).cast(DoubleType) /
            (size(t) - 2).cast(DoubleType), 0).cast(LongType).as("rep_milli"))
    // stage 4: split + final manifest
    val h = pmod(md5Long(col("doc_id")), lit(100L))
    q.join(exactKeep, "doc_id")
      .join(dropNear, Seq("doc_id"), "left_anti")
      .filter(col("n_tok") >= 20L && col("rep_milli") <= 300L)
      .select(col("doc_id"),
        when(h < 80, "train").when(h < 90, "val").otherwise("test").as("split"),
        col("n_tok"), col("rep_milli"))
  }

  val all: Seq[GraftQuery] = Seq(curate)
}
