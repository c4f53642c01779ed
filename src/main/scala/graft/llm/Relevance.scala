package graft.llm

import graft.GraftQuery
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Keyword-relevance scoring over the corpus: BM25 (k1 = 1.2, b = 0.75)
  * against a fixed term set, emitted as scaled-integer milli-scores.
  *
  * Cross-engine parity design: `ln` is the one non-algebraic step, and
  * libm implementations disagree with the JVM in ~2·10⁻⁵ of arguments (by
  * 1 ulp) — measured, not assumed.  Summing such doubles across terms
  * would make the judged hash flaky, so each (doc, term) contribution is
  * quantized to an integer BEFORE the cross-term sum: a 1-ulp input drift
  * changes `round(1000·x)` only when the true value lies within ~10⁻¹³ of
  * a rounding boundary (probability ≈ 10⁻⁸ across every fixture SF).  All
  * remaining arithmetic is IEEE basic ops, bit-identical by construction,
  * and the oracle mirrors the formula token for token (explicit DOUBLE
  * casts — DuckDB parses bare decimal literals as DECIMAL).
  *
  * 100 TB posture: term frequencies are one filtered shuffle keyed by
  * doc_id; document lengths one aggregation over the same key (co-
  * partitioned join); document frequencies are per-term scalars
  * (broadcast).  Top-k plans as TakeOrderedAndProject — no global sort.
  */
object Relevance {

  val K1 = 1.2
  val B = 0.75

  /** Milli-scaled BM25 scores for `terms`, one row per matching doc. */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame =
    bm25Tokens(docs.select(col("doc_id"), explode(TextOps.toks(col("text"))).as("w")),
      docs.count().toDouble, terms)

  /** Same, over a pre-exploded (doc_id, w) token table — the judged path
    * reads the session-staged table so the corpus is tokenized once, not
    * once per statistic. */
  def bm25Tokens(toks: DataFrame, nDocs: Double, terms: Seq[String]): DataFrame =
    bm25TokensGlobal(toks, nDocs, toks.count().toDouble, terms)

  /** BM25 with the CORPUS-LEVEL statistics (`nDocs`, `nToks`) supplied by
    * the caller — the pruned-retrieval shape: `toks` need only cover the
    * docs that can match (e.g. a token-index-pruned read; term docs never
    * live outside the pruned dirs, so tf/df/dl are exact there), while
    * the corpus-wide counts come from table metadata at zero data I/O. */
  def bm25TokensGlobal(toks: DataFrame, nDocs: Double, nToks: Double,
      terms: Seq[String]): DataFrame = {
    val avgdl = lit(nToks) / lit(nDocs)

    val dl = toks.groupBy("doc_id").agg(count(lit(1)).cast(DoubleType).as("dl"))
    val tf = toks.filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).cast(DoubleType).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).cast(DoubleType).as("df"))

    // literals spelled out (not derived via Scala arithmetic) so the bits
    // match the oracle's CAST(2.2 AS DOUBLE) / CAST(0.25 AS DOUBLE) exactly
    val idf = log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = (lit(1000.0) * idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl)))
    tf.join(dl, "doc_id")
      .join(broadcast(df), "w")
      .select(col("doc_id"), round(contrib, 0).cast(LongType).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("score_milli"))
  }

  private val terms = Seq("join", "scan", "merge")

  val bm25TopK: GraftQuery = GraftQuery("q_llm_bm25",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($toksSql) AS w FROM documents),
       |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
       |td AS (SELECT CAST(count(*) AS DOUBLE) AS td FROM toks),
       |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM toks
       |       WHERE w IN ('join', 'scan', 'merge') GROUP BY doc_id, w),
       |df AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
       |c AS (
       |  SELECT tf.doc_id,
       |    CAST(round(
       |      CAST(1000 AS DOUBLE)
       |        * ln(CAST(1 AS DOUBLE)
       |             + (nd.nd - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
       |        * (tf.tf * CAST(2.2 AS DOUBLE))
       |        / (tf.tf + CAST(1.2 AS DOUBLE)
       |             * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl.dl / (td.td / nd.nd))),
       |      0) AS BIGINT) AS c
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (w), nd, td)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_milli
       |FROM c GROUP BY doc_id
       |ORDER BY score_milli DESC, doc_id
       |LIMIT 20""".stripMargin) { (spark, sfDir) =>
    bm25Tokens(TextOps.tokenTable(spark, sfDir),
        documents(spark, sfDir).count().toDouble, terms)
      .orderBy(col("score_milli").desc, col("doc_id"))
      .limit(20)
  }

  val all: Seq[GraftQuery] = Seq(bm25TopK)
}
