package graft.llm

import graft.GraftQuery
import graft.fns.Exact
import graft.io.Tables
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" — public
  * arXiv paper): score every document by how much more likely its hashed
  * unigrams are under a *target* distribution (here: the English slice of
  * the corpus) than under the *raw* distribution, then keep the top-k.
  *
  * Parity design: the per-bucket log-ratio is computed once over the 4096
  * bucket counts and quantized to a scaled integer BEFORE the per-document
  * sum (the BM25 pattern) — cross-row sums stay in exact integer space, so
  * a 1-ulp ln() divergence between the JVM and libm cannot reach the hash.
  * Add-one smoothing keeps every bucket finite; the count products stay
  * below 2^53 at test scale, so the double division is exact.
  *
  * Scale posture: the bucket table is 4096 rows regardless of corpus size —
  * it broadcasts.  The document score is then one map-side hash-join over
  * the (session-staged) token table plus a single groupBy(doc_id), i.e.
  * two narrow passes over the corpus with no candidate blow-up anywhere.
  */
object Importance {

  private val B = 4096L

  val dsir: GraftQuery = GraftQuery("q_llm_dsir",
    s"""WITH tok AS (SELECT doc_id, lang,
       |             unnest(${TextOps.toksSql}) AS w FROM documents),
       |bkt AS (SELECT doc_id, lang, ${Exact.md5LongSql("w")} % $B AS b FROM tok),
       |cnt AS (SELECT b, count(*) AS raw_n,
       |               count(*) FILTER (WHERE lang = 'en') AS tgt_n
       |        FROM bkt GROUP BY b),
       |tot AS (SELECT CAST(sum(raw_n) AS BIGINT) AS raw_tot,
       |               CAST(sum(tgt_n) AS BIGINT) AS tgt_tot FROM cnt),
       |q AS (SELECT b, CAST(round(1000000 * ln(
       |         CAST((tgt_n + 1) * (raw_tot + $B) AS DOUBLE)
       |       / CAST((raw_n + 1) * (tgt_tot + $B) AS DOUBLE)), 0) AS BIGINT) AS qv
       |      FROM cnt, tot),
       |w AS (SELECT doc_id, CAST(sum(qv) AS BIGINT) AS weight
       |      FROM bkt JOIN q USING (b) GROUP BY doc_id)
       |SELECT doc_id, weight FROM w ORDER BY weight DESC, doc_id LIMIT 100""".stripMargin) {
    (spark, sfDir) =>
      val langs = Tables.documents(spark, sfDir).select("doc_id", "lang")
      // (doc_id, lang, bucket) — referenced by both the bucket-count pass
      // and the per-document scoring pass, so materialize it once
      val bkt = TextOps.tokenTable(spark, sfDir)
        .join(langs, "doc_id")
        .select(col("doc_id"), col("lang"),
          (Exact.md5Long(col("w")) % B).as("b"))
        .localCheckpoint()
      val cnt = bkt.groupBy("b").agg(
        count(lit(1)).as("raw_n"),
        count(when(col("lang") === "en", 1)).as("tgt_n"))
      val tot = cnt.agg(sum("raw_n").as("raw_tot"), sum("tgt_n").as("tgt_tot"))
      val q = cnt.crossJoin(broadcast(tot)).select(col("b"),
        round(lit(1e6) * log(
          ((col("tgt_n") + 1) * (col("raw_tot") + B)).cast("double")
            / ((col("raw_n") + 1) * (col("tgt_tot") + B)).cast("double")))
          .cast("long").as("qv"))
      bkt.join(broadcast(q), "b")
        .groupBy("doc_id").agg(sum("qv").as("weight"))
        .orderBy(desc("weight"), asc("doc_id")).limit(100)
  }

  val all: Seq[GraftQuery] = Seq(dsir)
}
