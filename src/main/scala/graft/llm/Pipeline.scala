package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data pipeline utilities (B10 extensions): deterministic dataset
  * split, context-window packing, and text scrubbing.
  */
object Pipeline {

  /** Hash-based train/val/test split (80/10/10).  Hash-of-key splitting is
    * THE reproducible way to split a 100 TB corpus: independent of
    * partitioning, stable under re-runs and appends, and trivially
    * mirrored by the oracle. */
  val split: GraftQuery = GraftQuery("q_llm_split",
    s"""SELECT doc_id, lang,
       |  CASE WHEN ${md5LongSql("doc_id")} % 100 < 80 THEN 'train'
       |       WHEN ${md5LongSql("doc_id")} % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin) { (spark, sfDir) =>
    val h = pmod(md5Long(col("doc_id")), lit(100L))
    documents(spark, sfDir).select(col("doc_id"), col("lang"),
      when(h < 80, "train").when(h < 90, "val").otherwise("test").as("split"))
  }

  /** Context-window packing: assign docs (in deterministic doc_id order) to
    * consecutive bins of <= 4096 tokens by cumulative token count — the
    * chunking step that batches documents into training sequences.  A
    * running integer sum over a total order, so both engines agree
    * exactly.  At scale the ORDER BY becomes a range partition; the window
    * itself is one pass. */
  val pack: GraftQuery = GraftQuery("q_llm_pack",
    s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok
       |           FROM documents),
       |c AS (SELECT doc_id, n_tok,
       |        CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |             - n_tok AS BIGINT) AS before
       |      FROM t)
       |SELECT doc_id, n_tok, before // 4096 AS bin, before % 4096 AS bin_offset
       |FROM c""".stripMargin) { (spark, sfDir) =>
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, sfDir)
      .select(col("doc_id"), size(toks(col("text"))).cast(LongType).as("n_tok"))
      .withColumn("before", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        floor(col("before").cast(DoubleType) / 4096).cast(LongType).as("bin"),
        pmod(col("before"), lit(4096L)).as("bin_offset"))
  }

  /** Scrubbing: mask digit runs and long tokens (the PII/noise-redaction
    * shape — same regex class works in Java and RE2). */
  val scrub: GraftQuery = GraftQuery("q_llm_scrub",
    """SELECT doc_id,
      |  regexp_replace(text, '[0-9]+', '<NUM>') AS scrubbed,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_masked
      |FROM documents""".stripMargin) { (spark, sfDir) =>
    documents(spark, sfDir).select(col("doc_id"),
      regexp_replace(col("text"), "[0-9]+", "<NUM>").as("scrubbed"),
      regexp_count(col("text"), lit("[0-9]+")).cast(LongType).as("n_masked"))
  }

  val all: Seq[GraftQuery] = Seq(split, pack, scrub)
}
