package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.functions._

/** Span-level verbatim dedup: document pairs sharing at least one exact
  * 16-token window — the copied-passage detector (licence boilerplate,
  * mirrored articles, template text) that shingle-Jaccard misses when the
  * surrounding document differs.
  *
  * Shape: every token position opens one window (stride 1, so ANY shared
  * verbatim run of ≥ 16 tokens is caught — a stride would lose unaligned
  * runs), each window is one 60-bit hash, per-doc hashes deduplicated
  * row-locally, and candidate pairs come from the df-capped inverted index
  * self-join — the same linear-cost discipline as the shingle pipelines
  * (TextOps.DF_CAP): a window shared by >1000 docs is boilerplate, carries
  * no pair signal, and would otherwise cost df² join rows.  At 100 TB the
  * postings table is |tokens| rows of (doc_id, hash) — one shuffle keyed
  * by hash; the tokenize->window->hash chain is a single codegen'd kernel
  * (TextKernelCols.windowHashes16, next to TextKernels.shingleHashes).
  */
object SpanDedup {

  private val W = 16

  val spanDedup: GraftQuery = {
    val winSql = (0 until W).map(j => if (j == 0) "t[i]" else s"t[i+$j]")
      .mkString(" || ' ' || ")
    GraftQuery("q_llm_span_dedup",
      s"""WITH x AS (SELECT doc_id, $toksSql AS t FROM documents),
         |u AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - ${W - 2}),
         |        i -> $winSql)) AS win
         |      FROM x WHERE len(t) >= $W),
         |sh0 AS (SELECT DISTINCT doc_id, ${md5LongSql("win")} AS s FROM u),
         |sh AS (${dfCappedSql(DF_CAP)})
         |SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS n_shared
         |FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |GROUP BY 1, 2""".stripMargin) { (spark, sfDir) =>
      // One codegen'd kernel call per doc (tokenize -> window -> md5) —
      // the composable transform/concat_ws/md5 chain is interpreted; docs
      // with < W tokens yield an empty array, which explode drops.
      val postings = documents(spark, sfDir)
        .select(col("doc_id"),
          explode(graft.fns.TextKernelCols.windowHashes16(spark, col("text"))).as("s"))
      val capped = dfCapped(postings, DF_CAP).localCheckpoint()
      capped.select(col("doc_id").as("ia"), col("s"))
        .join(capped.select(col("doc_id").as("ib"), col("s").as("s2")),
          col("s") === col("s2") && col("ia") < col("ib"))
        .groupBy("ia", "ib")
        .agg(count(lit(1)).as("n_shared"))
    }
  }

  val all: Seq[GraftQuery] = Seq(spanDedup)
}
