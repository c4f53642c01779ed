package graft.llm

import graft.fns.Exact
import graft.io.{Staged, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-pipeline operators, each with its
  * DuckDB-SQL twin so every hash/shingle computation is reproducible in the
  * oracle (both engines derive integers from md5 hex — see Exact.md5Long).
  */
object TextOps {

  /** Whitespace tokens, empty strings dropped. */
  def toks(text: Column): Column = filter(split(text, " "), w => w =!= "")
  val toksSql = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** Distinct word 3-gram shingles (requires >= 3 tokens; callers filter). */
  def shingles(t: Column): Column = array_distinct(
    transform(sequence(lit(1), size(t) - 2), i =>
      concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
  /** DuckDB twin over a token-list column named `t` (range is exclusive:
    * range(1, len-1) == Spark sequence(1, len-2)). */
  val shinglesSql =
    "list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"

  /** Seeded 60-bit shingle hash: md5 of "<seed>|<shingle>". */
  def seededHash(seed: Int, s: Column): Column =
    Exact.md5Long(concat(lit(s"$seed|"), s))
  def seededHashSql(seed: Int, expr: String): String =
    Exact.md5LongSql(s"'$seed|' || ($expr)")

  /** The exploded hashed-shingle index — (doc_id, h: md5Long(shingle)) for
    * every doc with >= 3 tokens — materialized once per session and shared
    * by the ngram / MinHash / clustering dedup queries (each would
    * otherwise re-tokenize, re-shingle and re-hash the whole corpus).
    * Only the 60-bit hash is kept: every consumer pipeline is hash-based,
    * and dropping the strings roughly halves the materialized size. */
  def hashedShingles(spark: SparkSession, sfDir: String): DataFrame =
    Staged(spark, s"shingles|$sfDir") {
      // One codegen'd kernel call per doc (graft.fns.TextKernels) instead
      // of five interpreted higher-order expressions; < 3-token docs yield
      // an empty array, which explode drops (== the size filter).
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode(graft.fns.TextKernelCols.shingleHashes(spark, col("text"))).as("h"))
    }

  /** The exploded token table — (doc_id, w) for every whitespace token —
    * materialized once per session and shared by the term-frequency
    * consumers (BM25 relevance, vocabulary heavy hitters), each of which
    * scans it several times (tf, df, doc-length, totals). */
  def tokenTable(spark: SparkSession, sfDir: String): DataFrame =
    Staged(spark, s"tokens|$sfDir") {
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(toks(col("text"))).as("w"))
    }

  /** Document-frequency cap for the exact-Jaccard inverted index.  The
    * pair-generation self-join costs sum(df²) over shingles; on a 100 TB
    * corpus boilerplate shingles ("all rights reserved …") reach df in the
    * millions and a single hot key blows up quadratically — no AQE split
    * saves a key whose *output* is df² pairs.  A shingle shared by more
    * than DF_CAP documents carries no near-dup signal (it is corpus
    * boilerplate by definition), so postings above the cap are dropped
    * before the join, bounding the join cost by DF_CAP · |postings| —
    * linear in the corpus.  At the test scale factors no shingle comes
    * near the cap, so results are unchanged; the oracle applies the
    * identical cap in SQL either way. */
  val DF_CAP = 1000L

  /** Drop postings of shingles with document frequency > cap.  One shuffle
    * by shingle (window count); the output stays hash-partitioned by `s`,
    * which the downstream self-join on `s` reuses — the cap adds no extra
    * shuffle to the pair-generation pipeline. */
  def dfCapped(sh: DataFrame, cap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sh.withColumn("__df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("__df") <= cap)
      .drop("__df")
  }

  /** DuckDB twin of [[dfCapped]] over a CTE named `sh0(doc_id, s)`. */
  def dfCappedSql(cap: Long): String =
    s"""SELECT doc_id, s FROM (
       |  SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh0)
       |WHERE df <= $cap""".stripMargin

  /** The df-capped hashed-shingle index — the candidate-generation input
    * shared by the ngram and clustering dedup queries — materialized once
    * per session like [[hashedShingles]]. */
  def cappedShingles(spark: SparkSession, sfDir: String): DataFrame =
    Staged(spark, s"shinglesCapped|$sfDir") {
      dfCapped(hashedShingles(spark, sfDir).select(col("doc_id"), col("h").as("s")), DF_CAP)
    }
}
