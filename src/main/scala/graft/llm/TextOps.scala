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
}
