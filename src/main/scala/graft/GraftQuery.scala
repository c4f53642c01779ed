package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judged query: a DataFrame program plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  * `oracle = None` => the driver records a weaker rows-only check
  * (reserved for approximate / non-SQL-expressible operators).
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, None)
}
