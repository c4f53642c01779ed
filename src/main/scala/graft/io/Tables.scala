package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema + LLM tables.
  *
  * Scale posture: `spark.read.parquet` gives the vectorized columnar reader
  * with predicate pushdown and column pruning for free; at 100 TB the same
  * call reads a partitioned directory tree and Catalyst prunes partitions.
  * Loaders never cache or collect — every query composes a lazy plan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp; read it as raw nano-of-epoch longs instead (values are
    * µs-resolution, so `ts div 1000` is exact).  Use [[eventsUs]] for the
    * µs view. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** events with `ts_us` = epoch micros (BIGINT, exact integer division) —
    * mirrors DuckDB `epoch_us(ts)`. */
  def eventsUs(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
