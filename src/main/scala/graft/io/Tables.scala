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

  /** Input-table schemas, cached per (path, content fingerprint): a plain
    * `spark.read.parquet` runs a one-task footer-inference JOB on every
    * call, and the bench pays it once per query per table.  The
    * fingerprint (size+mtime+count, the [[Staged]] discipline) keeps the
    * cache honest across testdata refreshes; the data itself is read
    * fresh by every query — only the footer metadata is reused. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = s"$path|${Staged.fingerprint(spark, path)}"
    val s = schemaCache.computeIfAbsent(key, _ => spark.read.parquet(path).schema)
    spark.read.schema(s).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark 4 only reads as raw nano-of-epoch longs — and TIMESTAMP(MICROS),
    * which it reads as TIMESTAMP_NTZ.  Enable the nanos fallback and let
    * [[eventsUs]] normalize whatever arrived. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** events with `ts_us` = epoch micros (BIGINT, exact) — mirrors DuckDB
    * `epoch_us(ts)`, which interprets a naive timestamp as UTC.  Every
    * session here pins `spark.sql.session.timeZone=UTC` (Verify, Bench,
    * DevSession, ProfileMain all set it), so the NTZ→LTZ cast below is a
    * bit-identity on the underlying micros. */
  def eventsUs(s: SparkSession, d: String): DataFrame = {
    val df = events(s, d)
    df.withColumn("ts_us", tsUsColFor(df))
  }

  /** The `ts` → epoch-micros normalization of [[eventsUs]] as a column
    * expression over ANY frame carrying an events-shaped `ts` — shared by
    * the batch loaders and the Structured Streaming file source (whose
    * frame comes from `readStream`, not [[events]], but must agree
    * bit-for-bit with the batch twin). */
  def tsUsColFor(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      // A raw INT64 ts has shipped only as TIMESTAMP(NANOS) read back as
      // nano-of-epoch longs.  Guard by magnitude rather than assuming: for
      // any instant between 1974 and 5100 AD, nanos ≥ 1.3e17 while micros
      // < 1e17, so the two scales cannot overlap on plausible data.  A
      // future testdata refresh shipping unannotated epoch-MICROS longs
      // then flows through unscaled instead of being silently ÷1000.
      case LongType =>
        when(abs(col("ts")) >= 130000000000000000L, expr("ts div 1000"))
          .otherwise(col("ts"))
      case TimestampNTZType => unix_micros(col("ts").cast("timestamp_ltz"))
      case _                => unix_micros(col("ts"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
