package graft

import org.apache.spark.sql.SparkSession

/** One local-session builder for the dev drivers (stress runs, sweeps,
  * profilers) so their config can't drift apart.  `Bench` and `Verify`
  * keep their own builders — they are the judged driver contract.
  */
object DevSession {

  /** Silence HintErrorLogger for this JVM's sessions: Versioned.readAt
    * attaches a manifest-sized broadcast hint (see its scaladoc), and
    * the analyzer logs a benign "hint not part of a join relation" WARN
    * whenever such a read is used outside a join.  The hint is
    * load-bearing in joins and inert elsewhere; the per-read warning is
    * noise in a harness log.  Library embedders who want the warning
    * back control their own log4j config. */
  def quietHints(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.HintErrorLogger",
      org.apache.logging.log4j.Level.ERROR)

  def local(defaultCpus: String = "4", logLevel: String = "WARN"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // io.Tables.eventsUs's NTZ→LTZ cast assumes a UTC session zone; pin
      // it here so stress/profiling drivers measure the judged semantics.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      // ANN probe pruning pushes up to Similarity.ProbePruneCap (4096)
      // bucket keys as a parquet IN filter; past this threshold Spark
      // degrades IN pushdown to a min/max range, which prunes nothing on
      // a probe set spread across hash tables.
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    quietHints()
    spark
  }
}
