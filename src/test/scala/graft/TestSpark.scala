package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      // keep ANN probe-key IN filters pushdown-eligible (see DevSession)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    DevSession.quietHints()
    s
  }
  val sf = "/root/testdata/sf0.001"
  /** The bench-scale data — for tests whose claim is about error bounds or
    * convergence at realistic cardinalities, not just smoke coverage. */
  val sf01 = "/root/testdata/sf0.1"
}
