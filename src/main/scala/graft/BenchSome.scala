package graft

/** Dev tool: per-rep wall times for a subset of SparkEntry.queries.
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchSome /root/testdata/sf0.1 q_join_fuzzy2 ..."` */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = DevSession.local()
    println(f"BENCHSOME calib ${Bench.calibrate()}%.3f s")
    spark.range(0, 1000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"BENCHSOME $name%-28s ${reps.map(_._1).map(t => f"$t%6.2f").mkString(" ")} s  rows=${reps.head._2}")
    }
    spark.stop()
  }
}
