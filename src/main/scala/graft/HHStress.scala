package graft

import graft.agg.HeavyHittersQuery
import org.apache.spark.sql.functions._

/** Dev stress: sketch-then-verify exact heavy hitters vs the full
  * `GROUP BY key HAVING` aggregation on a zipf-head + unique-tail key
  * stream (80% of rows over 100 hot keys, 20% unique tail — the key
  * cardinality grows with the data, which is exactly when the full
  * group-by's shuffle hurts).  Both paths must return the identical
  * heavy-hitter set.
  *
  * `sbt "runMain graft.HHStress <rows>"`
  */
object HHStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = DevSession.local(defaultCpus = "32")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    val keys = spark.range(rows).select(
      when(pmod(xxhash64($"id"), lit(5L)) < 4L,
        concat(lit("hot"), pmod(xxhash64($"id" * 31L), lit(50L))))
        .otherwise(concat(lit("tail"), $"id"))
        .as("k"))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"HH $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    keys.count() // warm generation

    val exact = time("groupBy") {
      val n = rows
      keys.groupBy("k").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * 100L >= n)
        .as[(String, Long)].collect().toMap
    }
    val sketched = time("sketch") {
      HeavyHittersQuery.exactHeavyHitters(keys, "k", k = 1000, denom = 100L)
        .as[(String, Long)].collect().toMap
    }
    require(exact == sketched,
      s"heavy-hitter sets differ: exact=${exact.size} sketch=${sketched.size}")
    println(s"HH agree: ${exact.size} heavy hitters over $rows rows")
    spark.stop()
  }
}
