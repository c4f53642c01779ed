package graft

import graft.joins.BloomPrune
import org.apache.spark.sql.functions._

/** Dev stress: bloom-prune semi join vs plain shuffle semi join with
  * broadcasting DISABLED — the 100 TB scenario where the build side is
  * selective but too large for a hash relation.  Both paths must produce
  * identical counts; the interesting number is wall-clock, because the
  * plain join shuffles EVERY probe row while the pruned one shuffles only
  * matches + fpp·misses.
  *
  * `sbt "runMain graft.PruneStress <probeRows> [buildRows]"`
  */
object PruneStress {
  def main(args: Array[String]): Unit = {
    val probeRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val buildRows = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = DevSession.local(defaultCpus = "32")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    val domain = 10000000L
    val large = spark.range(probeRows)
      .select($"id".as("row_id"), pmod(xxhash64($"id"), lit(domain)).as("k"))
    val small = spark.range(buildRows)
      .select(pmod(xxhash64($"id" + 777L), lit(domain)).as("sk"))

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PRUNE $label%-10s rows=$n%12d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      n
    }
    // warm both inputs (they re-generate per action; generation cost is
    // identical on both sides so the comparison stays fair)
    large.count(); small.count()

    val plain = time("plain") {
      large.join(small, $"k" === $"sk", "left_semi").count()
    }
    val pruned = time("bloom") {
      BloomPrune.bloomPrunedSemiJoin(large, small, "k", "sk",
        expectedItems = buildRows, fpp = 0.01).count()
    }
    require(plain == pruned, s"result mismatch: plain=$plain bloom=$pruned")
    spark.stop()
  }
}
