package graft

import org.apache.spark.sql.functions._

/** Dev-only scale stress for [[graft.joins.NonEquiJoins.fuzzySelfJoin2]]
  * (the d ≤ 2 position-coded FastSS self-join): synthesizes n random
  * length-15 strings over a 26-letter alphabet (cross-string d ≤ 2
  * collisions are vanishingly rare at this length), plants a partner at
  * edit distance 1-2 for every 10th string, and measures wall seconds at
  * increasing n.  The pipeline is O(n·L²) index rows through one bucket
  * join, so wall time must scale ~linearly in n while found pairs track
  * the planted count exactly.
  *
  * `SPARK_DRIVER_MEM=96g SPARK_GRAFT_CPUS=32 sbt "runMain graft.FuzzyStress <n> [<n> ...]"`
  */
object FuzzyStress {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(250000L, 1000000L)
    val spark = DevSession.local()
    import spark.implicits._
    for (n <- sizes) {
      // deterministic per-id strings: 15 letters from xxhash64 nibbles;
      // every 10th id emits a partner with 1 substitution + (id%2) deletion
      val base = spark.range(n).select(col("id"),
        concat((0 until 15).map(i =>
          call_function("char", lit(97) + pmod(xxhash64(col("id"), lit(i)), lit(26)))): _*).as("s"))
      val partners = base.filter(pmod(col("id"), lit(10)) === 0)
        .select((col("id") + n).as("id"),
          when(pmod(call_function("div", col("id"), lit(10L)), lit(2)) === 0,
            concat(lit("q"), substring(col("s"), 2, 14)))  // 1 substitution
          .otherwise(concat(lit("q"), substring(col("s"), 3, 13))) // sub + deletion
          .as("s"))
      val docs = base.unionByName(partners).localCheckpoint()
      val planted = n / 10
      val t0 = System.nanoTime()
      val pairs = graft.joins.NonEquiJoins.fuzzySelfJoin2(docs, "id", "s").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stress":"fuzzySelfJoin2","n":$n,"planted":$planted,"pairs":$pairs,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
