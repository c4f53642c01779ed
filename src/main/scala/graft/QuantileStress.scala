package graft

import org.apache.spark.sql.functions._

/** Dev-only scale stress for ExactQuantiles: 100M rows in ONE group —
  * exactly the shape where Spark's buffer-all `percentile` concentrates
  * the entire group in a single executor map (~1.6 GB of boxed longs
  * here, OOM at 10x) while the histogram-refinement search keeps a
  * <= searches x 8192-cell aggregate per pass regardless of group size.
  *
  * Values are a multiplicative permutation of [0, n) (gcd(a, n) = 1), so
  * every order statistic is known in closed form and the result is
  * asserted exact, not spot-checked.
  *
  * `sbt "runMain graft.QuantileStress [nRows]"`
  */
object QuantileStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    val a = 2654435761L // odd, not divisible by 5 -> coprime with 10^x n
    require(BigInt(a).gcd(BigInt(n)) == 1, "a must be coprime with n")
    val spark = DevSession.local()

    val df = spark.range(n).select(lit("g").as("g"), pmod(col("id") * a, lit(n)).as("v"))
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p90" -> 0.90)
    val t0 = System.nanoTime()
    val row = graft.fns.ExactQuantiles.groupQuantiles(df, "g", "v", qs).collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9

    // permutation of [0, n): the k-th order statistic IS k
    qs.zipWithIndex.foreach { case ((name, q), i) =>
      val pos = (n - 1) * q
      val frac = pos - math.floor(pos)
      val want = math.floor(pos) * (1 - frac) + math.ceil(pos) * frac
      val got = row.getDouble(i + 1)
      assert(got == want, s"$name: got $got want $want")
    }
    println(f"""{"stress":"quantile","rows":$n,"groups":1,"quantiles":3,"sec":$sec%.1f,"exact":true}""")
    spark.stop()
  }
}
