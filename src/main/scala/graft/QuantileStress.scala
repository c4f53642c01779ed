package graft

import org.apache.spark.sql.functions._

/** Dev-only scale stress for ExactQuantiles, both extremes:
  *
  *   - ONE group x 100M rows — the shape where Spark's buffer-all
  *     `percentile` concentrates the entire group in a single executor
  *     map (~1.6 GB of boxed longs here, OOM at 10x) while the
  *     histogram-refinement search keeps a <= searches x 8192-cell
  *     aggregate per pass regardless of group size;
  *   - 1M groups (nGroups arg) — the shape where a driver-side search
  *     list dies (O(groups x quantiles) driver rows); the distributed
  *     search state keeps the frontier in a checkpointed DataFrame and
  *     the driver does O(passes) control actions only.
  *
  * Values are a multiplicative permutation (gcd(a, m) = 1) of [0, m)
  * within each group, so every order statistic is known in closed form
  * and the result is asserted exact — DISTRIBUTED (a mismatch count),
  * never by collecting a million group rows.
  *
  * `sbt "runMain graft.QuantileStress [nRows] [nGroups]"`
  */
object QuantileStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    val groups = if (args.length > 1) args(1).toLong else 1L
    require(n % groups == 0, "nRows must divide evenly into nGroups")
    val m = n / groups // rows per group
    val a = 2654435761L // odd, not divisible by 5 -> coprime with 10^x m
    require(BigInt(a).gcd(BigInt(m)) == 1, "a must be coprime with rows-per-group")
    val spark = DevSession.local()

    // id -> (group = id mod G, j = id div G, v = (j * a) mod m): every
    // group holds the same permutation of [0, m)
    val df = spark.range(n).select(
      pmod(col("id"), lit(groups)).as("g"),
      pmod(expr(s"(id div $groups)") * a, lit(m)).as("v"))
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p90" -> 0.90)
    val t0 = System.nanoTime()
    val out = graft.fns.ExactQuantiles.groupQuantiles(df, "g", "v", qs)
      .localCheckpoint()
    val nOut = out.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // permutation of [0, m): the k-th order statistic IS k — same closed
    // form for every group, so the assert is one distributed filter
    assert(nOut == groups, s"expected $groups result rows, got $nOut")
    val mismatch = qs.map { case (name, q) =>
      val pos = (m - 1) * q
      val frac = pos - math.floor(pos)
      val want = math.floor(pos) * (1 - frac) + math.ceil(pos) * frac
      col(name) =!= lit(want)
    }.reduce(_ || _)
    val bad = out.where(mismatch).count()
    assert(bad == 0L, s"$bad groups with wrong quantiles")
    println(f"""{"stress":"quantile","rows":$n,"groups":$groups,"quantiles":3,"sec":$sec%.1f,"exact":true}""")
    spark.stop()
  }
}
