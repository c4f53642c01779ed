package graft

import org.apache.spark.sql.functions._

/** Dev-only scale stress for ExactQuantiles, all three shapes the per-group
  * size hybrid must handle:
  *
  *   - ONE group x 100M rows (`groups = 1`) — the shape where Spark's
  *     buffer-all `percentile` concentrates the entire group in a single
  *     executor map (~1.6 GB of boxed longs here, OOM at 10x) while the
  *     histogram-refinement search keeps a <= searches x 8192-cell
  *     aggregate per pass regardless of group size;
  *   - 1M groups (`groups = 1000000`) — the shape where a driver-side
  *     search list dies (O(groups x quantiles) driver rows); the hybrid
  *     routes these below-threshold groups to one bounded sort-gather
  *     aggregate and the driver does O(passes) control actions only;
  *   - MIXED (`mixed` third arg) — half the rows in `groups` small groups
  *     AND half in one hot group, in a single call: pass 0's exact counts
  *     route each group to its path, and both come back exact.
  *
  * Values are a multiplicative permutation (gcd(a, m) = 1) of [0, m)
  * within each group, so every order statistic is known in closed form
  * and the result is asserted exact — DISTRIBUTED (a mismatch count),
  * never by collecting a million group rows.
  *
  * `sbt "runMain graft.QuantileStress [nRows] [nGroups] [mixed]"`
  */
object QuantileStress {
  private val A = 2654435761L // odd, not divisible by 5 -> coprime with 10^x m

  private def permuted(groups: Long, m: Long) = {
    require(BigInt(A).gcd(BigInt(m)) == 1, s"$A must be coprime with $m")
    pmod(expr(s"(id div $groups)") * A, lit(m))
  }

  /** The closed-form quantile of a permutation of [0, m): the k-th order
    * statistic IS k. */
  private def want(m: Long, q: Double): Double = {
    val pos = (m - 1) * q
    val frac = pos - math.floor(pos)
    math.floor(pos) * (1 - frac) + math.ceil(pos) * frac
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    val groups = if (args.length > 1) args(1).toLong else 1L
    val mixed = args.length > 2 && args(2) == "mixed"
    val spark = DevSession.local()
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p90" -> 0.90)

    val (df, mSmall, mHot) = if (!mixed) {
      require(n % groups == 0, "nRows must divide evenly into nGroups")
      val m = n / groups
      (spark.range(n).select(pmod(col("id"), lit(groups)).as("g"),
        permuted(groups, m).as("v")), m, -1L)
    } else {
      // ids < half: `groups` small groups of half/groups rows; the rest is
      // ONE hot group holding a permutation of [0, half)
      val half = n / 2
      require(half % groups == 0, "nRows/2 must divide evenly into nGroups")
      val m = half / groups
      require(BigInt(A).gcd(BigInt(half)) == 1, "A must be coprime with n/2")
      val d = spark.range(n).select(
        when(col("id") < half, pmod(col("id"), lit(groups)))
          .otherwise(lit(groups)).as("g"),
        when(col("id") < half, permuted(groups, m))
          .otherwise(pmod((col("id") - half) * A, lit(half))).as("v"))
      (d, m, half)
    }

    val t0 = System.nanoTime()
    val out = graft.fns.ExactQuantiles.groupQuantiles(df, "g", "v", qs)
      .localCheckpoint()
    val nOut = out.count()
    val sec = (System.nanoTime() - t0) / 1e9

    val wantGroups = if (mixed) groups + 1 else groups
    assert(nOut == wantGroups, s"expected $wantGroups result rows, got $nOut")
    def mismatch(m: Long) =
      qs.map { case (name, q) => col(name) =!= lit(want(m, q)) }.reduce(_ || _)
    val badSmall = out.where(col("g") < groups && mismatch(mSmall)).count()
    assert(badSmall == 0L, s"$badSmall small groups with wrong quantiles")
    if (mixed) {
      val badHot = out.where(col("g") === groups && mismatch(mHot)).count()
      assert(badHot == 0L, "hot group has wrong quantiles")
    }
    println(f"""{"stress":"quantile","rows":$n,"groups":$wantGroups,"mixed":$mixed,"quantiles":3,"sec":$sec%.1f,"exact":true}""")
    spark.stop()
  }
}
