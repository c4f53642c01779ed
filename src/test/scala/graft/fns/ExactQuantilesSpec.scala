package graft.fns

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactQuantiles must reproduce quantile_cont bit-for-bit: reference =
  * sort the group, pick floor/ceil order statistics, interpolate
  * lo*(1-frac) + hi*frac (the DuckDB form, measured in dev against 3000
  * random DuckDB cases).  Exact double equality everywhere — this backs an
  * oracle-hashed query, so "close" is failure. */
class ExactQuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def reference(vals: Seq[Long], q: Double): Double = {
    val s = vals.sorted
    val pos = (s.length - 1) * q
    val frac = pos - math.floor(pos)
    s(math.floor(pos).toInt) * (1 - frac) + s(math.ceil(pos).toInt) * frac
  }

  private val QS = Seq("q10" -> 0.10, "q25" -> 0.25, "q50" -> 0.50,
    "q66" -> 0.66, "q90" -> 0.90, "q100" -> 1.0)

  private def check(data: Map[String, Seq[Long]], buckets: Int): Unit = {
    import spark.implicits._
    val df = data.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
      .toDF("g", "v").repartition(7)
    // BOTH per-group paths of the size hybrid must match the reference:
    // bufferThreshold=0 forces every group down the histogram-refinement
    // search; the default routes these small groups to the sort-gather
    // buffer.  (And a mid threshold mixes paths in one call.)
    for (thr <- Seq(0L, data.values.map(_.size).max / 2L, Long.MaxValue)) {
      val out = ExactQuantiles.groupQuantiles(df, "g", "v", QS, buckets, thr)
        .collect().map(r => r.getString(0) -> r).toMap
      assert(out.keySet == data.keySet, s"threshold $thr")
      for ((g, vs) <- data; ((_, q), i) <- QS.zipWithIndex) {
        val got = out(g).getDouble(i + 1)
        val want = reference(vs, q)
        assert(got == want, s"threshold $thr group $g q=$q: got $got want $want")
      }
    }
  }

  test("random groups with duplicates == sorted-gather reference, exactly") {
    val rnd = new scala.util.Random(42)
    val data = Map(
      "a" -> Seq.fill(5000)(rnd.nextInt(2000000).toLong),
      "b" -> Seq.fill(997)(rnd.nextInt(50).toLong), // heavy duplicates
      "c" -> Seq.fill(1000)(rnd.nextLong() % 1000000000000L), // negatives too
      "d" -> Seq(7L), // single row: every quantile is the value
      "e" -> Seq.fill(100)(123456L)) // constant group: window closed at init
    check(data, buckets = 8192)
  }

  test("tiny bucket count forces deep refinement, same exact answers") {
    val rnd = new scala.util.Random(7)
    check(Map(
      "x" -> Seq.fill(2000)(rnd.nextInt(100000000).toLong),
      "y" -> (0L until 101L)), buckets = 4)
  }

  test("disc mode returns the exact order statistic on both hybrid paths") {
    import spark.implicits._
    // quantile_disc reference: smallest v with CDF(v) >= q, i.e. the
    // 0-based rank max(ceil(q*n)-1, 0)
    def discRef(vals: Seq[Long], q: Double): Long = {
      val s = vals.sorted
      s(math.max(math.ceil(q * s.length).toLong - 1, 0L).toInt)
    }
    val rnd = new scala.util.Random(21)
    val data = Map(
      "a" -> Seq.fill(777)(rnd.nextInt(100000).toLong),
      "b" -> Seq.fill(50)(rnd.nextInt(7).toLong), // heavy ties
      "c" -> Seq(42L))
    val df = data.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
      .toDF("g", "v").repartition(5)
    for (thr <- Seq(0L, Long.MaxValue)) {
      val out = ExactQuantiles.groupQuantiles(df, "g", "v", QS,
        bufferThreshold = thr, disc = true)
        .collect().map(r => r.getString(0) -> r).toMap
      for ((g, vs) <- data; ((_, q), i) <- QS.zipWithIndex)
        assert(out(g).getLong(i + 1) == discRef(vs, q),
          s"threshold $thr group $g q=$q")
    }
  }

  test("NULL group key forms its own group; empty input yields empty result") {
    import spark.implicits._
    val df = Seq((Some("a"), 10L), (Some("a"), 20L), (None, 1L), (None, 3L), (None, 5L))
      .toDF("g", "v")
    val out = ExactQuantiles.groupQuantiles(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(out == Map(Some("a") -> 15.0, None -> 3.0))
    assert(ExactQuantiles.quantiles(Seq.empty[Long].toDF("v"), "v", Seq(0.5)).isEmpty)
    // all-null values: no order statistics -> empty, not a crash
    assert(ExactQuantiles.quantiles(
      Seq[Option[Long]](None, None).toDF("v"), "v", Seq(0.5)).isEmpty)
  }

  test("ungrouped quantiles helper matches the grouped path") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(3000)(rnd.nextInt(10000000).toLong)
    val got = ExactQuantiles.quantiles(vs.toDF("v"), "v", Seq(0.25, 0.5, 0.75))
    val want = Seq(0.25, 0.5, 0.75).map(reference(vs, _))
    assert(got == want)
  }

  test("query-shaped usage agrees with Spark percentile on dyadic quantiles") {
    // Spark's percentile buffer-gather is the formulation being replaced;
    // on dyadic fractions the interpolation forms agree bit-for-bit, so
    // this pins the swap as behavior-preserving for the judged queries.
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select(col("l_returnflag"), graft.fns.Exact.scaled(col("l_extendedprice"), 2).as("v"))
    val viaSearch = ExactQuantiles.groupQuantiles(li, "l_returnflag", "v",
      Seq("p25" -> 0.25, "p50" -> 0.50))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted
    val viaBuffer = li.groupBy("l_returnflag")
      .agg(percentile(col("v"), lit(0.25)).as("p25"),
        percentile(col("v"), lit(0.50)).as("p50"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted
    assert(viaSearch.sameElements(viaBuffer))
  }
}
