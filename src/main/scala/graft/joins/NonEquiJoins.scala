package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shuffle-parallel non-equi (theta) join operators — the core capability of
  * the reference engine (a Hadoop MapReduce implementation of the
  * 1-Bucket-Theta / M-Bucket algorithm family of Okcan & Riedewald,
  * "Processing Theta-Joins using MapReduce", SIGMOD 2011), re-expressed
  * Spark-first.
  *
  * Design note (100 TB posture): OSS Catalyst plans a bare non-equi
  * `join(cond)` as BroadcastNestedLoopJoin (if one side fits in memory) or
  * CartesianProduct (if not).  Both are fatal at scale.  Every operator here
  * therefore rewrites the theta predicate into an *equi* join on a synthetic
  * bucket key — the Spark-native analog of M-Bucket candidate-cell pruning:
  * only join-matrix cells that can satisfy the predicate are materialized,
  * and the work is hash-partitioned across the cluster by bucket.  The exact
  * predicate is re-applied after the equi join, so bucketing affects only
  * performance, never results.  Callers must pre-rename columns so the two
  * sides share no names (self-join safe).
  */
object NonEquiJoins {

  /** `Math.floorDiv(c, d)` as Catalyst expressions: truncating integral
    * `div`, minus 1 when the remainder is negative.  Exact over the whole
    * long range (`%` and `div` cannot overflow for d > 0). */
  private def floorDivLong(c: Column, d: Long): Column = {
    val l = c.cast(LongType)
    call_function("div", l, lit(d)) -
      when(l % d < 0, lit(1L)).otherwise(lit(0L))
  }

  /** Band join: pairs with |left(lVal) − right(rVal)| ≤ eps (< eps if
    * `strict`), optionally under extra equi keys.
    *
    * Rewrite: bucket width = eps; the left side is replicated to its bucket
    * ±1 (`explode`), the right side keeps its single bucket, and the join is
    * a plain shuffle equi join on (bucket, extraKeys).  Any qualifying pair
    * lands in exactly one bucket (the right row's), so no dedup is needed.
    * Replication factor is a constant 3 — at 100 TB this is a single
    * hash-partitioned shuffle, never a nested loop.
    */
  def bandJoin(
      left: DataFrame, right: DataFrame,
      lVal: String, rVal: String, eps: Double,
      extraKeys: Seq[(String, String)] = Nil,
      strict: Boolean = false,
      bucketWithKeys: Boolean = false): DataFrame = {
    val diff = abs(col(lVal) - col(rVal))
    val band = if (strict) diff < eps else diff <= eps
    if (extraKeys.nonEmpty && !bucketWithKeys) {
      // With a selective equi key the bucket only triples the shuffle: join
      // on the keys and post-filter the band.  Set bucketWithKeys=true when
      // the keys are coarse (few distinct values) so the bucket still
      // prunes within each key group.
      val keyCond = extraKeys.map { case (a, b) => left(a) === right(b) }.reduce(_ && _)
      left.join(right, keyCond).filter(band)
    } else {
      val lb = left.withColumn("__gb",
        explode(array((-1 to 1).map(d => floor(col(lVal) / eps).cast(LongType) + d): _*)))
      val rb = right.withColumn("__gb", floor(col(rVal) / eps).cast(LongType))
      val keyCond = extraKeys.map { case (a, b) => lb(a) === rb(b) }
        .foldLeft(lb("__gb") === rb("__gb"))(_ && _)
      lb.join(rb, keyCond).filter(band).drop("__gb")
    }
  }

  /** Long-typed band join (e.g. epoch-micros intervals). Same rewrite with
    * integer bucket arithmetic. */
  def bandJoinLong(
      left: DataFrame, right: DataFrame,
      lVal: String, rVal: String, eps: Long,
      extraKeys: Seq[(String, String)] = Nil,
      strict: Boolean = false): DataFrame = {
    // Time-style keys (e.g. user_id) are usually coarse, so the bucket is
    // kept even alongside equi keys — it prunes within each key group.
    // Buckets use exact long floor-division: truncating `div` corrected by
    // one when the remainder is negative (Math.floorDiv as expressions) —
    // overflow-free over the whole long range, where a double quotient
    // would mis-bucket values above 2^53 and a pmod-subtraction would wrap
    // within eps of Long.MinValue, silently dropping qualifying pairs.
    require(eps > 0, s"eps must be > 0, got $eps")
    def bucketOf(c: Column): Column = floorDivLong(c, eps)
    val lb = left.withColumn("__gb",
      explode(array((-1 to 1).map(d => bucketOf(col(lVal)) + d): _*)))
    val rb = right.withColumn("__gb", bucketOf(col(rVal)))
    val keyCond = extraKeys.map { case (a, b) => lb(a) === rb(b) }
      .foldLeft(lb("__gb") === rb("__gb"))(_ && _)
    val diff = abs(col(lVal) - col(rVal))
    val band = if (strict) diff < eps else diff <= eps
    lb.join(rb, keyCond).filter(band).drop("__gb")
  }

  /** Inequality (theta) join: pairs with left(lVal) < right(rVal).
    *
    * Rewrite (M-Bucket-I analog): range-bucket the value domain into
    * `buckets` uniform cells; a left row in bucket b can only match right
    * rows in buckets ≥ b, so the left side is replicated to its suffix of
    * buckets (`sequence` + `explode`) and joined equi on the bucket id.
    * The empty half of the join matrix is never materialized.  `lo`/`hi`
    * only tune bucket balance — rows outside are clamped and still join
    * correctly because the exact predicate is re-applied.
    *
    * At 100 TB, replace the static [lo,hi] with `approxQuantile` boundaries
    * per relation (same plan shape, skew-proof); AQE then splits any hot
    * bucket.
    */
  def lessThanJoin(
      left: DataFrame, right: DataFrame,
      lVal: String, rVal: String,
      lo: Double, hi: Double, buckets: Int = 32): DataFrame = {
    val clampL = least(greatest(width_bucket(col(lVal), lit(lo), lit(hi), lit(buckets)), lit(1L)), lit(buckets.toLong))
    val clampR = least(greatest(width_bucket(col(rVal), lit(lo), lit(hi), lit(buckets)), lit(1L)), lit(buckets.toLong))
    val lb = left.withColumn("__tb", explode(sequence(clampL, lit(buckets.toLong))))
    val rb = right.withColumn("__tb", clampR)
    lb.join(rb, lb("__tb") === rb("__tb"))
      .filter(col(lVal) < col(rVal))
      .drop("__tb")
  }

  /** Interval-overlap join on integer endpoints (e.g. epoch micros):
    * pairs whose [start, start+len) windows overlap, under extra equi keys.
    * Overlap with equal fixed lengths reduces to a strict band on the
    * starts, which reuses the band rewrite.
    */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame,
      lStart: String, rStart: String, len: Long,
      extraKeys: Seq[(String, String)] = Nil): DataFrame =
    bandJoinLong(left, right, lStart, rStart, len, extraKeys, strict = true)

  /** Inequality join with DATA-DRIVEN bucket boundaries — the skew-proof
    * form of [[lessThanJoin]] and the full Spark analog of M-Bucket-I's
    * statistics-driven candidate cells [OR11 §5]: boundaries come from
    * `approxQuantile` over the union of both value distributions, so every
    * bucket holds ~|data|/buckets rows no matter how skewed the values
    * (uniform [lo,hi] cells degrade to one hot bucket on zipfian data).
    * Same join shape after planning: left replicated to its suffix of
    * buckets, equi join on bucket id, exact predicate re-applied.
    * The quantile scan is one extra pass (at 100 TB: run it on a sample or
    * reuse table statistics); the join itself is unchanged.
    */
  def lessThanJoinQuantile(
      left: DataFrame, right: DataFrame,
      lVal: String, rVal: String, buckets: Int = 32): DataFrame = {
    val vals = left.select(col(lVal).cast("double").as("v"))
      .unionByName(right.select(col(rVal).cast("double").as("v")))
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    // distinct+sorted: duplicate quantiles on heavy hitters would create
    // zero-width buckets
    val bounds = vals.stat.approxQuantile("v", probes, 0.001).distinct.sorted
    def bucketOf(c: Column): Column =
      bounds.zipWithIndex.foldLeft(lit(0L)) { case (acc, (b, i)) =>
        when(c > b, lit(i.toLong + 1)).otherwise(acc)
      }
    val n = bounds.length.toLong
    val lb = left.withColumn("__tb", explode(sequence(bucketOf(col(lVal)), lit(n))))
    val rb = right.withColumn("__tb", bucketOf(col(rVal)))
    lb.join(rb, lb("__tb") === rb("__tb"))
      .filter(col(lVal) < col(rVal))
      .drop("__tb")
  }

  /** Driver-side sampled statistics feeding [[lessThanStrategy]]: input
    * cardinalities, the mass fraction of the hottest uniform value cell
    * (the skew signal), the estimated output pair count (sample-estimated
    * P(a < b) × nL × nR — the density signal), the sampled value range
    * (reused as static bucket bounds), and whether the key types admit the
    * sort-merge operator. */
  final case class LessThanStats(
      nLeft: Long, nRight: Long, hotCellFrac: Double, estPairs: Double,
      typesOk: Boolean, lo: Double, hi: Double)

  /** One deterministic sample pass per side (seeded, bounded driver
    * footprint).  Cardinalities come from `count()` here — one scan each;
    * a 100 TB deployment substitutes catalog statistics for the counts and
    * a TABLESAMPLE for the value sample, leaving the routing logic
    * unchanged. */
  def lessThanStats(
      left: DataFrame, right: DataFrame,
      lVal: String, rVal: String,
      buckets: Int = 32, sampleSize: Int = 2048): LessThanStats = {
    val nL = left.count()
    val nR = right.count()
    def sampleVals(df: DataFrame, c: String, n: Long): Array[Double] = {
      val frac =
        if (n <= sampleSize) 1.0
        else math.min(1.0, sampleSize * 4.0 / n)
      df.select(col(c).cast("double").as("v")).filter(col("v").isNotNull)
        .sample(withReplacement = false, frac, 42L)
        .limit(sampleSize).collect().map(_.getDouble(0))
    }
    val sl = sampleVals(left, lVal, nL)
    val sr = sampleVals(right, rVal, nR)
    val all = sl ++ sr
    val (lo, hi) =
      if (all.isEmpty) (0.0, 0.0) else (all.min, all.max)
    val hotFrac =
      if (all.isEmpty) 0.0
      else if (lo == hi) 1.0
      else {
        val counts = new Array[Long](buckets)
        all.foreach { v =>
          val i = math.min(buckets - 1, ((v - lo) / (hi - lo) * buckets).toInt)
          counts(i) += 1
        }
        counts.max.toDouble / all.length
      }
    val srSorted = sr.sorted
    val p =
      if (sl.isEmpty || sr.isEmpty) 0.0
      else {
        var hits = 0L
        sl.foreach { a =>
          var i = java.util.Arrays.binarySearch(srSorted, a)
          if (i < 0) i = -i - 1
          else { while (i < srSorted.length && srSorted(i) == a) i += 1 }
          hits += (srSorted.length - i)
        }
        hits.toDouble / (sl.length.toDouble * srSorted.length)
      }
    // the sort-merge operator's supported key types (plans/IEJoin.scala)
    val supported: Seq[org.apache.spark.sql.types.DataType] = Seq(
      org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.DoubleType, org.apache.spark.sql.types.FloatType)
    val typesOk = left.schema(lVal).dataType == right.schema(rVal).dataType &&
      supported.contains(left.schema(lVal).dataType)
    LessThanStats(nL, nR, hotFrac, p * nL * nR, typesOk, lo, hi)
  }

  /** Route an inequality join to its measured-best physical shape
    * (BASELINE.md head-to-heads, rounds 3/8):
    *
    *  - "quantile" ([[lessThanJoinQuantile]]) when the hottest uniform
    *    value cell would hold more build rows than `cellRowBudget` —
    *    planned balance is a MEMORY guarantee at the 100 TB margin (a hot
    *    cell whose hash/sort buffer exceeds executor memory spills or
    *    OOMs), which the measurements show is the only regime where the
    *    quantile pass earns its extra scan;
    *  - "iejoin" ([[graft.plans.IEJoin]]) otherwise while the estimated
    *    output stays under `densePairBar` — the regime where the
    *    sort-merge sweep's zero per-pair predicate work measured 25-30%
    *    faster than the bucketed rewrite;
    *  - "static" ([[lessThanJoin]] + AQE) for larger outputs, where the
    *    shapes measured at parity and the bucketed equi join stays inside
    *    WholeStageCodegen for fused join+agg pipelines (and when the key
    *    types rule the custom operator out).
    */
  def lessThanStrategy(
      stats: LessThanStats,
      cellRowBudget: Long = 4000000L,
      densePairBar: Long = 500000000L): String = {
    val hotRows = stats.hotCellFrac * math.max(stats.nLeft, stats.nRight)
    if (hotRows > cellRowBudget) "quantile"
    else if (stats.typesOk && stats.estPairs <= densePairBar) "iejoin"
    else "static"
  }

  /** Stats-driven inequality join `left(lVal) < right(rVal)`: samples both
    * sides, routes via [[lessThanStrategy]], and dispatches to the chosen
    * shape.  All three shapes are exact (the predicate is re-applied or
    * natively merged), so routing affects only performance — the chooser
    * spec asserts both the routing and result equality across shapes. */
  def lessThanJoinAuto(
      left: DataFrame, right: DataFrame,
      lVal: String, rVal: String,
      buckets: Int = 32,
      cellRowBudget: Long = 4000000L,
      densePairBar: Long = 500000000L,
      sampleSize: Int = 2048): DataFrame = {
    val st = lessThanStats(left, right, lVal, rVal, buckets, sampleSize)
    lessThanStrategy(st, cellRowBudget, densePairBar) match {
      case "quantile" => lessThanJoinQuantile(left, right, lVal, rVal, buckets)
      case "iejoin" => graft.plans.IEJoin(left, right, lVal, rVal, buckets)
      case _ =>
        val (lo, hi) =
          if (st.lo < st.hi) (st.lo, st.hi) else (st.lo - 1.0, st.hi + 1.0)
        lessThanJoin(left, right, lVal, rVal, lo, hi, buckets)
    }
  }

  /** Point-in-interval join with VARIABLE-length intervals: each point row
    * (pCol) matches interval rows with startCol <= p < endCol, under extra
    * equi keys.
    *
    * Rewrite: intervals are replicated across every fixed-width bucket they
    * span (`sequence` over exact long floor-div bucket ids); points keep
    * their single bucket; equi join on (bucket, keys); exact predicate
    * re-applied.  Replication is O(len / bucketWidth) per interval — pick
    * bucketWidth near the median interval length so replication stays a
    * small constant while each point probes exactly one bucket.  This is
    * the general form of the fixed-length interval overlap join (which
    * reduces to a band).
    */
  def pointInIntervalJoin(
      points: DataFrame, intervals: DataFrame,
      pCol: String, startCol: String, endCol: String,
      bucketWidth: Long,
      extraKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    def bucketOf(c: Column): Column = floorDivLong(c, bucketWidth)
    val ib = intervals.withColumn("__pb",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pb = points.withColumn("__pb", bucketOf(col(pCol)))
    val keyCond = extraKeys.map { case (a, b) => pb(a) === ib(b) }
      .foldLeft(pb("__pb") === ib("__pb"))(_ && _)
    pb.join(ib, keyCond)
      .filter(col(pCol) >= col(startCol) && col(pCol) < col(endCol))
      .drop("__pb")
  }

  /** Sampled median interval length — the bucket-width statistic for the
    * interval-join family.  Replication per interval is O(len / width), so
    * width ≈ the median length keeps replication a small constant for the
    * typical row while each point still probes exactly one bucket; a
    * caller-guessed width that is 100× too small replicates every interval
    * 100×, and 100× too large degrades bucketing to an all-in-one-cell
    * join.  One deterministic bounded sample (same posture as
    * [[lessThanStats]]; a 100 TB deployment substitutes TABLESAMPLE or
    * column statistics). */
  def medianIntervalWidth(
      intervals: DataFrame, startCol: String, endCol: String,
      sampleSize: Int = 2048): Long = {
    val lens = intervals
      .select((col(endCol).cast(LongType) - col(startCol).cast(LongType)).as("len"))
      .filter(col("len") > 0)
    val n = lens.count()
    if (n == 0) return 1L
    val frac = if (n <= sampleSize) 1.0 else math.min(1.0, sampleSize * 4.0 / n)
    val sample = lens.sample(withReplacement = false, frac, 42L)
      .limit(sampleSize).collect().map(_.getLong(0)).sorted
    if (sample.isEmpty) 1L else math.max(1L, sample(sample.length / 2))
  }

  /** [[pointInIntervalJoin]] with a STATS-DRIVEN bucket width (the sampled
    * median interval length) — the interval-family counterpart of
    * [[lessThanJoinAuto]]: callers get the replication/probe balance the
    * operator's scaladoc prescribes without supplying the tuning knob.
    * Exactness is unaffected (the width only moves cost). */
  def pointInIntervalJoinAuto(
      points: DataFrame, intervals: DataFrame,
      pCol: String, startCol: String, endCol: String,
      extraKeys: Seq[(String, String)] = Nil,
      sampleSize: Int = 2048): DataFrame =
    pointInIntervalJoin(points, intervals, pCol, startCol, endCol,
      medianIntervalWidth(intervals, startCol, endCol, sampleSize), extraKeys)

  /** Interval-interval overlap join with VARIABLE lengths on BOTH sides:
    * pairs whose half-open windows [lStart, lEnd) and [rStart, rEnd)
    * overlap, under extra equi keys.  The general form of the theta-join
    * family (fixed-length overlap reduces to a band; point-in-interval is
    * the one-sided case).
    *
    * Rewrite: BOTH sides are replicated across every fixed-width bucket
    * their interval spans; equi join on (bucket, keys); exact overlap
    * predicate re-applied.  Exactly-once emission without a distinct: a
    * qualifying pair is kept only in the bucket containing the overlap
    * start `greatest(lStart, rStart)` — a point both intervals span, so
    * both replicas exist there and nowhere else is the pair accepted.
    * Replication is O(len / bucketWidth) per row; pick bucketWidth near
    * the median interval length.
    */
  def intervalOverlapJoinVar(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long,
      extraKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    def bucketOf(c: Column): Column = floorDivLong(c, bucketWidth)
    // end is exclusive: an interval ending exactly on a bucket boundary
    // does not occupy the next bucket
    val lb = left.withColumn("__vb",
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd) - 1))))
    val rb = right.withColumn("__vb", explode(
      sequence(bucketOf(col(rStart)), bucketOf(col(rEnd) - 1))))
    val keyCond = extraKeys.map { case (a, b) => lb(a) === rb(b) }
      .foldLeft(lb("__vb") === rb("__vb"))(_ && _)
    val overlap = col(lStart) < col(rEnd) && col(rStart) < col(lEnd)
    val once = lb("__vb") === bucketOf(greatest(col(lStart), col(rStart)))
    lb.join(rb, keyCond).filter(overlap && once).drop("__vb")
  }

  /** As-of join: for each left row, the single latest right row with
    * right(ts) strictly before left(ts), per key.
    *
    * Spark-first plan: tag both inputs, union them, and resolve the match
    * with one window pass (`max(struct(ts, id)) OVER (... RANGE BETWEEN
    * UNBOUNDED PRECEDING AND 1 PRECEDING)`).  One shuffle on the key, no
    * join matrix at all — this is the scalable shape for 100 TB (vs the
    * naive non-equi join + row_number which shuffles |L|·|R| candidates).
    *
    * Inputs: `probe`(key, ts, probeId) and `quote`(key, ts, quoteId) with
    * the given column names; returns (key, probeId, probeTs, quoteId,
    * quoteTs) where quote columns are null when no earlier quote exists.
    */
  def asofJoin(
      probe: DataFrame, quote: DataFrame,
      key: String, ts: String, probeId: String, quoteId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = probe.select(col(key).as("__k"), col(ts).as("__t"),
      col(probeId).as("__pid"), lit(true).as("__isProbe"))
    val q = quote.select(col(key).as("__k"), col(ts).as("__t"),
      col(quoteId).as("__qid"))
      .withColumn("__pid", lit(null).cast(p.schema("__pid").dataType))
      .withColumn("__isProbe", lit(false))
      .select("__k", "__t", "__pid", "__isProbe", "__qid")
    val u = p.withColumn("__qid", lit(null).cast(q.schema("__qid").dataType))
      .select("__k", "__t", "__pid", "__isProbe", "__qid")
      .unionByName(q)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(Window.unboundedPreceding, -1)
    u.withColumn("__match",
        max(when(!col("__isProbe"), struct(col("__t").as("t"), col("__qid").as("id")))).over(w))
      .filter(col("__isProbe"))
      .select(
        col("__k").as(key), col("__pid").as(probeId), col("__t").as(ts),
        col("__match.id").as(quoteId), col("__match.t").as(s"${quoteId}_ts"))
  }

  /** Forward as-of join: the single EARLIEST right row with right(ts)
    * strictly after left(ts), per key — the "next event" resolution
    * (e.g. next fill after an order, next click after an impression).
    * Identical one-shuffle union+window shape as [[asofJoin]], with the
    * frame reflected (`min(struct) OVER (... RANGE BETWEEN 1 FOLLOWING
    * AND UNBOUNDED FOLLOWING)`); ties on ts break to the smallest id. */
  def asofJoinFwd(
      probe: DataFrame, quote: DataFrame,
      key: String, ts: String, probeId: String, quoteId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = probe.select(col(key).as("__k"), col(ts).as("__t"),
      col(probeId).as("__pid"), lit(true).as("__isProbe"))
    val q = quote.select(col(key).as("__k"), col(ts).as("__t"),
      col(quoteId).as("__qid"))
      .withColumn("__pid", lit(null).cast(p.schema("__pid").dataType))
      .withColumn("__isProbe", lit(false))
      .select("__k", "__t", "__pid", "__isProbe", "__qid")
    val u = p.withColumn("__qid", lit(null).cast(q.schema("__qid").dataType))
      .select("__k", "__t", "__pid", "__isProbe", "__qid")
      .unionByName(q)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(1, Window.unboundedFollowing)
    u.withColumn("__match",
        min(when(!col("__isProbe"), struct(col("__t").as("t"), col("__qid").as("id")))).over(w))
      .filter(col("__isProbe"))
      .select(
        col("__k").as(key), col("__pid").as(probeId), col("__t").as(ts),
        col("__match.id").as(quoteId), col("__match.t").as(s"${quoteId}_ts"))
  }

  /** Nearest as-of join: the single right row CLOSEST in time to each
    * probe row, in EITHER direction (strictly earlier or strictly later —
    * equal timestamps are excluded, like both directional variants) —
    * the sensor/series alignment resolution.  One union + ONE window
    * shuffle computes both directional candidates ([[asofJoin]]'s
    * backward frame and [[asofJoinFwd]]'s forward frame over the same
    * sorted partition), then a row-local comparison keeps the nearer.
    * Ties: equal distance prefers the BACKWARD match; equal timestamps
    * within a direction keep that direction's deterministic id
    * (backward: largest; forward: smallest).  Output adds the matched
    * timestamp and the absolute gap. */
  def asofJoinNearest(
      probe: DataFrame, quote: DataFrame,
      key: String, ts: String, probeId: String, quoteId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = probe.select(col(key).as("__k"), col(ts).as("__t"),
      col(probeId).as("__pid"), lit(true).as("__isProbe"))
    val q = quote.select(col(key).as("__k"), col(ts).as("__t"),
      col(quoteId).as("__qid"))
      .withColumn("__pid", lit(null).cast(p.schema("__pid").dataType))
      .withColumn("__isProbe", lit(false))
      .select("__k", "__t", "__pid", "__isProbe", "__qid")
    val u = p.withColumn("__qid", lit(null).cast(q.schema("__qid").dataType))
      .select("__k", "__t", "__pid", "__isProbe", "__qid")
      .unionByName(q)
    val base = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val wb = base.rangeBetween(Window.unboundedPreceding, -1)
    val wf = base.rangeBetween(1, Window.unboundedFollowing)
    val qStruct = when(!col("__isProbe"), struct(col("__t").as("t"), col("__qid").as("id")))
    val withBoth = u
      .withColumn("__bwd", max(qStruct).over(wb))
      .withColumn("__fwd", min(qStruct).over(wf))
      .filter(col("__isProbe"))
    val pickBwd = col("__fwd").isNull || (col("__bwd").isNotNull &&
      (col("__t") - col("__bwd.t")) <= (col("__fwd.t") - col("__t")))
    val chosen = when(pickBwd, col("__bwd")).otherwise(col("__fwd"))
    withBoth.select(
      col("__k").as(key), col("__pid").as(probeId), col("__t").as(ts),
      chosen.getField("id").as(quoteId),
      chosen.getField("t").as(s"${quoteId}_ts"),
      abs(chosen.getField("t") - col("__t")).as("gap"))
  }

  /** Guarded cross join (the degenerate all-pairs theta join). Broadcast the
    * smaller side explicitly so the plan is BroadcastNestedLoopJoin, not a
    * shuffled CartesianProduct. */
  def crossJoinSmall(big: DataFrame, small: DataFrame): DataFrame =
    big.crossJoin(broadcast(small))

  /** Skew-proof equi join (B3j): salt the skewed (left) side's key into
    * `factor` sub-keys and replicate the right side across all salts — the
    * manual fallback when AQE's runtime skew splitting isn't available
    * (e.g. a static plan, or skew on the build side of a non-AQE stage).
    * Results are identical to a plain equi join; cost is |R|·factor
    * replication traded for an even shuffle of the hot keys.
    */
  def saltedEquiJoin(
      skewed: DataFrame, other: DataFrame,
      leftKey: String, rightKey: String, factor: Int): DataFrame = {
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)))
    val r = other.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  /** Reference-shape fallback: 1-Bucket-Theta for an *arbitrary* theta
    * predicate with no exploitable structure.  Partitions the |S|×|T| join
    * matrix into an rS×rT grid: S rows are assigned a deterministic matrix
    * row (hash, not random — results must be reproducible) and replicated
    * across the rT grid columns; T rows symmetrically.  Every pair meets in
    * exactly one grid cell; cells are hash-partitioned across the cluster.
    * Cost is |S|·rT + |T|·rS replicated rows — use only when no bucketed
    * rewrite applies.
    */
  /** Edit-distance ≤ 2 self-join via the position-keyed FastSS 2-deletion
    * index: rows (ka, kb, d) with ka < kb and d = levenshtein ≤ 2.  One
    * map-only index build ([[graft.fns.TextKernels.deletionVariantPos2]]),
    * one shuffle-hash bucket join whose residual
    * [[graft.fns.TextKernels.fastssCompat]] prunes the ed > 2 variant
    * collisions with integer compares (sound + complete over true variant
    * equality — see the kernel's proof sketch), a banded levenshtein as
    * the hash-collision guard, and one distinct over true memberships.
    * See `q_join_fuzzy2`'s scaladoc for the measured stage costs. */
  def fuzzySelfJoin2(df: DataFrame, keyCol: String, strCol: String): DataFrame = {
    val spark = df.sparkSession
    val idx = df
      .select(col(keyCol), col(strCol),
        explode(graft.fns.TextKernelCols.deletionVariantPos2(spark, col(strCol)))
          .as("x")) // map-only: the kernel groups positions per variant
      .select(col(keyCol), col(strCol), col("x.v").as("v"), col("x.pc").as("pc"))
    val a = idx.select(col(keyCol).as("ka"), col(strCol).as("na"),
      col("v"), col("pc").as("pca"))
    val b = idx.select(col(keyCol).as("kb"), col(strCol).as("nb"),
      col("v"), col("pc").as("pcb"))
    // shuffle_hash, explicitly: Catalyst can't see through the explode's
    // ~L²/2 fan-out, estimates the index at the BASE table's size, and
    // broadcasts millions of index rows (measured 20x slower).  A hash
    // join beats sort-merge here because variant buckets are
    // duplicate-heavy — SMJ would buffer each equal-key group anyway.
    a.join(b.hint("shuffle_hash"), Seq("v"))
      .filter(col("ka") < col("kb") &&
        graft.fns.TextKernelCols.fastssCompat(spark, col("pca"), col("pcb")))
      .select(col("ka"), col("kb"),
        levenshtein(col("na"), col("nb"), 2).cast("long").as("d"))
      .filter(col("d") >= 0) // hash-collision guard; banded O(L·k) form
      .distinct() // one row per true pair (d is determined by the pair)
  }

  def oneBucketThetaJoin(
      s: DataFrame, t: DataFrame, sKey: String, tKey: String,
      rS: Int, rT: Int, theta: Column): DataFrame = {
    val sRep = s
      .withColumn("__row", pmod(xxhash64(col(sKey)), lit(rS.toLong)))
      .withColumn("__col", explode(array((0 until rT).map(lit(_)): _*)))
    val tRep = t
      .withColumn("__col", pmod(xxhash64(col(tKey)), lit(rT.toLong)).cast("int"))
      .withColumn("__row", explode(array((0 until rS).map(i => lit(i.toLong)): _*)))
    sRep.join(tRep, sRep("__row") === tRep("__row") && sRep("__col") === tRep("__col"))
      .filter(theta)
      .drop("__row").drop("__col")
  }
}
