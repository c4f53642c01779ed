package graft.fns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Memory-bounded EXACT interpolated quantiles (quantile_cont semantics)
  * over long-valued columns — fully distributed, including the search
  * state, and size-hybrid PER GROUP: pass 0's exact counts route each
  * group to the right algorithm.  Groups that fit a bounded buffer
  * (<= bufferThreshold values) sort-gather in one aggregate — a
  * 1 M-group corpus resolves in a single pass; only the hot groups above
  * the threshold pay the multi-pass histogram search below.
  *
  * Spark's built-in `percentile` buffers every value of a group in one
  * executor-side map — exact, but O(rows-per-group) memory, which is the
  * operator that dies first when a 100 TB table has a hot group.  For
  * those groups this implementation locates the exact ORDER STATISTICS
  * instead, by histogram refinement over the integer value domain:
  *
  *   - pass 0: per-group count/min/max (one aggregate);
  *   - each refinement pass: join the frontier of unresolved search
  *     windows onto the data (broadcast when the frontier is small,
  *     shuffle-hash otherwise), bucket each window's values into
  *     `buckets` equal-width cells (one scan + one hash aggregate of
  *     <= searches x buckets cells), walk the cumulative counts with a
  *     window function partitioned by search, and shrink each window to
  *     the cell holding its target rank.
  *
  * Passes = ceil(log_buckets(domain span)): with the default 8192 buckets
  * any 26-bit domain (e.g. price cents) resolves in TWO counting passes,
  * and a full 52-bit domain in four.  Executor memory is flat in
  * rows-per-group; the search state (O(groups x quantiles) rows — the same
  * order as the result itself) lives in a checkpointed DataFrame, never on
  * the driver, so group cardinality scales with the cluster: the driver
  * does O(passes) control actions regardless of how many groups exist.
  *
  * NULL group keys form their own group (groupBy / `<=>` / window
  * partitioning all treat NULL as one key).  Groups whose VALUES are all
  * null are omitted (no order statistics exist).  Value domains spanning
  * more than half the Long range fail fast (the equal-width bucket
  * arithmetic computes hi - lo, which would wrap) rather than mis-bucket.
  *
  * Interpolation is `lo*(1-frac) + hi*frac` with `frac = pos - floor(pos)`,
  * `pos = (n-1)*q` — measured bit-identical to DuckDB's `quantile_cont` on
  * 3000/3000 random long inputs, where the algebraically equal
  * `lo + (hi-lo)*frac` and Spark-`Percentile` weighted forms each diverge
  * by 1 ulp on ~8% / ~18% of cases.
  */
object ExactQuantiles {

  private val DefaultBuckets = 8192

  /** Frontiers at or below this many in-flight searches ride the data
    * join as a broadcast (~100k rows of five longs ≈ 4 MB serialized —
    * comfortably inside Spark's default 10 MB auto-broadcast budget, plus
    * per-executor hash-relation overhead); above it the join
    * shuffle-hashes on the group key — the same size-thresholded hybrid
    * as graft.graph. */
  private val BroadcastSearchLimit = 100000L

  /** Groups at or below this many values take the buffered sort-gather
    * path (~8 bytes x threshold peak per group in one aggregation buffer);
    * only groups ABOVE it — the hot groups that kill buffer-all
    * `percentile` — pay the multi-pass histogram search.  At 100 TB the
    * usual shape is millions of small groups plus a few giants: the small
    * ones resolve in ONE aggregate, the giants stay memory-bounded.
    * 1 M longs ≈ 8 MB peak per group buffer — the same order as one
    * shuffle-fetch buffer (spark.reducer.maxSizeInFlight, 48 MB) and far
    * inside executor execution memory, so routing sub-million groups to
    * the one-aggregate path trades bounded memory for 2-4 whole-table
    * counting passes saved; the prior 100 k bound paid those passes for
    * groups whose buffer would have cost under 1 MB.  Both paths compute
    * the same exact order statistics (spec-asserted equal). */
  private val DefaultBufferThreshold = 1000000L

  /** Per-group exact interpolated quantiles.
    *
    * `data` must expose `groupCol` and a LongType `valueCol`; returns one
    * row per group with schema (groupCol, qs.map(_._1): double), quantile
    * columns named by the caller.  Size-hybrid per GROUP (decided from
    * pass 0's exact counts): see [[DefaultBufferThreshold]].
    *
    * `disc = true` switches to DISCRETE quantiles (quantile_disc
    * semantics: the smallest value whose CDF reaches q — the order
    * statistic at 0-based rank max(ceil(q*n)-1, 0), never interpolated);
    * quantile columns are then LongType actual data values. */
  def groupQuantiles(data: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)], buckets: Int = DefaultBuckets,
      bufferThreshold: Long = DefaultBufferThreshold,
      disc: Boolean = false, stageTag: Option[String] = None): DataFrame = {
    require(data.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (scale doubles first — graft.fns.Exact.scaled)")
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 })

    // pass 0: one aggregate for n / min / max per group.  Materialized:
    // both the search seed and the final assembly read it, and the
    // refinement joins below must not be self-joins against `data`'s plan.
    // `stageTag` routes the materialization through io.Staged — pass 0 is
    // a pure function of (table, group key, value expression), so every
    // consumer naming the same tag (e.g. quantile_cont and quantile_disc
    // over the same column, or repeated runs in one session) reuses ONE
    // artifact instead of re-scanning the source.
    def pass0 = data.groupBy(col(groupCol).as("__eq_g"))
      .agg(count(col(valueCol)).as("__eq_n"), min(col(valueCol)).as("__eq_mn"),
        max(col(valueCol)).as("__eq_mx"))
      .where(col("__eq_n") > 0)
    val base0 = stageTag match {
      case Some(tag) => graft.io.Staged(data.sparkSession, s"eq_pass0:$tag")(pass0)
      case None => pass0.localCheckpoint()
    }

    val smallKeys = base0.where(col("__eq_n") <= bufferThreshold).select("__eq_g")
    val small = quantilesBuffered(data, groupCol, valueCol, qs, smallKeys, disc)
    val base = base0.where(col("__eq_n") > bufferThreshold)

    // Search seed: the distinct floor/ceil order-statistic ranks of every
    // requested quantile position, one row per (group, rank).
    val n1 = (col("__eq_n") - 1).cast(DoubleType)
    def discRank(q: Double) =
      greatest(ceil(col("__eq_n").cast(DoubleType) * lit(q)) - 1, lit(0L))
    val ranks = array_distinct(array(qs.flatMap { case (_, q) =>
      if (disc) Seq(discRank(q))
      else Seq(floor(n1 * lit(q)), ceil(n1 * lit(q)))
    }: _*))
    var frontier = base.select(col("__eq_g"), explode(ranks).as("__eq_k"),
        col("__eq_mn").as("__eq_lo"), col("__eq_mx").as("__eq_hi"))
      .withColumn("__eq_rank", col("__eq_k"))
      .localCheckpoint()

    // Equal-width cell size for a window.  hi - lo on a true span above
    // Long.MaxValue wraps NEGATIVE (span < 2^64), so the guard is total.
    val widthC: Column = {
      val span = col("__eq_hi") - col("__eq_lo")
      when(span < 0, raise_error(concat(lit(s"ExactQuantiles: domain of "),
        lit(valueCol), lit(" spans more than half the Long range"))).cast(LongType))
        .otherwise(expr(s"(__eq_hi - __eq_lo) div $buckets") + 1)
    }

    // Refinement: each pass shrinks every open window to the bucket cell
    // holding its target rank.  The cumulative-count walk is a window
    // function partitioned by search — no per-group driver state.
    val resolvedParts = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var going = true
    while (going) {
      resolvedParts += frontier.where(col("__eq_lo") === col("__eq_hi"))
      val open = frontier.where(col("__eq_lo") < col("__eq_hi"))
      val nOpen = open.count()
      if (nOpen == 0L) going = false
      else {
        val stPlain = open.withColumn("__eq_w", widthC)
        val st = if (nOpen <= BroadcastSearchLimit) broadcast(stPlain) else stPlain
        val cells = data
          .join(st, data(groupCol) <=> st("__eq_g"))
          .where(col(valueCol) >= col("__eq_lo") && col(valueCol) <= col("__eq_hi"))
          .groupBy(st("__eq_g"), col("__eq_k"), col("__eq_lo"), col("__eq_hi"),
            col("__eq_w"), col("__eq_rank"),
            expr(s"(`$valueCol` - __eq_lo) div __eq_w").as("__eq_b"))
          .agg(count(lit(1)).as("__eq_c"))
        val win = Window.partitionBy(col("__eq_g"), col("__eq_k")).orderBy(col("__eq_b"))
        val newLo = col("__eq_lo") + col("__eq_b") * col("__eq_w")
        // overflow-safe min(hi, newLo + w - 1): hi - (w-1) >= lo, so the
        // comparison form never wraps where newLo + w - 1 near Long.Max would
        val newHi = when(newLo > col("__eq_hi") - (col("__eq_w") - 1), col("__eq_hi"))
          .otherwise(newLo + col("__eq_w") - 1)
        frontier = cells
          .withColumn("__eq_cum", sum(col("__eq_c")).over(win))
          .withColumn("__eq_pre", col("__eq_cum") - col("__eq_c"))
          .where(col("__eq_rank") >= col("__eq_pre") && col("__eq_rank") < col("__eq_cum"))
          .select(col("__eq_g"), col("__eq_k"), newLo.as("__eq_lo"),
            newHi.as("__eq_hi"), (col("__eq_rank") - col("__eq_pre")).as("__eq_rank"))
          .localCheckpoint()
      }
    }

    // Assembly: per group, a small (<= 2 x |qs| entries) rank -> value map,
    // then the interpolation expression per requested quantile.  Null-safe
    // join so a NULL group key keeps its row.
    val resolved = resolvedParts.reduce(_ union _)
    val kv = resolved.groupBy(col("__eq_g").as("__eq_g2"))
      .agg(map_from_entries(collect_list(struct(col("__eq_k"), col("__eq_lo")))).as("__eq_kv"))
    val outCols = qs.map { case (name, q) =>
      if (disc) element_at(col("__eq_kv"), discRank(q)).as(name)
      else {
        val pos = n1 * lit(q)
        val frac = pos - floor(pos).cast(DoubleType)
        (element_at(col("__eq_kv"), floor(pos)).cast(DoubleType) * (lit(1.0) - frac)
          + element_at(col("__eq_kv"), ceil(pos)).cast(DoubleType) * frac).as(name)
      }
    }
    val big = base.join(kv, col("__eq_g") <=> col("__eq_g2"))
      .select(col("__eq_g").as(groupCol) +: outCols: _*)
    small.unionByName(big)
  }

  /** Buffered path for below-threshold groups: semi-join to their keys,
    * sort-gather each group's values in ONE aggregate, interpolate
    * positionally — the same floor/ceil + lo*(1-frac)+hi*frac arithmetic
    * as the refinement assembly, bit for bit. */
  private def quantilesBuffered(data: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)], keys: DataFrame, disc: Boolean): DataFrame = {
    val rows = data.join(keys, data(groupCol) <=> keys("__eq_g"), "left_semi")
    val vs = rows.groupBy(col(groupCol).as("__eq_g"))
      .agg(sort_array(collect_list(col(valueCol))).as("__eq_vs"))
      .where(size(col("__eq_vs")) > 0)
    val n1 = (size(col("__eq_vs")) - 1).cast(DoubleType)
    val outCols = qs.map { case (name, q) =>
      if (disc) {
        val k1 = greatest(ceil(size(col("__eq_vs")).cast(DoubleType) * lit(q)), lit(1L))
        element_at(col("__eq_vs"), k1.cast(IntegerType)).as(name)
      } else {
        val pos = n1 * lit(q)
        val frac = pos - floor(pos).cast(DoubleType)
        (element_at(col("__eq_vs"), (floor(pos) + 1).cast(IntegerType)).cast(DoubleType)
          * (lit(1.0) - frac)
          + element_at(col("__eq_vs"), (ceil(pos) + 1).cast(IntegerType)).cast(DoubleType)
          * frac).as(name)
      }
    }
    vs.select(col("__eq_g").as(groupCol) +: outCols: _*)
  }

  /** Ungrouped convenience: the quantiles of one long column, returned
    * driver-side (the natural shape for "compute boundaries, broadcast
    * them back onto the scan" consumers like q_agg_histogram_eqdepth).
    * Empty / all-null input yields an empty Seq (there are no order
    * statistics), mirroring the grouped path's omission of such groups. */
  def quantiles(data: DataFrame, valueCol: String, qs: Seq[Double],
      buckets: Int = DefaultBuckets,
      bufferThreshold: Long = DefaultBufferThreshold,
      stageTag: Option[String] = None): Seq[Double] = {
    val named = qs.zipWithIndex.map { case (q, i) => (s"__eq_q$i", q) }
    val out = groupQuantiles(
      data.select(lit(0L).as("__eq_grp"), col(valueCol)),
      "__eq_grp", valueCol, named, buckets, bufferThreshold,
      stageTag = stageTag).collect()
    if (out.isEmpty) Seq.empty
    else qs.indices.map(i => out(0).getDouble(i + 1))
  }
}
