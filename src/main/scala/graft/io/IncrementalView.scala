package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over the [[Versioned]]
  * commit log — the aggregate counterpart of the staged-index day-2
  * story: a corpus-wide GROUP BY that a 100 TB deployment keeps fresh
  * must NOT be recomputed from the full table when a daily append (or a
  * copy-on-write upsert touching one dir) lands.  The classic
  * self-maintainable algebra is the SUM group: every measure is a SUM
  * of a row-level expression (count = sum(1)), so any snapshot change
  * folds in as an op-signed delta — `added` rows contribute +expr,
  * `removed` rows −expr — and [[Versioned.diff]]'s manifest pruning
  * makes that delta O(changed dirs).  MIN/MAX are NOT in the algebra
  * under deletes (a removed extremum forces a per-group recompute);
  * callers wanting them re-derive from the refreshed groups they
  * touched.
  *
  * The judged `q_mv_incremental` drives the full lifecycle — two append
  * commits, the initial MV build (the ONE full scan), a day-2 append
  * refresh, a [[Versioned.commitUpdate]] that migrates rows between
  * groups, a second refresh — and its oracle is the direct GROUP BY
  * over the final relation: the chained incremental path must land
  * bit-exactly on the full recompute. */
object IncrementalView {

  /** Fold a snapshot diff into a SUM-algebra MV.
    *
    * `mv` holds `keys ++ measures.map(_._1)`; each measure is the SUM
    * of its row expression over the group, as longs.  The FIRST measure
    * must be the group's row count (`lit(1L)`): a group whose count
    * reaches zero has vanished from the snapshot and is dropped, exactly
    * as a full recompute would never produce it.  New groups enter via
    * the full-outer join with zero-coalesced old sums.
    *
    * Shuffle shape at scale: the delta aggregate is map-side-combined
    * over ONLY the diff (changed dirs), and the merge join is
    * MV-cardinality work — corpus-size independent on both sides. */
  def refresh(mv: DataFrame, diffDf: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column)]): DataFrame = {
    require(measures.nonEmpty, "need at least the count measure")
    val sign = when(col("op") === "added", lit(1L)).otherwise(lit(-1L))
    val aggs = measures.map { case (n, e) => sum(sign * e).as(s"_d_$n") }
    val delta = diffDf.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // the merge join must be NULL-SAFE on the group keys: GROUP BY puts
    // all null-keyed rows in one group, but an equality full_outer join
    // would never match that group to its own delta — it would duplicate
    // instead of merging and its counts could never cancel
    val cond = keys.map(k => col(s"m.$k") <=> col(s"d.$k")).reduce(_ && _)
    val joined = mv.alias("m").join(delta.alias("d"), cond, "full_outer")
    val keyCols = keys.map(k => coalesce(col(s"m.$k"), col(s"d.$k")).as(k))
    val measureCols = measures.map { case (n, _) =>
      (coalesce(col(s"m.$n"), lit(0L)) + coalesce(col(s"d._d_$n"), lit(0L))).as(n)
    }
    joined.select(keyCols ++ measureCols: _*)
      .filter(col(measures.head._1) > 0)
  }

  /** Fenced MV catch-up: refresh the MV to its source table's HEAD in
    * one commit, the applied-source-version riding the MV's own batchId
    * fence (the [[graft.io.ChangeFeed.follow]] discipline).  This is
    * the crash-safe shape: a crash between the source commit and the
    * refresh loses nothing — the next poll's `diff(applied, head)`
    * jumps the gap, and a replayed poll is fenced out.  Source
    * retention must cover the MV's lag.  The MV must have been BUILT
    * with [[Versioned.commitSnapshotBatch]] (batchId = the source
    * version the build scanned).  Returns the new MV version, or None
    * when already current. */
  def refreshTo(spark: org.apache.spark.sql.SparkSession, tableRoot: String,
      mvRoot: String, keys: Seq[String], measures: Seq[(String, Column)]): Option[Int] = {
    val head = Versioned.currentVersion(spark, tableRoot)
    // the fence and the MV content must come from the SAME MV version:
    // a concurrent refresh landing between two separate reads would
    // pair a stale fence with fresher content (double-count) or the
    // reverse (lost delta)
    val vMv = Versioned.currentVersion(spark, mvRoot)
    val applied = Versioned.lastBatchIdAt(spark, mvRoot, vMv).getOrElse(sys.error(
      s"$mvRoot carries no applied-version fence; build it with commitSnapshotBatch")).toInt
    if (applied >= head) return None
    val mv = Versioned.readAt(spark, mvRoot, vMv)
    Versioned.commitSnapshotBatch(spark, mvRoot, head,
      refresh(mv, Versioned.diff(spark, tableRoot, applied, head), keys, measures))
  }

  /** Judged query: per-(lang, source) doc counts + character sums kept
    * fresh across the table's life WITHOUT rescanning it.  v1/v2 = the
    * base slice in two append commits; the MV's initial build at v2 is
    * the one full read; v3 appends the day-2 batch (refresh #1 reads
    * ONLY the appended dir); v4 is a copy-on-write update relabelling
    * every 7th day-2 doc's lang to 'xx' (rewrites ONLY the day-2 dir;
    * refresh #2 reads the old and new day-2 dirs — rows the update left
    * alone cancel in the multiset diff, so the delta is just the
    * relabelled rows migrating between lang groups).  The oracle
    * recomputes the final relation's GROUP BY directly. */
  val mvIncremental: graft.GraftQuery = graft.GraftQuery("q_mv_incremental",
    """SELECT CASE WHEN doc_id % 10 >= 8 AND doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang,
      |       source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY 1, 2""".stripMargin) { (spark, sfDir) =>
    val root = graft.streaming.StreamSink.newRunDir()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val base = docs.filter(col("doc_id") % 10 < 8)
    Versioned.commitAppend(spark, root, base.filter(col("doc_id") % 2 === 0)) // v1
    Versioned.commitAppend(spark, root, base.filter(col("doc_id") % 2 === 1)) // v2
    val keys = Seq("lang", "source")
    val measures = Seq("cnt" -> lit(1L), "sum_chars" -> col("n_chars"))
    val mv2 = Versioned.readAt(spark, root, 2).groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
    Versioned.commitAppend(spark, root, docs.filter(col("doc_id") % 10 >= 8)) // v3
    val mv3 = refresh(mv2, Versioned.diff(spark, root, 2, 3), keys, measures)
    val touch = col("doc_id") % 10 >= 8 && col("doc_id") % 7 === 0
    Versioned.commitUpdate(spark, root, touch,
      d => d.withColumn("lang", when(touch, lit("xx")).otherwise(col("lang")))) // v4
    refresh(mv3, Versioned.diff(spark, root, 3, 4), keys, measures)
  }

  /** Judged query: the STREAMING materialized view — the round-14
    * headline features composed under one oracle.  The base slice is
    * committed and the MV built from it (the one full scan); the MV is
    * itself a [[Versioned]] table, so each refresh is a bounded-lineage
    * commit, not a growing plan.  A file-source stream then ingests the
    * day-2 slice in several micro-batches (maxFilesPerTrigger=1)
    * through [[Versioned.commitBatch]]'s exactly-once fence, and each
    * ADMITTED batch folds into the MV via [[refresh]] over the
    * manifest-pruned diff — O(batch) work per batch, never a rescan.
    * A fenced replay (crash/duplicate batch) commits nothing and
    * therefore refreshes nothing — the MV can never double-count (the
    * wiped-checkpoint spec drives that path explicitly).  Output = the
    * MV head; oracle = the direct GROUP BY over the full corpus. */
  val streamMvIncremental: graft.GraftQuery = graft.GraftQuery("q_stream_mv_incremental",
    """SELECT lang, source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2""".stripMargin) { (spark, sfDir) =>
    val run = graft.streaming.StreamSink.newRunDir()
    val src = s"$run/src"; val table = s"$run/table"
    val ckpt = s"$run/ckpt"; val mvRoot = s"$run/mv"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val keys = Seq("lang", "source")
    val measures = Seq("cnt" -> lit(1L), "sum_chars" -> col("n_chars"))
    Versioned.commit(spark, table, docs.filter(col("doc_id") % 10 < 8))
    // the initial build's fence records WHICH table version it scanned
    Versioned.commitSnapshotBatch(spark, mvRoot, 1L,
      Versioned.readAt(spark, table, 1).groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars")))
    docs.filter(col("doc_id") % 10 >= 8).repartition(3).write.parquet(src)
    // the writer just flushed src — schema known, no inference job
    Versioned.cacheDirSchema(src, docs.schema)
    val q = spark.readStream.schema(Versioned.dirSchemaOf(spark, src))
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        Versioned.commitBatch(spark, table, id, b)
        // crash-safe: refreshTo reconciles applied -> head whatever the
        // previous attempt managed — a crash between the table commit
        // and the refresh cannot lose the delta (the fenced replay
        // skips the table commit but the catch-up still jumps the gap)
        refreshTo(spark, table, mvRoot, keys, measures)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    refreshTo(spark, table, mvRoot, keys, measures) // idempotent final poll
    Versioned.readAt(spark, mvRoot, Versioned.currentVersion(spark, mvRoot))
  }

  val all: Seq[graft.GraftQuery] = Seq(mvIncremental, streamMvIncremental)
}
