package graft.io

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** `writeStream` INTO a [[Versioned]] table: the registered
  * transactional sink, so a pipeline lands exactly-once in a versioned
  * table with the standard API instead of foreachBatch boilerplate —
  *
  * {{{
  * df.writeStream
  *   .format("graft.io.GraftSinkProvider")
  *   .option("path", tableRoot)          // .option("key", "k") for merges
  *   .option("checkpointLocation", ckpt)
  *   .start()
  * }}}
  *
  * Every micro-batch lands through the batchId-FENCED commit family, so
  * the sink is idempotent across replays (crash between sink write and
  * checkpoint advance, wiped checkpoints re-running old batch ids): the
  * fence piggybacks on the manifest rename, visibility and progress are
  * ONE atomic event, and a replayed batch is skipped instead of
  * re-applied.
  *
  * The commit shape follows the stream's OUTPUT MODE (overridable with
  * `.option("mode", ...)`):
  *
  *  - Append → `"append"` → [[Versioned.commitBatch]]: each batch is a
  *    new immutable dir (ingest pipelines);
  *  - Update → `"merge"` → [[Versioned.commitMergeBatchKeys]] on the
  *    required `key` option (comma-separate a composite natural key:
  *    `.option("key", "hi,lo")`): changed rows upsert (streaming
  *    aggregates in update mode, CDC upserts); `"merge-mor"` lands the
  *    same semantics as merge-on-read sidecars
  *    ([[Versioned.commitMergeBatchKeysMOR]]) — O(batch) writes however
  *    wide the touched dirs.  `deleteOn` (a SQL boolean expression over
  *    the batch's columns, e.g. `_change_type = 'delete'`) makes
  *    matching rows EVICT their key instead of upserting — TRUE deletes
  *    through the declarative pipeline, no tombstone workarounds — and
  *    `dropCols` names predicate-only columns that must not land;
  *    eviction and upsert share ONE fenced commit
  *    ([[Versioned.mergeEvictBatch]]);
  *  - Complete → `"snapshot"` → [[Versioned.commitSnapshotBatch]]: the
  *    batch REPLACES the table (complete-mode aggregates), history
  *    preserved.
  *
  * Composes with the registered SOURCE into a table-to-table streaming
  * pipeline: `readStream(graft) → transform → writeStream(graft)`, both
  * ends fenced.
  *
  * The same format name also serves the registered BATCH READ —
  * `spark.read.format("graft-table").load(root)` resolves a
  * [[GraftTableRelation]] with pushed-filter manifest pruning and
  * `version` / `asOfTimestamp` time travel (see [[GraftTable]]) — so
  * ONE format string covers the table in and out. */
class GraftSinkProvider extends StreamSinkProvider with RelationProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-table"

  /** `spark.read.format("graft-table")`: the batch relation over a
    * versioned table snapshot (head by default; `version` /
    * `asOfTimestamp` options time-travel). */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table batch read needs a path: load(root) or option 'path'"))
    new GraftTableRelation(sqlContext, root,
      GraftTable.versionOf(sqlContext.sparkSession, root, parameters))
  }

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft sink: partitioning is the table's own layout concern " +
        "(clustered commits / zone maps), not partitionBy")
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft sink needs option 'path' = the versioned table root"))
    val inferred = outputMode match {
      case m if m == OutputMode.Append()   => "append"
      case m if m == OutputMode.Update()   => "merge"
      case m if m == OutputMode.Complete() => "snapshot"
      case other => throw new IllegalArgumentException(s"unsupported output mode $other")
    }
    val mode = parameters.getOrElse("mode", inferred)
    require(Set("append", "merge", "merge-mor", "snapshot")(mode),
      s"graft sink mode '$mode' (append | merge | merge-mor | snapshot)")
    // composite natural keys ride the same option, comma-separated:
    // .option("key", "hi,lo") — the commitMergeKeys symmetry
    val key = parameters.get("key")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    key.foreach(ks => require(ks.nonEmpty && ks.distinct == ks,
      s"bad merge key option '${parameters("key")}'"))
    require(!mode.startsWith("merge") || key.isDefined,
      s"graft sink mode '$mode' needs option 'key' = the merge key " +
        "column (comma-separate a composite key)")
    // deleteOn = a SQL boolean expression over the batch's columns:
    // matching rows EVICT their key (true deletes — the follower
    // physically drops them) instead of re-landing as tombstones;
    // dropCols = columns consumed by the predicate (e.g. _change_type)
    // that must not land in the table
    val deleteOn = parameters.get("deleteOn")
    require(deleteOn.isEmpty || mode.startsWith("merge"),
      "graft sink: deleteOn applies to the merge modes")
    val dropCols = parameters.get("dropCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    require(dropCols.isEmpty || mode.startsWith("merge"),
      "graft sink: dropCols applies to the merge modes")
    key.foreach(ks => require(dropCols.forall(!ks.contains(_)),
      "graft sink: dropCols cannot contain a merge key column"))
    // append mode may declare a zone-map layout: each micro-batch then
    // lands range-clustered (commitBatchClustered) and the streaming
    // table keeps tight per-dir [min,max] from ingest on
    val statsCol = parameters.get("statsCol")
    require(statsCol.isEmpty || mode == "append",
      "graft sink: statsCol clustering applies to append mode only")
    val buckets = parameters.get("buckets").map(_.toInt).getOrElse(16)
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    new GraftSink(root, mode, key, statsCol, buckets, deleteOn, dropCols)
  }
}

object GraftSinkProvider {

  /** Judged query: the full TABLE-TO-TABLE streaming pipeline through
    * the registered endpoints — `readStream(graft source)` → projection
    * of post-images → `writeStream(graft sink, merge + deleteOn)` —
    * both ends fenced, zero foreachBatch code.  The source table runs
    * the realistic chain (clustered base → keyed MERGE → CoW delete)
    * across TWO checkpointed pipeline runs (the second consumes only
    * the delta); deletes propagate as TRUE deletes through the sink's
    * `deleteOn = "_change_type = 'delete'"` (the key evicts, the
    * follower physically drops the row — no tombstone column, no
    * read-side filter: the follower IS a replica, asserted in-query
    * against the source head), and a third run after a WIPED checkpoint
    * must not move the follower (in-query assertion).  Output = the
    * follower table read directly; oracle = the source head recomputed
    * by expression. */
  val streamTablePipeline: graft.GraftQuery = graft.GraftQuery("q_stream_table_pipeline",
    """SELECT doc_id, lang,
      |       CASE WHEN doc_id % 10 < 8 AND doc_id BETWEEN 260 AND 490
      |            THEN n_chars + 1000 ELSE n_chars END AS n_chars
      |FROM documents WHERE doc_id % 9 <> 0""".stripMargin) { (spark, sfDir) =>
    import org.apache.spark.sql.functions.col
    val run = graft.streaming.StreamSink.newRunDir()
    val src = s"$run/src"; val dst = s"$run/dst"; val ckpt = s"$run/ckpt"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val base = docs.filter(col("doc_id") % 10 < 8)
    def follow(): Unit = {
      val q = spark.readStream
        .format("graft.io.ChangeFeedSourceProvider")
        .option("path", src).option("key", "doc_id")
        .load()
        .filter(col("_change_type") =!= "update_preimage")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("_change_type"))
        .writeStream.format("graft.io.GraftSinkProvider")
        .option("path", dst).option("key", "doc_id").option("mode", "merge")
        .option("deleteOn", "_change_type = 'delete'")
        .option("dropCols", "_change_type")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }
    Versioned.commitAppendClustered(spark, src, base, "doc_id", buckets = 8)
    follow() // run 1: the base flows through
    val updates = base.filter(col("doc_id").between(260, 490))
      .withColumn("n_chars", col("n_chars") + 1000)
      .unionByName(docs.filter(col("doc_id") % 10 >= 8))
    Versioned.commitMerge(spark, src, updates, "doc_id")
    val pred = col("doc_id") % 9 === 0
    Versioned.commitUpdate(spark, src, pred, d => d.filter(!pred))
    follow() // run 2: exactly the delta flows through
    val settled = Versioned.currentVersion(spark, dst)
    val cp = new org.apache.hadoop.fs.Path(ckpt)
    Versioned.fs(spark, cp).delete(cp, true)
    follow() // run 3: wiped checkpoint — every replayed fence is applied
    require(Versioned.currentVersion(spark, dst) == settled,
      "a wiped-checkpoint replay must not move the follower")
    // TRUE REPLICA: the follower equals the source head bit-exactly —
    // deleted keys are physically absent, no tombstone filtering
    val got = Versioned.readAt(spark, dst, settled)
    val want = Versioned.readAt(spark, src, Versioned.currentVersion(spark, src))
    require(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "deleteOn must make the follower a bit-exact replica of the source head")
    got
  }

  val all: Seq[graft.GraftQuery] = Seq(streamTablePipeline)
}

private[io] class GraftSink(root: String, mode: String,
    key: Option[Seq[String]], statsCol: Option[String] = None,
    buckets: Int = 16, deleteOn: Option[String] = None,
    dropCols: Seq[String] = Seq.empty) extends Sink {
  import org.apache.spark.sql.functions.{col, expr, not}

  private def dropLanded(df: DataFrame): DataFrame =
    dropCols.foldLeft(df)(_ drop _)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // the engine hands a STREAMING-tagged frame; re-tag it as the batch
    // relation over the same rows so the fenced commit surface applies
    val batch = org.apache.spark.sql.GraftSqlBridge.asBatch(data)
    mode match {
      case "append" if statsCol.isDefined =>
        Versioned.commitBatchClustered(spark, root, batchId, batch,
          statsCol.get, buckets)
      case "append"    => Versioned.commitBatch(spark, root, batchId, batch)
      case "merge" | "merge-mor" =>
        val keys = key.get
        val mor = mode == "merge-mor"
        if (Versioned.currentVersion(spark, root) == 0) {
          // bootstrap: the first batch of a merge stream lands on an
          // empty table as a plain fenced append (nothing to merge
          // into yet) — the consumer-pattern idiom, under the fence;
          // single action, so no staging needed
          val ups = deleteOn.map(p => batch.filter(not(expr(p))))
            .getOrElse(batch)
          Versioned.commitBatch(spark, root, batchId, dropLanded(ups))
        } else if (!Versioned.replaySkipped(spark, root, batchId)) {
          // STAGE the micro-batch once (the ChangeFeed.applyImpl
          // discipline): the merge body evaluates its input in several
          // actions, and an UNSTAGED streaming batch — a CDC diff chain
          // from the registered source — would recompute its whole
          // upstream plan for each (measured: ~34 such jobs in the
          // judged table-to-table pipeline).  Skipped entirely when the
          // fence already landed (the replay pre-check above).
          val tmp = s"$root/tmp/${java.util.UUID.randomUUID()}"
          batch.write.parquet(tmp)
          Versioned.cacheDirSchema(tmp, batch.schema)
          try {
            val staged = Versioned.readParquetDirs(spark, Seq(tmp))
            deleteOn match {
              case None =>
                if (!mor)
                  Versioned.commitMergeBatchKeys(spark, root, batchId,
                    dropLanded(staged), keys)
                else
                  Versioned.commitMergeBatchKeysMOR(spark, root, batchId,
                    dropLanded(staged), keys)
              case Some(p) =>
                // deleteOn splits the batch: matching rows EVICT their
                // key (true deletes — the follower physically drops
                // them), the rest upsert; both effects land under ONE
                // fenced commit
                val pred = expr(p)
                val ups = dropLanded(staged.filter(not(pred)))
                val evict = staged.select(keys.map(col): _*).distinct()
                Versioned.mergeEvictBatch(spark, root, batchId, ups, evict,
                  keys, mor)
            }
          } finally {
            val p = new org.apache.hadoop.fs.Path(tmp)
            Versioned.fs(spark, p).delete(p, true)
          }
        }
      case "snapshot"  => Versioned.commitSnapshotBatch(spark, root, batchId, batch)
    }
    ()
  }
  override def toString: String = s"GraftSink[$mode -> $root]"
}
