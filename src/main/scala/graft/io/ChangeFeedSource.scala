package graft.io

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit, timestamp_millis}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType, TimestampType}

/** `spark.readStream` over a [[Versioned]] table: the registered
  * streaming wrapper around [[ChangeFeed.changes]], so any Structured
  * Streaming pipeline (watermarks, windows, joins, foreachBatch sinks)
  * can subscribe to a table's commit log with the standard API —
  *
  * {{{
  * spark.readStream
  *   .format("graft.io.ChangeFeedSourceProvider")
  *   .option("path", tableRoot).option("key", "doc_id")
  *   .load()            // table columns + _change_type
  * }}}
  *
  * Offsets ARE table versions: `getOffset` reads the commit head (one
  * metadata listing — no data I/O), and each micro-batch is the
  * manifest-pruned NET feed `changes(lastCommitted, head)`, so a day's
  * catch-up reads the day's dirs.  Exactly-once is the engine's
  * checkpoint contract: offsets persist in the checkpoint, a replayed
  * batch re-derives the identical feed from the immutable log, and a
  * foreachBatch sink that lands state with batchId-fenced commits is
  * idempotent across replays.  (A consumer that must survive LOSING its
  * checkpoint mid-stream should use the fence-native pull protocol —
  * [[ChangeFeed.nextBatch]]/[[ChangeFeed.consume]] — whose progress
  * rides the consumer's own commit log instead.)
  *
  * Options:
  *  - `startVersion` (default 0 = table birth) bootstraps a consumer
  *    born at a snapshot, exactly like [[ChangeFeed.nextBatch]]'s
  *    `bootstrapV`.
  *  - `maxVersionsPerTrigger` caps each micro-batch's COMMIT span so a
  *    long backlog drains as bounded batches.
  *  - `maxRowsPerTrigger` caps each micro-batch's ROWS: offsets become
  *    chunk-encoded (`version * ChunkBase + chunksApplied` — the
  *    [[ChangeFeed.nextBatchCapped]] encoding) and each trigger
  *    delivers ONE deterministic dir-subset chunk of the next commit,
  *    decided from manifest row-count metadata at zero extra I/O; a
  *    key whose pre/post images straddle chunks arrives as
  *    delete + insert (state-equivalent for fold/merge sinks).
  *    Mutually exclusive with `maxVersionsPerTrigger`; pick ONE pacing
  *    mode per checkpoint — the offset encodings differ.
  *  - `includeCommitVersions = true` appends the CDC provenance
  *    columns `_commit_version` / `_commit_timestamp` (TIMESTAMP-typed,
  *    the upstream change-data-feed convention)
  *    ([[ChangeFeed.changesByCommit]]); batches then emit PER-COMMIT
  *    changes (intra-batch history preserved) instead of the net jump.
  *
  * Pacing watermarks persist in the source's metadata dir (restart-
  * safe; a stale watermark can only widen a batch — the getBatch guard
  * delivers an empty batch rather than a reversed diff), and the
  * row-capped mode pins its chunk-plan fingerprint beside them so a
  * `maxRowsPerTrigger` change while a version drains fails loudly
  * instead of remapping committed chunk indexes.
  *
  * SCHEMA CONTRACT: the schema is fixed at stream start (the standard
  * Structured Streaming requirement) — from the table head, or from a
  * user-supplied `.schema(...)` (which also lets a stream start on a
  * not-yet-written table; its first commit must then match).  An
  * upstream ALTER while the stream runs fails LOUDLY at the next batch
  * (named columns, remediation in the message — see `pin`); restart the
  * stream (the same checkpoint is fine — offsets are table versions) to
  * subscribe under the evolved schema.  Source retention must cover the
  * consumer's lag — a vacuumed-away offset fails loudly, never
  * silently. */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft change-feed source needs option 'path' = the versioned table root"))

  private def withVersionsOf(parameters: Map[String, String]): Boolean =
    parameters.get("includeCommitVersions").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.schemaOf(sqlContext, rootOf(parameters),
      withVersionsOf(parameters), schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    // composite natural keys ride the same option, comma-separated:
    // .option("key", "hi,lo") — the commitMergeKeys symmetry
    val key = parameters.getOrElse("key", throw new IllegalArgumentException(
      "graft change-feed source needs option 'key' = the CDC key column " +
        "(comma-separate a composite key)"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(key.nonEmpty && key.distinct == key,
      s"bad CDC key option '${parameters("key")}'")
    val startV = parameters.get("startVersion").map(_.toInt).getOrElse(0)
    val maxV = parameters.get("maxVersionsPerTrigger").map(_.toInt)
      .getOrElse(Int.MaxValue)
    require(maxV >= 1, s"maxVersionsPerTrigger must be positive, got $maxV")
    val maxRows = parameters.get("maxRowsPerTrigger").map(_.toLong)
      .getOrElse(Long.MaxValue)
    require(maxRows >= 1, s"maxRowsPerTrigger must be positive, got $maxRows")
    require(maxV == Int.MaxValue || maxRows == Long.MaxValue,
      "pick ONE pacing mode: maxVersionsPerTrigger or maxRowsPerTrigger " +
        "(their offset encodings differ)")
    new ChangeFeedSource(sqlContext, rootOf(parameters), key, startV, maxV,
      maxRows, withVersionsOf(parameters), metadataPath, schema)
  }
}

private[io] object ChangeFeedSource {
  /** The stream schema: the table's head schema (or the user-supplied
    * one — `.schema(...)` lets a stream start on a NOT-YET-WRITTEN
    * table, whose first commit must then match it) + `_change_type`,
    * plus the provenance columns when requested.  `_commit_timestamp`
    * is TIMESTAMP-typed — the upstream change-data-feed convention. */
  def schemaOf(sqlContext: SQLContext, root: String,
      withVersions: Boolean = false,
      userSchema: Option[StructType] = None): StructType = {
    val spark = sqlContext.sparkSession
    val base0 = userSchema.getOrElse {
      val head = Versioned.currentVersion(spark, root)
      require(head > 0, s"no committed version at $root — start the " +
        "stream after the first commit, or supply the table schema with " +
        ".schema(...) to subscribe to a not-yet-written table")
      Versioned.readAt(spark, root, head).schema
    }
    val base = base0.add(StructField("_change_type", StringType, nullable = false))
    if (!withVersions) base
    else base
      .add(StructField("_commit_version", IntegerType, nullable = false))
      .add(StructField("_commit_timestamp", TimestampType, nullable = false))
  }
}

private[io] class ChangeFeedSource(sqlContext: SQLContext, root: String,
    key: Seq[String], startV: Int, maxVersionsPerTrigger: Int = Int.MaxValue,
    maxRowsPerTrigger: Long = Long.MaxValue, withVersions: Boolean = false,
    metadataPath: String = "",
    userSchema: Option[StructType] = None) extends Source {
  private val spark = sqlContext.sparkSession
  private val rowCapped = maxRowsPerTrigger != Long.MaxValue
  override val schema: StructType =
    ChangeFeedSource.schemaOf(sqlContext, root, withVersions, userSchema)

  import ChangeFeed.ChunkBase

  // position 0 of each pacing mode's offset line
  private def origin: Long =
    if (rowCapped) startV.toLong * ChunkBase else startV.toLong

  // pacing needs the last OFFERED end to cap the next offer, and it
  // must survive a restart (on a restart-with-committed-batch the
  // engine may call getOffset before any getBatch): persist the
  // watermark in the engine-assigned metadataPath, best-effort — a
  // stale/torn read only widens one batch, never reverses one (the
  // getBatch guard below floors at the committed start)
  private def capFile: Option[org.apache.hadoop.fs.Path] =
    if (metadataPath.isEmpty ||
        (maxVersionsPerTrigger == Int.MaxValue && !rowCapped)) None
    else Some(new org.apache.hadoop.fs.Path(metadataPath, "graft-cap"))
  private def readCap(): Long = capFile.map { p =>
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) origin // fresh stream: nothing persisted yet
    else {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // an unparseable watermark must be LOUD: silently falling back
      // would rewind the chunk cursor below the committed offset and
      // redeliver already-applied chunks (the write below is atomic, so
      // this indicates outside interference, not a torn write)
      try txt.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"corrupt pacing watermark at $p ('${txt.take(40)}'); the " +
            "watermark and the checkpoint live and die together — start " +
            "the stream over with a FRESH checkpoint (and fenced sink " +
            "commits make the replay exactly-once)")
      }
    }
  }.getOrElse(origin)
  private def persistCap(v: Long): Unit = capFile.foreach { p =>
    // tmp + atomic overwrite-rename: a crash mid-write must never leave
    // a PARTIAL number (a truncated watermark parses small and rewinds
    // the cursor — silent double-delivery).  Failures propagate and fail
    // the batch: a SWALLOWED persist failure is what would let a later
    // restart read a watermark below the engine's committed offset and
    // offer a regressed offset — the one sequence that can redeliver
    // applied chunks past the sink's fences.
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".graft-cap-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
  @volatile private var lastEnd: Long = math.max(origin, readCap())

  // every Offset serializes through json (LongOffset's json is the
  // value; a checkpointed restart hands back a SerializedOffset whose
  // json is what we wrote) — parsing the json is the universal decode
  private def rawOf(o: Offset): Long = o.json.trim.toLong

  override def getOffset: Option[Offset] = {
    val head = Versioned.currentVersion(spark, root)
    if (rowCapped) {
      // one chunk per trigger: advance the chunk cursor of version av+1
      val av = (lastEnd / ChunkBase).toInt
      val k = (lastEnd % ChunkBase).toInt
      if (av >= head) return None
      val v = av + 1
      val chunks = ChangeFeed.versionChunks(spark, root, av, v, maxRowsPerTrigger)
      val next = if (chunks.isEmpty || k + 1 >= chunks.size) v.toLong * ChunkBase
                 else lastEnd + 1
      if (next <= lastEnd) None else Some(LongOffset(next))
    } else {
      // `maxVersionsPerTrigger` caps each micro-batch's commit span so
      // a long backlog drains as bounded batches, not one giant jump
      val capped =
        if (maxVersionsPerTrigger == Int.MaxValue) head.toLong
        else math.min(head.toLong, lastEnd + maxVersionsPerTrigger)
      if (capped <= startV || capped <= lastEnd) None
      else Some(LongOffset(capped))
    }
  }

  private def emptyBatch: DataFrame =
    org.apache.spark.sql.GraftSqlBridge.asStreaming(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  /** Project a batch's feed to the stream's FIXED schema — and pin the
    * mid-stream schema-evolution contract: an upstream ALTER while the
    * stream runs fails LOUDLY here (named columns, remediation in the
    * message), never as a silent mis-mapping or a cryptic analysis
    * error inside the select.  A RESTARTED stream (fresh `load()`)
    * resolves the evolved schema and carries on. */
  private def pin(df: DataFrame): DataFrame = {
    val metaCols = Set("_change_type", "_commit_version", "_commit_timestamp")
    val extra = df.columns.filterNot(schema.fieldNames.contains)
    val missing = schema.fieldNames.filterNot(metaCols).filterNot(df.columns.contains)
    if (extra.nonEmpty || missing.nonEmpty) throw new IllegalStateException(
      s"upstream table $root evolved its schema while this stream ran " +
        s"(stream schema lacks ${extra.mkString("[", ", ", "]")}, feed " +
        s"lacks ${missing.mkString("[", ", ", "]")}); a Structured " +
        "Streaming source's schema is fixed at stream start — RESTART " +
        "the stream (same checkpoint is fine) to subscribe under the " +
        "evolved schema")
    org.apache.spark.sql.GraftSqlBridge.asStreaming(
      df.select(schema.fieldNames.toSeq.map(col): _*))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val sRaw = start.map(rawOf).getOrElse(origin)
    val eRaw = rawOf(end)
    // fast-forward past BOTH ends: `start` is the engine's committed
    // offset — the authoritative floor no later offer may regress below
    lastEnd = math.max(lastEnd, math.max(sRaw, eRaw))
    persistCap(lastEnd)
    // guard: a stale pacing watermark could make getOffset offer an end
    // at-or-below the committed start — deliver an EMPTY batch, never a
    // reversed diff
    if (eRaw <= sRaw) return emptyBatch
    if (rowCapped) {
      val sav = (sRaw / ChunkBase).toInt; val sk = (sRaw % ChunkBase).toInt
      val eav = (eRaw / ChunkBase).toInt; val ek = (eRaw % ChunkBase).toInt
      val v = sav + 1
      // the pacing invariant keeps every logged span inside ONE version
      // step: (v-1, k) → (v-1, k+1) or (v-1, k) → (v, 0)
      val chunks = ChangeFeed.versionChunks(spark, root, sav, v, maxRowsPerTrigger)
      val hi = if (eav == sav) ek
               else if (eav == v && ek == 0) chunks.size
               else -1
      if (hi >= 0) {
        // mid-drain pacing guard: a maxRowsPerTrigger change while a
        // version drains would remap the committed chunk index to a
        // different dir subset — verify against the plan fingerprint
        // pinned next to the pacing watermark (chunkPlanCheck)
        if (metadataPath.nonEmpty)
          ChangeFeed.chunkPlanCheck(spark,
            new org.apache.hadoop.fs.Path(metadataPath, "graft-chunkplan"),
            v, sk, maxRowsPerTrigger, chunks.size)
        val span = chunks.slice(sk, hi)
        if (span.isEmpty) return emptyBatch
        val feed = span.map(c => ChangeFeed.chunkFeed(spark, root, sav, v, key, c))
          .reduce(_ unionByName _)
        val stamped =
          if (!withVersions) feed
          else feed.withColumn("_commit_version", lit(v))
            .withColumn("_commit_timestamp",
              timestamp_millis(lit(Versioned.tsOf(spark, root, v))))
        pin(stamped)
      } else {
        // a span our own getOffset could never have offered: the
        // checkpoint was written by a DIFFERENT pacing mode (the
        // encodings share the long namespace) — refuse loudly rather
        // than risk double-delivering already-applied chunks
        throw new IllegalStateException(
          s"offset span $sRaw -> $eRaw is not a row-capped chunk step; " +
            "this checkpoint was not written with maxRowsPerTrigger — " +
            "use a fresh checkpoint when changing the pacing mode")
      }
    } else pin(feedFor(sRaw.toInt, eRaw.toInt))
  }

  private def feedFor(va: Int, vb: Int): DataFrame =
    if (withVersions) ChangeFeed.changesByCommitKeys(spark, root, va, vb, key)
    else ChangeFeed.changesKeys(spark, root, va, vb, key)

  override def stop(): Unit = ()
}
