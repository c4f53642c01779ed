package graft.io

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  * `startVersion` (default 0 = from table birth) bootstraps a consumer
  * born at a snapshot, exactly like [[ChangeFeed.nextBatch]]'s
  * `bootstrapV`; `maxVersionsPerTrigger` caps each micro-batch's commit
  * span so a long backlog drains as bounded batches (the watermark
  * persists in the source's metadata dir, so the cap survives
  * restarts).  The schema is fixed at stream start (the standard
  * Structured Streaming requirement); source retention must cover the
  * consumer's lag — a vacuumed-away offset fails loudly, never
  * silently. */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft change-feed source needs option 'path' = the versioned table root"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.schemaOf(sqlContext, rootOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val key = parameters.getOrElse("key", throw new IllegalArgumentException(
      "graft change-feed source needs option 'key' = the CDC key column"))
    val startV = parameters.get("startVersion").map(_.toInt).getOrElse(0)
    val maxV = parameters.get("maxVersionsPerTrigger").map(_.toInt)
      .getOrElse(Int.MaxValue)
    require(maxV >= 1, s"maxVersionsPerTrigger must be positive, got $maxV")
    new ChangeFeedSource(sqlContext, rootOf(parameters), key, startV, maxV,
      metadataPath)
  }
}

private[io] object ChangeFeedSource {
  def schemaOf(sqlContext: SQLContext, root: String): StructType = {
    val spark = sqlContext.sparkSession
    val head = Versioned.currentVersion(spark, root)
    require(head > 0, s"no committed version at $root")
    Versioned.readAt(spark, root, head).schema
      .add(StructField("_change_type", StringType, nullable = false))
  }
}

private[io] class ChangeFeedSource(sqlContext: SQLContext, root: String,
    key: String, startV: Int, maxVersionsPerTrigger: Int = Int.MaxValue,
    metadataPath: String = "") extends Source {
  private val spark = sqlContext.sparkSession
  override val schema: StructType = ChangeFeedSource.schemaOf(sqlContext, root)

  // rate limiting needs the last OFFERED end to cap the next offer,
  // and it must survive a restart (on a restart-with-committed-batch
  // the engine may call getOffset before any getBatch): persist the
  // watermark in the engine-assigned metadataPath, best-effort — a
  // stale/torn read only widens one batch, never reverses one (the
  // getBatch guard below floors at the committed start)
  private def capFile: Option[org.apache.hadoop.fs.Path] =
    if (metadataPath.isEmpty || maxVersionsPerTrigger == Int.MaxValue) None
    else Some(new org.apache.hadoop.fs.Path(metadataPath, "graft-cap"))
  private def readCap(): Int = capFile.map { p =>
    try {
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!f.exists(p)) startV
      else {
        val in = f.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        txt.trim.toInt
      }
    } catch { case _: Exception => startV }
  }.getOrElse(startV)
  private def persistCap(v: Int): Unit = capFile.foreach { p =>
    try {
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = f.create(p, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    } catch { case _: Exception => () } // best-effort (see above)
  }
  @volatile private var lastEnd: Int = math.max(startV, readCap())

  // every Offset serializes through json (LongOffset's json is the
  // value; a checkpointed restart hands back a SerializedOffset whose
  // json is what we wrote) — parsing the json is the universal decode
  private def versionOf(o: Offset): Int = o.json.trim.toInt

  override def getOffset: Option[Offset] = {
    val head = Versioned.currentVersion(spark, root)
    // `maxVersionsPerTrigger` caps each micro-batch's commit span so a
    // long backlog drains as bounded batches instead of one giant jump
    val capped =
      if (maxVersionsPerTrigger == Int.MaxValue) head
      else math.min(head.toLong, lastEnd.toLong + maxVersionsPerTrigger).toInt
    if (capped <= startV || capped <= lastEnd) None
    else Some(LongOffset(capped.toLong))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val va = start.map(versionOf).getOrElse(startV)
    val vb = versionOf(end)
    lastEnd = math.max(lastEnd, vb)
    persistCap(lastEnd)
    // guard: a stale rate-limit watermark could make getOffset offer an
    // end at-or-below the committed start — deliver an EMPTY batch, not
    // a reversed diff
    if (vb <= va)
      return org.apache.spark.sql.GraftSqlBridge.asStreaming(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    // column order pinned to the declared source schema
    org.apache.spark.sql.GraftSqlBridge.asStreaming(
      ChangeFeed.changes(spark, root, va, vb, key)
        .select(schema.fieldNames.toSeq.map(col): _*))
  }

  override def stop(): Unit = ()
}
