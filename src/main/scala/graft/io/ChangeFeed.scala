package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed change data feed over the [[Versioned]] commit log: the CDC
  * relation `va → vb` with `_change_type ∈ {insert, delete,
  * update_preimage, update_postimage}` — what a downstream consumer
  * (an index, an MV, a replica, a feature store) subscribes to instead
  * of re-diffing snapshots itself.
  *
  * Derivation: [[Versioned.diff]] yields the row-level multiset delta,
  * MANIFEST-PRUNED — dirs shared by both manifests cancel without being
  * read, so a day-2 append/merge/delete chain feeds the CDC from the
  * touched dirs only, never a table scan.  The delta's two sides are
  * then aligned on `key` with ONE full-outer join: a key present only
  * in the new side is an insert, only in the old side a delete, and in
  * both an update emitting its pre- and post-image (rows whose payload
  * did not change cancelled inside the diff and emit nothing).  Keys
  * must be unique per snapshot and non-null — the same contract a keyed
  * [[Versioned.commitMerge]] table already lives under; a key-changing
  * rewrite surfaces as delete + insert, the standard CDC convention. */
object ChangeFeed {

  /** The change rows `va → vb`, schema = table columns + `_change_type`. */
  def changes(spark: SparkSession, root: String, va: Int, vb: Int,
      key: String): DataFrame = {
    val d = Versioned.diff(spark, root, va, vb)
    val payload = d.columns.filterNot(c => c == "op" || c == key)
    def side(op: String) = d.filter(col("op") === op)
      .select(col(key), struct(payload.map(col): _*).as(s"_$op"))
    val j = side("removed").join(side("added"), Seq(key), "full_outer")
    // each joined key explodes into its 1-or-2 change rows
    val tagged = j.select(col(key), explode(
      when(col("_removed").isNull, array(struct(col("_added").as("img"), lit("insert").as("t"))))
        .when(col("_added").isNull, array(struct(col("_removed").as("img"), lit("delete").as("t"))))
        .otherwise(array(
          struct(col("_removed").as("img"), lit("update_preimage").as("t")),
          struct(col("_added").as("img"), lit("update_postimage").as("t"))))).as("ch"))
    payload.foldLeft(tagged)((df, c) => df.withColumn(c, col(s"ch.img.$c")))
      .withColumn("_change_type", col("ch.t"))
      .drop("ch")
  }

  /** Apply a change feed to a keyed REPLICA table: one CoW commit that
    * evicts every delete/update key and lands the insert + post-image
    * rows as the new dir (pre-images are ignored — they exist for
    * consumers that need the old value, not for replay).  Applying
    * `changes(va, vb)` to a replica holding snapshot `va` lands it
    * bit-exactly on snapshot `vb` — CDC replication, the consume side
    * of the feed; on a key-clustered replica the eviction is zone-map
    * confined exactly like a MERGE.  At 100 TB the feed is day-2
    * sized, so replication cost is O(changed dirs), never O(table). */
  def applyChanges(spark: SparkSession, root: String, ch: DataFrame,
      key: String): Int =
    applyImpl(spark, root, ch, key, batchId = None).get

  private def applyImpl(spark: SparkSession, root: String, ch: DataFrame,
      key: String, batchId: Option[Long]): Option[Int] = {
    // STAGE the feed once: the merge body evaluates its inputs in four
    // separate actions (key-range agg, discovery semi-join, eviction
    // anti-join, upsert write) — an unstaged feed plan (a diff chain, a
    // stream batch) would recompute for each
    val tmp = s"$root/tmp/${java.util.UUID.randomUUID()}"
    ch.write.parquet(tmp)
    try {
      val staged = spark.read.parquet(tmp)
      val ups = staged.filter(col("_change_type").isin("insert", "update_postimage"))
        .drop("_change_type")
      val keys = staged.filter(col("_change_type") =!= "update_preimage")
        .select(col(key)).distinct()
      Versioned.mergeImpl(spark, root, ups, keys, key, batchId)
    } finally {
      val p = new org.apache.hadoop.fs.Path(tmp)
      Versioned.fs(spark, p).delete(p, true)
    }
  }

  /** CDC FOLLOW: catch a replica up to its source's head in ONE fenced
    * merge.  Progress is durable and replay-safe without extra state:
    * the replica's applied-source-version rides the batchId fence (the
    * same manifest field streaming ingest uses — a followed replica
    * must not double as a streaming-ingest sink, the namespaces would
    * collide).  `clonedAt` bootstraps a fresh clone that carries no
    * fence yet.  The jump feed `changes(applied, head)` is manifest-
    * pruned, so a day's catch-up reads the day's dirs; source retention
    * must cover the replica's lag (a vacuumed-away `applied` manifest
    * fails loudly, never silently).  Returns the new replica version,
    * or None when already current — safe to call on every poll. */
  def follow(spark: SparkSession, srcRoot: String, repRoot: String,
      key: String, clonedAt: Int): Option[Int] = {
    val head = Versioned.currentVersion(spark, srcRoot)
    val applied = Versioned.lastBatchId(spark, repRoot).getOrElse(clonedAt.toLong)
    if (applied >= head) None
    else applyImpl(spark, repRoot,
      changes(spark, srcRoot, applied.toInt, head, key), key,
      batchId = Some(head.toLong))
  }

  /** STREAMING CHANGE-FEED SOURCE (pull form): the next pending change
    * batch for consumer `dstRoot` — the fenced jump `changes(applied,
    * upTo)` where `applied` is the consumer's own batchId fence
    * (`bootstrapV` before its first fenced commit) and `upTo` caps at
    * `applied + maxVersions` for per-commit micro-batches.  Returns the
    * batch plus the FENCE the consumer must commit its downstream state
    * with (any `commitBatch` / `commitMergeBatch(MOR)` /
    * `commitBatchIndexed` call): state visibility and feed progress
    * then share one manifest rename, so a crash anywhere between apply
    * and commit simply redelivers the batch and the fence voids the
    * replay — exactly-once consumption with NO checkpoint directory to
    * wipe or lose.  This generalizes [[follow]] (whose downstream is a
    * replica) to ANY incremental consumer: an aggregate, an index, a
    * feature store.  The jump is manifest-pruned, so a day's catch-up
    * reads the day's dirs; source retention must cover the consumer's
    * lag (a vacuumed-away `applied` manifest fails loudly). */
  def nextBatch(spark: SparkSession, srcRoot: String, dstRoot: String,
      key: String, bootstrapV: Int = 0,
      maxVersions: Int = Int.MaxValue): Option[(DataFrame, Long)] = {
    val head = Versioned.currentVersion(spark, srcRoot)
    val applied = Versioned.lastBatchId(spark, dstRoot).getOrElse(bootstrapV.toLong)
    if (applied >= head) None
    else {
      val upTo = math.min(head.toLong, applied + math.max(1, maxVersions)).toInt
      Some((changes(spark, srcRoot, applied.toInt, upTo, key), upTo.toLong))
    }
  }

  /** Drain the change feed through `apply` until the consumer is
    * current — the foreachBatch loop over the commit log.  `apply(batch,
    * fence)` MUST land downstream state with a batchId = fence commit
    * (see [[nextBatch]]); an apply that fails to advance the fence
    * throws rather than spinning.  Returns the number of batches
    * delivered (0 = already current — safe to call on every poll). */
  def consume(spark: SparkSession, srcRoot: String, dstRoot: String,
      key: String, bootstrapV: Int = 0, maxVersions: Int = Int.MaxValue)
      (apply: (DataFrame, Long) => Unit): Int = {
    var n = 0
    var batch = nextBatch(spark, srcRoot, dstRoot, key, bootstrapV, maxVersions)
    while (batch.isDefined) {
      val (feed, fence) = batch.get
      apply(feed, fence)
      if (!Versioned.lastBatchId(spark, dstRoot).exists(_ >= fence))
        throw new IllegalStateException(
          s"change-feed consumer at $dstRoot did not commit batch fence $fence; " +
            "apply must land state with a batchId-fenced commit")
      n += 1
      batch = nextBatch(spark, srcRoot, dstRoot, key, bootstrapV, maxVersions)
    }
    n
  }

  /** Judged query: CDC replication round-trip.  The source table runs
    * the realistic write chain (clustered base → keyed MERGE → CoW
    * delete); the REPLICA is a zero-copy clone of v1; `changes(1, 3)`
    * applied to the replica must land it bit-exactly on the source
    * head.  Output = the replica's head; the oracle recomputes the
    * source head by expression — the whole produce-and-consume CDC
    * loop is hash-checked. */
  val tableReplica: graft.GraftQuery = graft.GraftQuery("q_table_replica",
    """SELECT doc_id, lang,
      |       CASE WHEN doc_id % 10 < 8 AND doc_id BETWEEN 260 AND 490
      |            THEN n_chars + 1000 ELSE n_chars END AS n_chars
      |FROM documents WHERE doc_id % 9 <> 0""".stripMargin) { (spark, sfDir) =>
    val run = graft.streaming.StreamSink.newRunDir()
    val src = s"$run/src"; val rep = s"$run/replica"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val base = docs.filter(col("doc_id") % 10 < 8)
    Versioned.commitAppendClustered(spark, src, base, "doc_id", buckets = 8)
    Versioned.cloneAt(spark, src, rep, 1)
    val updates = base.filter(col("doc_id").between(260, 490))
      .withColumn("n_chars", col("n_chars") + 1000)
      .unionByName(docs.filter(col("doc_id") % 10 >= 8))
    Versioned.commitMerge(spark, src, updates, "doc_id")
    val pred = col("doc_id") % 9 === 0
    Versioned.commitUpdate(spark, src, pred, d => d.filter(!pred))
    val v = applyChanges(spark, rep, changes(spark, src, 1, 3, "doc_id"), "doc_id")
    Versioned.readAt(spark, rep, v)
  }

  /** Judged query: STREAMING replication.  A file-source stream ingests
    * the day-2 slice into the source table through the batchId-fenced
    * `commitBatch`; after every micro-batch the replica (a zero-copy
    * clone of v1) is caught up via [[follow]] — ingest and replication
    * both exactly-once, the replica's progress durable in its own
    * commit log.  Output = the replica's head, which must equal the
    * full corpus whatever the micro-batch planning did. */
  val streamReplica: graft.GraftQuery = graft.GraftQuery("q_stream_replica",
    """SELECT doc_id, lang, n_chars FROM documents""".stripMargin) { (spark, sfDir) =>
    val run = graft.streaming.StreamSink.newRunDir()
    val srcFiles = s"$run/files"; val src = s"$run/src"
    val rep = s"$run/replica"; val ckpt = s"$run/ckpt"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Versioned.commitAppendClustered(spark, src,
      docs.filter(col("doc_id") % 10 < 8), "doc_id", buckets = 8)
    Versioned.cloneAt(spark, src, rep, 1)
    docs.filter(col("doc_id") % 10 >= 8).repartition(3).write.parquet(srcFiles)
    val q = spark.readStream.schema(spark.read.parquet(srcFiles).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcFiles)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        Versioned.commitBatch(spark, src, id, b)
        follow(spark, src, rep, "doc_id", clonedAt = 1); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    follow(spark, src, rep, "doc_id", clonedAt = 1) // idempotent final poll
    Versioned.readAt(spark, rep, Versioned.currentVersion(spark, rep))
  }

  /** Judged query: the CDC relation across a realistic day-2 write
    * chain.  v1 = the clustered base slice; v2 = keyed MERGE (the
    * [260,490] window's n_chars bumped + the day-2 slice inserted);
    * v3 = copy-on-write DELETE of every 9th doc.  `changes(1, 3)` must
    * emit exactly the inserts, deletes, and update pre/post images the
    * oracle derives by expression over the raw corpus. */
  val tableCdf: graft.GraftQuery = graft.GraftQuery("q_table_cdf",
    """WITH base AS (SELECT doc_id, lang, n_chars FROM documents)
      |SELECT doc_id, lang, n_chars, 'insert' AS _change_type
      |FROM base WHERE doc_id % 10 >= 8 AND doc_id % 9 <> 0
      |UNION ALL
      |SELECT doc_id, lang, n_chars, 'delete' AS _change_type
      |FROM base WHERE doc_id % 10 < 8 AND doc_id % 9 = 0
      |UNION ALL
      |SELECT doc_id, lang, n_chars, 'update_preimage' AS _change_type
      |FROM base WHERE doc_id % 10 < 8 AND doc_id % 9 <> 0
      |  AND doc_id BETWEEN 260 AND 490
      |UNION ALL
      |SELECT doc_id, lang, n_chars + 1000 AS n_chars, 'update_postimage' AS _change_type
      |FROM base WHERE doc_id % 10 < 8 AND doc_id % 9 <> 0
      |  AND doc_id BETWEEN 260 AND 490""".stripMargin) { (spark, sfDir) =>
    val root = graft.streaming.StreamSink.newRunDir()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val base = docs.filter(col("doc_id") % 10 < 8)
    Versioned.commitAppendClustered(spark, root, base, "doc_id", buckets = 8)
    val updates = base.filter(col("doc_id").between(260, 490))
      .withColumn("n_chars", col("n_chars") + 1000)
      .unionByName(docs.filter(col("doc_id") % 10 >= 8))
    Versioned.commitMerge(spark, root, updates, "doc_id")
    val pred = col("doc_id") % 9 === 0
    Versioned.commitUpdate(spark, root, pred, d => d.filter(!pred))
    changes(spark, root, 1, 3, "doc_id")
  }

  /** Judged query: an incremental AGGREGATE maintained from the change
    * feed — the [[nextBatch]]/[[consume]] source consumed by something
    * that is NOT a replica.  The source runs the realistic chain
    * (clustered base → keyed MERGE → CoW delete); the consumer drains
    * per-commit batches (maxVersions = 1, so THREE fenced applies
    * exercise the protocol) folding ±deltas into a per-lang (count,
    * sum) table via fenced merges.  A second drain must deliver zero
    * batches (the replay shield).  Output = the aggregate head, which
    * must equal the oracle's RECOMPUTE over the final snapshot — the
    * incremental fold and the batch recompute agree to the row. */
  val streamCdfConsume: graft.GraftQuery = graft.GraftQuery("q_stream_cdf_consume",
    """WITH f AS (
      |  SELECT doc_id, lang,
      |         CASE WHEN doc_id % 10 < 8 AND doc_id BETWEEN 260 AND 490
      |              THEN n_chars + 1000 ELSE n_chars END AS n_chars
      |  FROM documents WHERE doc_id % 9 <> 0)
      |SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM f GROUP BY lang""".stripMargin) { (spark, sfDir) =>
    val run = graft.streaming.StreamSink.newRunDir()
    val src = s"$run/src"; val agg = s"$run/agg"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val base = docs.filter(col("doc_id") % 10 < 8)
    Versioned.commitAppendClustered(spark, src, base, "doc_id", buckets = 8)
    val updates = base.filter(col("doc_id").between(260, 490))
      .withColumn("n_chars", col("n_chars") + 1000)
      .unionByName(docs.filter(col("doc_id") % 10 >= 8))
    Versioned.commitMerge(spark, src, updates, "doc_id")
    val pred = col("doc_id") % 9 === 0
    Versioned.commitUpdate(spark, src, pred, d => d.filter(!pred))
    def applyBatch(feed: DataFrame, fence: Long): Unit = {
      val add = col("_change_type").isin("insert", "update_postimage")
      val d = feed.groupBy(col("lang")).agg(
        sum(when(add, 1L).otherwise(-1L)).as("d_cnt"),
        sum(when(add, col("n_chars").cast("long"))
          .otherwise(-col("n_chars").cast("long"))).as("d_chars"))
      val headA = Versioned.currentVersion(spark, agg)
      if (headA == 0)
        Versioned.commitBatch(spark, agg, fence, d.select(col("lang"),
          col("d_cnt").as("cnt"), col("d_chars").as("sum_chars")))
      else {
        val cur = Versioned.readAt(spark, agg, headA)
        val ups = d.join(cur, Seq("lang"), "left")
          .select(col("lang"),
            (coalesce(col("cnt"), lit(0L)) + col("d_cnt")).as("cnt"),
            (coalesce(col("sum_chars"), lit(0L)) + col("d_chars")).as("sum_chars"))
        Versioned.commitMergeBatch(spark, agg, fence, ups, "lang")
      }
      ()
    }
    val n = consume(spark, src, agg, "doc_id", maxVersions = 1)(applyBatch)
    require(n == 3, s"expected 3 per-commit batches, drained $n")
    require(consume(spark, src, agg, "doc_id", maxVersions = 1)(applyBatch) == 0,
      "a drained feed must deliver nothing on the next poll")
    Versioned.readAt(spark, agg, Versioned.currentVersion(spark, agg))
  }

  val all: Seq[graft.GraftQuery] =
    Seq(tableCdf, tableReplica, streamReplica, streamCdfConsume)
}
