package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoized materialization of shared intermediates.
  *
  * Several judged queries derive the same expensive table (the exploded
  * hashed-shingle index, the quantized embedding base).  Within one
  * SparkSession each such table is computed and materialized ONCE and
  * reused by every consumer — on a cluster, recomputing a 100 TB
  * derivation per consumer would be the dominant cost.
  *
  * Two materialization modes:
  *
  *  - default: `localCheckpoint` — executor block storage, dies with the
  *    context (the local-mode analog of `persist()`ing a shared dataset);
  *  - `spark.graft.staging.dir` set: the build is written ONCE as a
  *    parquet artifact under `<dir>/<md5(tag)>` and every consumer —
  *    including sibling sessions and, because the artifact is durable,
  *    later application runs — reads the artifact instead of rebuilding.
  *    This is the real-cluster staging-table pattern: the path can be
  *    HDFS/S3 (resolved through the Hadoop FileSystem of the path).
  *
  * Publication is atomic at the directory level: the build is written to
  * a unique `.tmp-<uuid>` sibling and renamed into place through
  * `FileContext` — the POSIX-strict API whose no-OVERWRITE rename THROWS
  * if the destination exists.  (`FileSystem.rename` would instead "help"
  * by moving the temp INSIDE an existing target directory — a leaked
  * nested copy, not arbitration.)  Concurrent writers each build their
  * own temp dir; exactly one rename lands, the loser deletes its temp and
  * reads the winner's artifact.  A reader therefore never observes a
  * half-written target, and a crashed writer leaves only an orphaned temp
  * dir — the target is either absent (rebuilt) or complete.  The
  * committer's `_SUCCESS` marker additionally gates reuse: a torn,
  * marker-less target (e.g. manual tampering) is deleted and rebuilt,
  * never trusted.  NOTE: on object stores whose rename is copy-based (raw
  * S3 without a committer), the window shrinks but is not zero — front a
  * real atomic-commit layer there.
  *
  * Keyed by (session, staging-root, tag): a memoized DataFrame is only
  * ever handed back to the exact SparkSession that built it — sibling
  * sessions of the same context (`spark.newSession`) have their own
  * session state (temp functions, confs) and get their own entry — and
  * re-pointing `spark.graft.staging.dir` (or unsetting it) mid-session
  * gets a fresh entry instead of a stale plan over a possibly-deleted
  * path.  Eviction removes only entries whose owning context has actually
  * stopped (their checkpointed plans died with it), so concurrently live
  * contexts in one JVM never thrash each other's cache.
  */
object Staged {
  /** Upper bound on cached entries: per-session keying means a long-lived
    * context spawning many sibling sessions would otherwise accumulate one
    * checkpointed copy per (session, tag) forever.  FIFO eviction past the
    * cap bounds executor block memory; an evicted entry is merely rebuilt
    * on next use. */
  private val MAX_ENTRIES = 64

  private val cache =
    scala.collection.mutable.LinkedHashMap[(SparkSession, Option[String], String), DataFrame]()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Cheap content fingerprint of a source directory/file for use INSIDE a
    * staging tag: total byte length + max mtime over the listing.  A durable
    * artifact keyed only by a name string would silently serve stale data
    * after the source at the same path is regenerated; folding this in makes
    * regeneration produce a different tag → a rebuild, not a wrong answer.
    * One driver-side listing (O(files) metadata, no data read) — the same
    * cost Spark itself pays to plan the scan. */
  def fingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val it = fs.listFiles(p, true)
    var bytes = 0L; var mtime = 0L; var n = 0L
    while (it.hasNext) {
      val st = it.next()
      bytes += st.getLen; mtime = math.max(mtime, st.getModificationTime); n += 1
    }
    s"$n:$bytes:$mtime"
  }

  /** `writeOptions` flow to the parquet writer in staging-dir mode only
    * (e.g. `parquet.block.size` for artifacts whose consumers rely on
    * row-group-stat pruning and want finer granularity than the 128 MB
    * default).  They are not part of the cache key: one tag = one
    * artifact layout, chosen by the artifact's builder. */
  def apply(spark: SparkSession, tag: String,
      writeOptions: Map[String, String] = Map.empty)(build: => DataFrame): DataFrame =
    synchronized {
      // entries of stopped contexts are dead weight — drop them before
      // growing the cache; live sibling contexts are left alone
      cache.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
      val root = spark.conf.getOption("spark.graft.staging.dir")
      val key = (spark, root, tag)
      while (cache.size >= MAX_ENTRIES && !cache.contains(key))
        cache.remove(cache.head._1)
      // build under the lock: a racy getOrElseUpdate would materialize the
      // expensive checkpoint twice and leak one copy on the executors
      cache.getOrElseUpdate(key,
        root match {
          case Some(r) =>
            val dir = new org.apache.hadoop.fs.Path(s"$r/${md5hex(tag)}")
            val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
            if (!fs.exists(marker)) {
              // Build FIRST, arbitrate at rename time.  Deleting a torn
              // `dir` up front would race a concurrent writer whose
              // complete artifact renames into place during our build —
              // this process would then delete the winner's data out from
              // under its readers.  With rename-first arbitration nothing
              // carrying a _SUCCESS marker is ever deleted.
              val tmp = new org.apache.hadoop.fs.Path(
                dir.getParent, s".tmp-${java.util.UUID.randomUUID()}")
              build.write.options(writeOptions).mode("overwrite").parquet(tmp.toString)
              // POSIX-strict publish via FileContext: FileSystem.rename on
              // HDFS/LocalFileSystem "succeeds" against an existing target
              // directory by moving the source INSIDE it (leaking a nested
              // copy that never carries a dir-level _SUCCESS), so it can't
              // arbitrate concurrent writers.  FileContext.rename without
              // OVERWRITE throws FileAlreadyExistsException if dst exists:
              // exactly one writer lands.  Any OTHER IOException is a real
              // failure (permissions, quota, transient FS error) — clean
              // the temp and rethrow instead of masking it as a lost race
              // and letting the later read fail with a misleading error.
              val fc = org.apache.hadoop.fs.FileContext.getFileContext(
                dir.toUri, spark.sparkContext.hadoopConfiguration)
              def publish(): Boolean =
                try { fc.rename(tmp, dir); true }
                catch {
                  case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
                  case e: java.io.IOException => fs.delete(tmp, true); throw e
                }
              if (!publish()) {
                // dst exists: a winner's complete artifact, or a torn
                // marker-less leftover.  Re-check the marker NOW — the
                // probe above is stale by one whole build — so a winner
                // that landed mid-build is read, never deleted.
                if (!fs.exists(marker)) {
                  fs.delete(dir, true)
                  // a second writer can land inside this delete→rename
                  // gap; losing that race is fine (single bounded retry)
                  if (!publish()) fs.delete(tmp, true)
                } else fs.delete(tmp, true)
              }
            }
            spark.read.parquet(dir.toString)
          case None => build.localCheckpoint()
        })
    }
}
