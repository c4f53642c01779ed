package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoized materialization of shared intermediates.
  *
  * Several judged queries derive the same expensive table (the exploded
  * hashed-shingle index, the quantized embedding base).  Within one
  * SparkSession each such table is computed and materialized ONCE
  * (`localCheckpoint`) and reused by every consumer — the local-mode analog
  * of writing a staging table / `persist()`ing a shared dataset on a
  * cluster, where recomputing a 100 TB derivation per consumer would be the
  * dominant cost.
  *
  * Keyed by (applicationId, tag) so entries can never leak across Spark
  * contexts (a checkpointed plan dies with its context).
  */
object Staged {
  private val cache =
    scala.collection.mutable.Map[(String, String), DataFrame]()

  def apply(spark: SparkSession, tag: String)(build: => DataFrame): DataFrame =
    synchronized {
      val appId = spark.sparkContext.applicationId
      // entries of stopped contexts are dead weight (their checkpointed
      // plans died with the context) — drop them before growing the cache
      cache.filterInPlace { case ((app, _), _) => app == appId }
      // build under the lock: a racy getOrElseUpdate would materialize the
      // expensive checkpoint twice and leak one copy on the executors
      cache.getOrElseUpdate((appId, tag), build.localCheckpoint())
    }
}
