package graft.io

import graft.GraftQuery
import graft.fns.Exact.{exactSum, exactSumSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-table surface (B1 bucketing row, judged): the judged queries
  * elsewhere read parquet paths; this one goes through the CATALOG —
  * bucketed data published once, then `spark.table(name)` — the way a
  * production deployment actually shares co-located fact tables.
  *
  * The two fact tables are bucketed 8-ways on the join key, so the join
  * AND the aggregation grouped on that key plan with ZERO Exchange (the
  * bucketed scan's HashPartitioning satisfies both the join's and the
  * aggregate's distribution — CatalogQuerySpec pins the plan with
  * broadcast disabled).  At 100 TB this is the difference between
  * re-shuffling two fact tables per query and never shuffling them at
  * all.
  *
  * Publication follows [[Staged]]'s discipline, because the /tmp data
  * dirs are SHARED across JVMs while each JVM has its own in-memory
  * catalog: the bucketed files are written to a `.tmp-<uuid>` sibling
  * via a throwaway external table (dropping an external table keeps its
  * files), renamed into place through the POSIX-strict
  * `FileContext.rename` (exactly one concurrent writer lands; losers
  * delete their temp and read the winner), and only then registered in
  * THIS session's catalog with a bucketed `CREATE TABLE … LOCATION`
  * DDL.  The path key folds in the SOURCE fingerprint, so regenerated
  * testdata republishes instead of serving stale buckets.
  */
object CatalogTables {

  private val created = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def publishBucketed(spark: SparkSession, df: DataFrame, key: String,
      bucketCol: String, h: String): String = {
    val name = s"graft_${key}_bucketed_$h"
    if (!spark.catalog.tableExists(name)) {
      val conf = spark.sparkContext.hadoopConfiguration
      val dir = new org.apache.hadoop.fs.Path(s"/tmp/graft_catalog/${key}_$h")
      val fs = dir.getFileSystem(conf)
      val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      if (!fs.exists(marker)) {
        val uuid = java.util.UUID.randomUUID().toString
        val tmp = new org.apache.hadoop.fs.Path(s"/tmp/graft_catalog/.tmp-$uuid")
        val tmpTable = s"${name}_build_${uuid.replace("-", "_")}"
        df.write.mode("overwrite")
          .bucketBy(8, bucketCol).sortBy(bucketCol)
          .option("path", tmp.toString)
          .saveAsTable(tmpTable)
        spark.sql(s"DROP TABLE `$tmpTable`") // external: files remain
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
        def publish(): Boolean =
          try { fc.rename(tmp, dir); true }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case e: java.io.IOException => fs.delete(tmp, true); throw e
          }
        if (!publish()) {
          // dst exists: a concurrent winner's artifact or a torn leftover
          if (!fs.exists(marker)) {
            fs.delete(dir, true)
            if (!publish()) fs.delete(tmp, true)
          } else fs.delete(tmp, true)
        }
      }
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS `$name` (${df.schema.toDDL})
           |USING parquet
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO 8 BUCKETS
           |LOCATION '$dir'""".stripMargin)
    }
    name
  }

  /** Publish BOTH bucketed fact tables for one (sfDir, fingerprint) —
    * shared by the first-build path and the per-call catalog re-verify so
    * the select lists and bucket keys live in exactly one place. */
  private def publishBoth(spark: SparkSession, sfDir: String, fp: String): (String, String) = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|$fp".getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val li = publishBucketed(spark,
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "li", "l_orderkey", h)
    val ord = publishBucketed(spark,
      Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
      "ord", "o_orderkey", h)
    (li, ord)
  }

  private[graft] def ensureBucketed(spark: SparkSession, sfDir: String): (String, String) = {
    val fp = Staged.fingerprint(spark, s"$sfDir/lineitem.parquet") + "|" +
      Staged.fingerprint(spark, s"$sfDir/orders.parquet")
    val names = created.computeIfAbsent(s"$sfDir|$fp", _ => publishBoth(spark, sfDir, fp))
    // The map is JVM-wide but REGISTRATION lives in a SparkSession's
    // catalog: a later session in the same JVM (new context, same sfDir
    // fingerprint) hits the cache and would get names its own catalog has
    // never seen — spark.table() then fails on a "cached" success.  The
    // data dirs are durable, so re-verify per call and re-issue the
    // idempotent DDL against THIS session when a name is absent.
    if (!spark.catalog.tableExists(names._1) || !spark.catalog.tableExists(names._2))
      publishBoth(spark, sfDir, fp)
    names
  }

  /** Per-order line stats off the co-bucketed catalog tables: join on the
    * bucket key, aggregate grouped on it — the whole plan is
    * exchange-free.  (o_orderpriority rides the group by as a
    * functionally-dependent column; bucketing on a SUBSET of the group
    * keys still satisfies the aggregate's clustering.) */
  val catalogBucketed: GraftQuery = GraftQuery("q_catalog_bucketed",
    s"""SELECT o_orderkey, o_orderpriority, CAST(count(*) AS BIGINT) AS n_li,
       |  ${exactSumSql("l_quantity", 2)} AS sum_qty
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderkey, o_orderpriority""".stripMargin) { (spark, sfDir) =>
    val (li, ord) = ensureBucketed(spark, sfDir)
    spark.table(ord)
      .join(spark.table(li), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_li"), exactSum(col("l_quantity"), 2).as("sum_qty"))
  }

  val all: Seq[GraftQuery] = Seq(catalogBucketed)
}
