package graft.io

import graft.GraftQuery
import graft.fns.Exact.{exactSum, exactSumSql}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Catalog-table surface (B1 bucketing row, judged): the judged queries
  * elsewhere read parquet paths; this one goes through the CATALOG —
  * `saveAsTable` with `bucketBy`/`sortBy`, then `spark.table(name)` — the
  * way a production deployment actually shares co-located fact tables.
  *
  * The two fact tables are bucketed 8-ways on the join key, so the join
  * AND the aggregation grouped on that key plan with ZERO Exchange (the
  * bucketed scan's HashPartitioning satisfies both the join's and the
  * aggregate's distribution — CatalogQuerySpec pins the plan with
  * broadcast disabled).  At 100 TB this is the difference between
  * re-shuffling two fact tables per query and never shuffling them at
  * all.  Tables are EXTERNAL (explicit /tmp path) so the judged run does
  * not depend on a writable warehouse dir, created once per sfDir and
  * reused by table name thereafter — the catalog is the cache.
  */
object CatalogTables {

  private val created = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[graft] def ensureBucketed(spark: SparkSession, sfDir: String): (String, String) =
    created.computeIfAbsent(sfDir, _ => {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val li = s"graft_li_bucketed_$h"
      val ord = s"graft_ord_bucketed_$h"
      if (!spark.catalog.tableExists(li)) {
        Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"/tmp/graft_catalog/li_$h")
          .saveAsTable(li)
      }
      if (!spark.catalog.tableExists(ord)) {
        Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"/tmp/graft_catalog/ord_$h")
          .saveAsTable(ord)
      }
      (li, ord)
    })

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
