package graft.rel

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the event-sequence analytics (funnel, SCD2) and the DSIR
  * importance selector that the hash oracle alone wouldn't explain. */
class EventSeqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("funnel stages are strictly ordered and stage counts nullness") {
    val rows = Queries.queries("q_events_funnel")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val t1 = r.getLong(1)
      val t2 = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val t3 = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val stage = r.getInt(4)
      t2.foreach(v => assert(v > t1))
      t3.foreach(v => assert(t2.nonEmpty && v > t2.get))
      assert(stage == 1 + t2.size + t3.size)
    }
  }

  test("scd2 intervals tile each user's event stream") {
    val out = Queries.queries("q_scd2_intervals")(spark, TestSpark.sf)
    // every event is in exactly one island
    val totalEvents = spark.read.parquet(s"${TestSpark.sf}/events.parquet").count()
    assert(out.agg(sum("n_events")).head().getLong(0) == totalEvents)
    // per user: valid_to chains to the next valid_from, one open interval,
    // and adjacent islands change value (else they'd be one island)
    val perUser = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      .groupBy(_._1)
    for ((_, rows) <- perUser) {
      val sorted = rows.sortBy(_._3)
      assert(sorted.count(_._4 == Long.MaxValue) == 1)
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray)) {
        assert(a._4 == b._3, "intervals must chain without gaps")
        assert(a._2 != b._2, "adjacent islands must differ in value")
      }
    }
  }

  test("column profile never rescans the table; distinct scans are narrow") {
    // the unpivot union reads the checkpointed 1-row aggregate + literals
    val plan = Queries.queries("q_profile_columns")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"), s"profile unpivot rescans the table:\n$plan")
    // each per-column distinct pass prunes the scan to that one column
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    val aggPlan = li.agg(countDistinct(col("l_returnflag")))
      .queryExecution.executedPlan.toString
    assert(aggPlan.contains("ReadSchema: struct<l_returnflag:string>"), aggPlan)
  }

  test("table checksum is invariant under repartitioning and row order") {
    val base = Queries.queries("q_table_checksum")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // same fingerprint computed from a shuffled, re-partitioned scan
    import graft.fns.Exact
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .repartition(17).sortWithinPartitions("l_extendedprice")
    val alt = li.agg(
      count(lit(1)),
      bit_xor(Exact.md5Long(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
        Exact.scaled(col("l_quantity"), 2), Exact.scaled(col("l_extendedprice"), 2),
        col("l_returnflag"), col("l_linestatus"),
        unix_micros(col("l_shipdate").cast("timestamp")))))).head()
    assert((alt.getLong(0), alt.getLong(1)) == base("lineitem"))
  }

  test("dsir selects English-enriched documents") {
    val top = Queries.queries("q_llm_dsir")(spark, TestSpark.sf)
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val topEn = top.join(docs, "doc_id")
      .agg(avg(when(col("lang") === "en", 1.0).otherwise(0.0))).head().getDouble(0)
    val corpusEn = docs
      .agg(avg(when(col("lang") === "en", 1.0).otherwise(0.0))).head().getDouble(0)
    assert(topEn > corpusEn,
      s"top-weighted docs should be en-enriched: top=$topEn corpus=$corpusEn")
  }
}
