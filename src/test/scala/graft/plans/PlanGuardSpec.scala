package graft.plans

import graft.{Queries, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Scale guard over the ENTIRE judged inventory: no query may plan a
  * shuffled CartesianProduct (quadratic shuffle — fatal at 100 TB), and
  * BroadcastNestedLoopJoin may appear only where it is the deliberate
  * design (a tiny broadcast side scanned map-only).
  *
  * This is the regression net for the non-equi rewrites: if a bucketed
  * band/theta/interval join ever degrades back to the naive plan, this
  * suite fails before the oracle or bench ever run.
  */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin:
    * an explicitly broadcast small side (query set, centroid table, dim
    * table) joined under a non-equi condition — map-only, no shuffle of
    * the big side. */
  private val bnljByDesign = Set(
    "q_join_cross",          // crossJoinSmall: broadcast dim, all-pairs by spec
    "q_llm_similarity_topk", // broadcast query set vs corpus scan (by spec)
    "q_llm_ann_ivf",         // k-means: corpus x broadcast(16 centroids)
    "q_llm_ann_lsh",         // broadcast multi-probe query buckets
    "q_llm_ann_pq",          // packed-code scan x broadcast(query LUTs)
    "q_llm_ann_ivfpq",       // k-means centroid probe (corpus x broadcast(16 centroids))
    "q_llm_ann_auto",        // routes to the brute broadcast scan at judged SFs
    "q_llm_dedup_semantic",  // corpus x broadcast(16 seed vectors) cell assignment
    "q_llm_unigram_nll",     // crossJoin(broadcast(1-row corpus total))
    "q_llm_dsir",            // crossJoin(broadcast(1-row bucket totals))
    "q_llm_bigram_nll",      // crossJoin(broadcast(1-row vocabulary size))
    "q_llm_trigram_nll",     // crossJoin(broadcast(1-row (N, V) totals))
    "q_llm_trigram_nll_tuned", // same 1-row (N, V) broadcast, tuned-λ scorer
    "q_llm_curate_incremental", // curate3's 1-row (N, V) + quantile-band broadcasts
    "q_llm_quality_model",   // 1-row quantile-band + weight-vector broadcasts
    "q_llm_quality_auc",     // ≤1001-row score-cell inequality self-join (U statistic)
    "q_llm_quality_calibration", // composes quality_model's 1-row broadcasts
    "q_llm_drift_kl",        // crossJoin(broadcast(1-row corpus/batch totals))
    "q_llm_curate_model",    // composes quality_model's 1-row broadcasts
    "q_llm_embed_curate",    // composes the semantic-seed cell assignment
    "q_llm_curate2",         // composes the semantic-seed + vocab-size broadcasts
    "q_llm_curate3",         // same composition + the 1-row quantile-band broadcast
    "q_llm_curate_attribution", // the same 1-row quantile-band broadcast, attribution projection
    // derived-partsupp TPC-H shapes: part CROSS JOIN (4-row constant
    // relation) — a broadcast of a literal, map-only on the scan side
    "q_sql_tpch_q2", "q_sql_tpch_q9", "q_sql_tpch_q11",
    "q_sql_tpch_q16", "q_sql_tpch_q20",
    "q_agg_histogram_eqdepth", // crossJoin(broadcast(1-row quartile bounds))
    "q_agg_chi2",              // crossJoin(broadcast(1-row grand total))
    "q_table_knn_exact",       // pruned dirs x broadcast(10 query vectors), by spec
    "q_table_knn_incr",        // same exact re-rank after the assigned append
    "q_table_knn_optimize",    // same exact re-rank after the cell fold
    "q_table_knn_filtered")    // same exact re-rank, predicate inside the cell scan

  test("no judged query plans CartesianProduct; BNLJ only by design") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    Queries.all.foreach { q =>
      val plan =
        try q.fn(spark, TestSpark.sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      if (plan.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljByDesign(q.name))
        offenders += s"${q.name}: BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty,
      s"quadratic physical plans detected:\n  ${offenders.mkString("\n  ")}")
  }

  test("correlated subqueries decorrelate to semi/anti hash joins") {
    def plan(name: String): String =
      Queries.queries(name)(spark, TestSpark.sf).queryExecution.executedPlan.toString
    // Q4's EXISTS must become a LeftSemi join on the fact key, Q21's
    // EXISTS/NOT EXISTS pair a LeftSemi + LeftAnti, and Q16's NOT IN a
    // null-aware hash anti join — never a per-row re-execution and never
    // a nested loop over lineitem
    assert(plan("q_sql_tpch_q4").contains("LeftSemi"))
    val p21 = plan("q_sql_tpch_q21")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"))
    assert(plan("q_sql_tpch_q16").contains("LeftAnti"))
  }

  test("partitionBy sink supports partition pruning on read") {
    import org.apache.spark.sql.functions.col
    // materialize the q_sink_partitioned output, then read it back with a
    // partition-column predicate: the scan must prune via PartitionFilters
    // (at 100 TB this is the difference between one directory and all of
    // them), not read everything and post-filter
    Queries.queries("q_sink_partitioned")(spark, TestSpark.sf).count()
    val path = "/tmp/graft_part_sink_" + TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    val pruned = spark.read.parquet(path).filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"), plan)
    assert(pruned.count() > 0)
  }

  test("q_join_dpp's fact scan carries a dynamic pruning PartitionFilter") {
    // the dim filter (n_regionkey) is not a fact column, so pruning the
    // fact directories can only happen via a runtime DPP subquery — a
    // static PushedFilters entry cannot express it
    val df = Queries.queries("q_join_dpp")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected runtime partition pruning on the fact scan:\n$plan")
    assert(df.count() > 0)
  }

  test("q_join_bloom_runtime gets an optimizer-injected bloom filter on the fact side") {
    // the builder pins the bloom size thresholds on a CLONED session and
    // returns a df owned by it, so the injected filter must be visible on
    // the returned df without the caller's session conf ever changing —
    // and the shuffle_hash hint must have held (a broadcast join would
    // make the rule correctly decline)
    val confKeys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = confKeys.map(k => k -> spark.conf.getOption(k))
    val df = Queries.queries("q_join_bloom_runtime")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected an injected runtime bloom filter on the lineitem side:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"shuffle_hash hint must hold — no fact-side shuffle means no bloom to inject:\n$plan")
    assert(df.count() > 0)
    val after = confKeys.map(k => k -> spark.conf.getOption(k))
    assert(before == after,
      s"caller session conf must not be mutated by the thunk: $before -> $after")
  }

  test("q_join_dpp_subquery prunes via a duplicated subquery, not broadcast reuse") {
    // the merge hint forbids a BroadcastExchange, so the ONLY way the fact
    // scan can be runtime-pruned is the duplicated-subquery DPP mechanism
    // (reuseBroadcastOnly=false, a graft session default)
    val df = Queries.queries("q_join_dpp_subquery")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected runtime partition pruning on the fact scan:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"merge hint must hold — a broadcast here would test the wrong DPP path:\n$plan")
    assert(!plan.contains("SubqueryBroadcast"),
      s"pruning must run as a standalone duplicated subquery:\n$plan")
  }
}
