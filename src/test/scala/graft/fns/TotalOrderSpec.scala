package graft.fns

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TotalOrder must reproduce the single-partition window results exactly
  * while planning NONE of its exchanges as SinglePartition — that
  * exchange is the one-machine bottleneck the helper exists to remove
  * from the sort-dependent pipeline queries. */
class TotalOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("globalRank and runningSum match the naive total-order reference") {
    val r = new scala.util.Random(13)
    val rows = (0 until 5000).map(i => (r.nextLong(), r.nextInt(100).toLong))
      .distinctBy(_._1)
    val df = rows.toDF("k", "v").repartition(11)

    val rank = TotalOrder.globalRank(df, 7, col("k"))
      .select("k", "rn").as[(Long, Long)].collect().toMap
    val wantRank = rows.map(_._1).sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    assert(rank == wantRank)

    val cum = TotalOrder.runningSum(df, "v", 7, col("k"))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    var acc = 0L
    val wantCum = rows.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
    assert(cum == wantCum)

    // descending order with tie-break (the q_llm_select_budget shape)
    val cumD = TotalOrder.runningSum(df, "v", 5, col("v").desc, col("k"))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    var accD = 0L
    val wantD = rows.sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) => accD += v; k -> accD }.toMap
    assert(cumD == wantD)
  }

  test("globalRank stays exact and codegen-sized at 1024 partitions") {
    // a 100 TB-realistic partition count: the offsets must ride a broadcast
    // join, not a 1024-branch CASE WHEN chain (codegen blowup territory)
    val rows = (0 until 20000).map(i => ((i.toLong * 48271) % 99991, 1L)).distinctBy(_._1)
    val df = rows.toDF("k", "v").repartition(13)
    val ranked = TotalOrder.globalRank(df, 1024, col("k"))
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("CASE WHEN"),
      "offsets must not be a per-partition when-chain")
    assert(plan.contains("BroadcastHashJoin"), "offsets must join via broadcast")
    val got = ranked.select("k", "rn").as[(Long, Long)].collect().toMap
    val want = rows.map(_._1).sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == want)

    var acc = 0L
    val wantCum = rows.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
    val gotCum = TotalOrder.runningSum(df, "v", 1024, col("k"))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(gotCum == wantCum)
  }

  test("total-order consumers plan no single-partition exchange") {
    for (name <- Seq("q_llm_pack", "q_llm_select_budget", "q_llm_dedup_sorted",
        "q_llm_dedup_sorted_r2")) {
      val plan = Queries.queries(name)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        s"$name still plans an Exchange SinglePartition:\n$plan")
    }
  }
}
