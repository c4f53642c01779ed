package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25: only matching docs scored, scores positive, stable under partitioning") {
    val docs = Seq(
      (1L, "join scan merge join"),
      (2L, "scan scan scan scan scan scan"),
      (3L, "window sort agg"),
      (4L, "join")).toDF("doc_id", "text")
    val scored = Relevance.bm25(docs, Seq("join", "scan", "merge"))
      .as[(Long, Long)].collect().toMap
    assert(!scored.contains(3L), "doc without query terms must not score")
    assert(scored.keySet == Set(1L, 2L, 4L))
    assert(scored.values.forall(_ > 0L))
    // doc 1 matches three terms incl. a double tf — must outrank the one-term doc 4
    assert(scored(1L) > scored(4L))
    val repart = Relevance.bm25(docs.repartition(7), Seq("join", "scan", "merge"))
      .as[(Long, Long)].collect().toMap
    assert(repart == scored, "scores must not depend on partitioning")
  }

  test("judged top-20 is deterministic and ordered") {
    val q = Relevance.bm25TopK.fn(spark, TestSpark.sf).as[(Long, Long)].collect()
    assert(q.length == 20)
    val sorted = q.sortBy { case (id, s) => (-s, id) }
    assert(q.toSeq == sorted.toSeq, "output must be ordered by (score desc, doc_id)")
  }
}
