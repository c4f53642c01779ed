package graft.llm

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for day-2 incremental curation: the batch-keyed pipeline must be
  * BYTE-IDENTICAL to full curate3 restricted to the planted day-2 slice
  * (the leader-by-lowest-id equivalence the scaladoc derives), the slice
  * split must be exhaustive (batch ∪ corpus = manifest), and a warm
  * re-run over the session-staged artifacts must reproduce the verdicts
  * (the staging layer serves, not recomputes). */
class CurateIncrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "split", "n_tok", "nll3_milli")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("incremental manifest ≡ full curate3 restricted to the day-2 slice") {
    val incr = rows(Queries.queries("q_llm_curate_incremental")(spark, TestSpark.sf))
    val full = Queries.queries("q_llm_curate3")(spark, TestSpark.sf)
    val fullBatch = rows(full.filter(col("doc_id") % 10 >= 8))
    assert(incr == fullBatch,
      s"incremental and curate3-slice manifests diverge: " +
        s"only-incr=${(incr -- fullBatch).take(5)} only-full=${(fullBatch -- incr).take(5)}")
    // the slice is genuinely exercised: both kept and (implicitly)
    // dropped batch docs exist at spec scale
    val nBatchDocs = graft.io.Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") % 10 >= 8).count()
    assert(incr.nonEmpty && incr.size < nBatchDocs,
      s"slice degenerate: ${incr.size} of $nBatchDocs batch docs kept")
  }

  test("warm re-run over staged artifacts reproduces the batch verdicts") {
    val a = rows(Queries.queries("q_llm_curate_incremental")(spark, TestSpark.sf))
    val b = rows(Queries.queries("q_llm_curate_incremental")(spark, TestSpark.sf))
    assert(a == b)
  }
}
