package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ANN index accretion (the day-N story DedupIncr spec'd for
  * dedup): folding a new vector batch into the durable artifacts must be
  * (a) cheap — encode/bucketize the BATCH only, never re-touch the
  * corpus — and (b) exact — bit-identical to the from-scratch build the
  * append semantics promise (same-codebook encode for PQ, where the
  * quantizer is frozen by contract; full equality for LSH, whose
  * hyperplanes are corpus-independent constants).  Both appends publish
  * under a new tag, and because every consumer resolves artifacts by
  * tag, day-2 queries ride the appended index with no rebuild. */
class AnnIncrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def split() = {
    val base = Similarity.quantized(spark, TestSpark.sf)
    val old = base.filter(col("vec_id") % 10 < 8)
    val batch = base.filter(col("vec_id") % 10 >= 8)
    (base, old, batch)
  }

  test("LSH postings append == from-scratch build of the combined corpus") {
    val (base, old, batch) = split()
    val appended = Similarity
      .lshPostingsAppendOn(spark, "incr-old", "incr-day2", old, batch)
      .as[(Long, Long)].collect().toSet
    val rebuilt = Similarity.lshPostingsOn(spark, "incr-rebuild", base)
      .as[(Long, Long)].collect().toSet
    assert(appended == rebuilt,
      "hyperplanes are corpus-independent: append must equal the full rebuild")
    // day-2 queries resolve the appended artifact by tag — same ranked
    // output as a query over a freshly built index on the combined corpus
    val viaAppend = Similarity.lshTopkOn(spark, "incr-day2", base, nprobe = 8, tables = 16)
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaRebuild = Similarity.lshTopkOn(spark, "incr-rebuild", base, nprobe = 8, tables = 16)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaAppend == viaRebuild)
  }

  test("PQ codes append == same-codebook encode of the combined corpus; day-2 query served") {
    val (base, old, batch) = split()
    val appended = Similarity.pqAppendOn(spark, "incr-pq-old", "incr-pq-day2", old, batch)
      .as[(Long, Long, Double)].collect().toSet
    // control: stage the SAME frozen codebook under a fresh tag, then
    // encode the whole combined corpus through the normal path
    val cb = Similarity.pqCodebookOn(spark, "incr-pq-old", old)
    graft.io.Staged(spark, "pqCodebook8/16|incr-pq-ctl")(cb)
    val control = Similarity.pqCodesOn(spark, "incr-pq-ctl", base)
      .as[(Long, Long, Double)].collect().toSet
    assert(appended == control,
      "append must be bit-identical to encoding old ∪ batch under the frozen codebook")
    // day-2 top-k rides the appended artifacts by tag resolution
    val day2 = Similarity.pqTopkOn(spark, "incr-pq-day2", base, topR = 64)
      .as[(Long, Long, Long, Double)].collect()
    val ctl = Similarity.pqTopkOn(spark, "incr-pq-ctl", base, topR = 64)
      .as[(Long, Long, Long, Double)].collect()
    assert(day2.nonEmpty && day2.toSet == ctl.toSet)
  }

  test("IVFADC append: day-1 rows frozen bit-for-bit, batch folded in, day-2 query served") {
    val (base, old, batch) = split()
    val day1 = Similarity.ivfPqCodesOn(spark, "incr-ivfpq-old", old)
      .as[(Long, Long, Long, Double)].collect().toSet
    val appended = Similarity
      .ivfPqAppendOn(spark, "incr-ivfpq-old", "incr-ivfpq-day2", old, batch)
      .as[(Long, Long, Long, Double)].collect()
    // frozen quantizers: accretion must not drift a single day-1 row
    val oldIds = day1.map(_._1)
    assert(appended.filter(r => oldIds(r._1)).toSet == day1)
    // every batch vector folded in exactly once
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(appended.map(_._1).toSet == oldIds ++ batchIds)
    assert(appended.length == day1.size + batchIds.size)
    // day-2 top-k rides the appended artifacts by tag resolution
    val day2 = Similarity.ivfPqTopkOn(spark, "incr-ivfpq-day2", base, nprobe = 2, topR = 64)
      .as[(Long, Long, Long, Double)].collect()
    assert(day2.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
  }
}
