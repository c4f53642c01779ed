package graft.llm

import graft.{Queries, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end gates for the PQ/ADC ANN path (q_llm_ann_pq): recall
  * against the exact brute-force top-5, structural sanity of the ranked
  * output, and the packed-code artifact invariants the 100 TB posture
  * rests on (one 8-byte code word per vector, deterministic re-encode). */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PQ ANN recall@5 vs brute force, ranked output sane") {
    val brute = Queries.queries("q_llm_similarity_topk")(spark, TestSpark.sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val pq = Queries.queries("q_llm_ann_pq")(spark, TestSpark.sf)
      .select("qid", "nid", "rn", "sim").as[(Long, Long, Long, Double)].collect()
    assert(pq.nonEmpty)
    assert(pq.forall { case (q, n, _, _) => q != n })
    val byQ = pq.groupBy(_._1)
    assert(byQ.forall(_._2.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_._3).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    val recall = (brute & pq.map(t => (t._1, t._2)).toSet).size.toDouble / brute.size
    // m=8 x k=16 codes re-ranked from 64 ADC candidates; floor leaves
    // margin under the measured point (see BASELINE.md PQ row)
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("IVF-PQ ANN recall@5 vs brute force; cell prune on/off agree exactly") {
    val brute = Queries.queries("q_llm_similarity_topk")(spark, TestSpark.sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivfpq = Queries.queries("q_llm_ann_ivfpq")(spark, TestSpark.sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute & ivfpq).size.toDouble / brute.size
    // both approximations compound (nprobe=2 of 16 cells caps candidates,
    // ADC ranks inside them) — same floor as plain IVF
    assert(recall >= 0.5, s"recall=$recall")
    // the pushed `cell IN` filter is a superset of the join keys: the
    // unpruned plan must return the identical ranked result
    val base = Similarity.quantized(spark, TestSpark.sf)
    val unpruned = Similarity.ivfPqTopkOn(spark, TestSpark.sf, base,
        nprobe = 2, topR = 64, prune = false)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(unpruned == ivfpq, "prune changed the IVF-PQ result")
  }

  test("packed-code artifact: one 8-byte code word per vector, codes decodable") {
    val base = Similarity.quantized(spark, TestSpark.sf)
    val codes = Similarity.pqCodesOn(spark, TestSpark.sf, base)
      .as[(Long, Long, Double)].collect()
    assert(codes.length == base.count(), "exactly one code word per corpus vector")
    // every 4-bit field decodes to a centroid id in [0, 16); bits above
    // m*log2(k) stay clear — the word IS the whole index entry
    codes.foreach { case (_, cw, anrm2) =>
      assert((cw >>> 32) == 0L, s"stray bits above the 8x4-bit code: $cw")
      assert(anrm2 > 0.0, "reconstruction norm must be positive")
    }
  }

  test("re-encoding the same corpus reproduces the artifact bit-for-bit") {
    val base = Similarity.quantized(spark, TestSpark.sf)
    val first = Similarity.pqCodesOn(spark, TestSpark.sf, base)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // a sibling session shares no Staged entry (per-session keying), so
    // this retrains + re-encodes from scratch — determinism is the claim
    val sib = spark.newSession()
    val base2 = Similarity.quantized(sib, TestSpark.sf)
    val second = Similarity.pqCodesOn(sib, TestSpark.sf, base2)
      .as[(Long, Long, Double)](org.apache.spark.sql.Encoders.product[(Long, Long, Double)])
      .collect().sortBy(_._1).toSeq
    assert(first == second, "PQ training/encoding must be deterministic")
  }
}
