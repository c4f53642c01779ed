package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only scale stress for the PQ/ADC ANN: drives the IDENTICAL
  * pipeline (`Similarity.pqTopkOn`, m=8 subspaces x 16 centroids, packed
  * 32-bit code words) over a synthetic corpus against the exact
  * brute-force top-5.  Vectors are xxhash64-derived integers — fully
  * deterministic, no RNG state.
  *
  * What it measures (recorded in BASELINE.md): PQ's scale story is
  * MEMORY-side, complementary to LSH/IVF's scan-fraction story — the
  * steady-state candidate pass scans an 8-byte code word per vector
  * (1.6% of the 512-byte raw vector), scoring each word with m table
  * adds against the query's broadcast LUT; only the topR survivors'
  * true vectors are ever fetched.  On a 100 TB embedding corpus that
  * turns the ANN scan into a ~1.6 TB columnar read.
  *
  * `sbt "runMain graft.PqStress [nVectors] [topR] [nprobe] [clustered] [k]"`
  * — the optional 4th arg switches the corpus from isotropic (the
  * adversarial case: neighbors at cosine ~0.32, quantization error
  * dominates) to the 32-planted-cluster generator IvfStress uses (the
  * realistic-embedding case where near neighbors are genuinely close);
  * the optional 5th arg sweeps the code-bits knob (k=16 ⇒ 32-bit codes,
  * k=256 ⇒ 64-bit — still one long per vector).
  */
object PqStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val topR = if (args.length > 1) args(1).toInt else 256
    val clustered = args.lift(3).contains("clustered")
    val pqK = args.lift(4).map(_.toInt).getOrElse(16)
    val spark = DevSession.local()
    val dim = 64

    val base =
      (if (clustered) StressCorpora.clustered(spark, n, dim)
       else StressCorpora.isotropic(spark, n, dim))
      .localCheckpoint()

    // exact brute-force top-5 for the 10 query vectors: one corpus scan
    val queries = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("qv").as("qq"), col("nrm").as("qn"))
    val sim = graft.fns.VecExpressions.vecDot(spark, col("qq"), col("qv")).cast(DoubleType) /
      (sqrt(col("qn")) * sqrt(col("nrm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    val t0 = System.nanoTime()
    val brute = base.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("sim", sim)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSec = (System.nanoTime() - t0) / 1e9

    // deployment shape: codebook + packed codes are durable staged
    // artifacts; the steady-state query pays only the code scan + re-rank
    val staging = s"target/pq-stress-staging-$n-$clustered-$pqK"
    spark.conf.set("spark.graft.staging.dir", staging)
    val tag = s"stress:$n:$clustered:$pqK"

    // stage 1: trainer (2 Lloyd iterations over the capped sample)
    val tTrain = System.nanoTime()
    graft.llm.Similarity.pqCodebookOn(spark, tag, base, k = pqK).count()
    val trainSec = (System.nanoTime() - tTrain) / 1e9
    // stage 2: the one-time packed-code encode+publish
    val tEnc = System.nanoTime()
    val nCodes = graft.llm.Similarity.pqCodesOn(spark, tag, base, k = pqK).count()
    val encSec = (System.nanoTime() - tEnc) / 1e9
    // stage 3: steady-state query over the artifact (ADC scan + topR +
    // exact re-rank of topR vectors)
    val tQ = System.nanoTime()
    val pq = graft.llm.Similarity.pqTopkOn(spark, tag, base, topR, k = pqK)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qSec = (System.nanoTime() - tQ) / 1e9
    val recall = (brute & pq).size.toDouble / brute.size

    println(f"""{"stress":"pq","vectors":$n,"clustered":$clustered,"m":8,"k":$pqK,"topR":$topR,"recall5":$recall%.3f,"codes":$nCodes,"code_bytes_per_vec":8,"train_sec":$trainSec%.1f,"encode_sec":$encSec%.1f,"query_sec":$qSec%.1f,"brute_sec":$bruteSec%.1f}""")

    // stage 4 (optional third arg = nprobe): the IVF-PQ composition —
    // coarse cells prune WHICH code words are scanned, on top of the
    // 8-byte-per-vector ADC scan
    args.lift(2).map(_.toInt).foreach { nprobe =>
      val tIdx = System.nanoTime()
      graft.llm.Similarity.ivfPqCodesOn(spark, tag, base).count()
      val idxSec = (System.nanoTime() - tIdx) / 1e9
      val tQ2 = System.nanoTime()
      val ivfpq = graft.llm.Similarity.ivfPqTopkOn(spark, tag, base, nprobe, topR)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val q2Sec = (System.nanoTime() - tQ2) / 1e9
      val recall2 = (brute & ivfpq).size.toDouble / brute.size
      println(f"""{"stress":"ivfpq","vectors":$n,"clustered":$clustered,"nprobe":$nprobe,"topR":$topR,"recall5":$recall2%.3f,"ivf_index_sec":$idxSec%.1f,"query_sec":$q2Sec%.1f,"brute_sec":$bruteSec%.1f}""")
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
  }
}
