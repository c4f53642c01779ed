package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only scale stress for the multi-table LSH ANN: drives the
  * IDENTICAL pipeline (`Similarity.lshTopkOn`, 16 tables x 8 planes,
  * query-directed multi-probe) over a synthetic million-vector corpus
  * against the exact brute-force top-5.  Vectors are xxhash64-derived
  * integers — fully deterministic, no RNG state.
  *
  * What it measures (recorded in BASELINE.md): on isotropic data the
  * distinct-candidate fraction is ~ 1-(1-nprobe/2^planes)^tables at ANY
  * corpus size — corpus growth does NOT dilute it; the scale knob is the
  * PLANE COUNT (double the buckets, halve the fraction — the KnnStress
  * "add bits until cells fit" law).  Recall RISES with corpus size at
  * fixed config (nearer neighbors collide more), and at 64-dim integer
  * dots the map-only brute scan stays the faster option well past 1 M
  * vectors — ANN pays off at larger corpora/dims, which is why the
  * brute path is the judged default and LSH/IVF are the documented
  * scale alternatives.
  *
  * `sbt "runMain graft.LshStress [nVectors] [nprobe]"`
  */
object LshStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val nprobe = if (args.length > 1) args(1).toInt else 8
    val spark = DevSession.local()
    val dim = 64

    // deterministic isotropic corpus: component i of vector v is a
    // xxhash64-derived integer in [-1e6, 1e6]
    val base = StressCorpora.isotropic(spark, n, dim)
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

    // Deployment shape: the postings index is a DURABLE parquet artifact
    // (graft.io.Staged staging-dir mode), published sorted by tb so the
    // probe's pushed IN filter prunes the scan — measure THAT, not the
    // localCheckpoint stand-in.
    val staging = s"target/lsh-stress-staging-$n"
    spark.conf.set("spark.graft.staging.dir", staging)

    val tag = s"stress:$n"
    // stage 1: the one-time postings index build+publish (staged; queries
    // reuse the artifact)
    val tIdx = System.nanoTime()
    val nPostings = graft.llm.Similarity.lshPostingsOn(spark, tag, base).count()
    val idxSec = (System.nanoTime() - tIdx) / 1e9
    // stage 2: steady-state candidate cost over the artifact — pruned
    // (pushed probe-key IN filter) vs unpruned (full index scan)
    val tCand = System.nanoTime()
    val nCand = graft.llm.Similarity.lshCandidatesOn(spark, tag, base, nprobe, 16).count()
    val candSec = (System.nanoTime() - tCand) / 1e9
    val tCandF = System.nanoTime()
    val nCandF = graft.llm.Similarity
      .lshCandidatesOn(spark, tag, base, nprobe, 16, prune = false).count()
    val candFullSec = (System.nanoTime() - tCandF) / 1e9
    require(nCand == nCandF, s"prune changed the candidate set: $nCand vs $nCandF")
    val frac = nCand.toDouble / 10 / n
    // stage 3: full pipeline (probes + pruned candidates + exact re-rank)
    val t1 = System.nanoTime()
    val lsh = graft.llm.Similarity.lshTopkOn(spark, tag, base, nprobe, 16)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshSec = (System.nanoTime() - t1) / 1e9
    val recall = (brute & lsh).size.toDouble / brute.size

    println(f"""{"stress":"lsh","vectors":$n,"tables":16,"nprobe":$nprobe,"recall5":$recall%.3f,"scan_frac":$frac%.4f,"postings":$nPostings,"index_sec":$idxSec%.1f,"query_sec":$candSec%.1f,"query_full_sec":$candFullSec%.1f,"rerank_sec":$lshSec%.1f,"brute_sec":$bruteSec%.1f}""")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
  }
}
