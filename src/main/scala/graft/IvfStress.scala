package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only scale stress for the IVF ANN path (`Similarity.ivfTopkOn`:
  * deterministic mini k-means coarse quantizer, nprobe cell probe, exact
  * re-rank inside probed cells) — the CLUSTERED-corpus counterpart of
  * LshStress, because IVF's design claim is the opposite of sign-LSH's:
  * k-means cells separate clustered data well (scan ≈ nprobe/k with a
  * small trainer cost) and poorly on isotropic data (where sign-LSH is
  * the documented fallback).
  *
  * Corpus: nClusters planted centroids (xxhash-derived ±1e6 components);
  * vector v = centroid(v % nClusters) + per-component noise in ±1e5 —
  * tight, well-separated clusters, fully deterministic.  True top-5
  * neighbors of a query overwhelmingly share its cluster, so recall
  * measures whether the trainer actually recovered the cluster structure.
  *
  * Stages timed separately (all staged artifacts built via
  * `Similarity.ivfCellsOn`, so the split mirrors LshStress):
  *   index  — k-means train (2 Lloyd iterations) + full-corpus assignment;
  *   query  — steady-state probe + exact re-rank over the staged index.
  *
  * `sbt "runMain graft.IvfStress [nVectors] [nprobe]"`
  */
object IvfStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val nprobe = if (args.length > 1) args(1).toInt else 2
    val spark = DevSession.local()
    val dim = 64
    val nClusters = 32L

    val base = StressCorpora.clustered(spark, n, dim, nClusters).localCheckpoint()

    // exact brute-force top-5 for the 10 query vectors
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

    // Deployment shape: the inverted file is a DURABLE parquet artifact
    // (staging-dir mode) clustered by cell, so the probe's pushed
    // `cell IN (…)` filter prunes the vector scan to ≈ nprobe/k of the
    // corpus — measure THAT, not the localCheckpoint stand-in.
    val staging = s"target/ivf-stress-staging-$n"
    spark.conf.set("spark.graft.staging.dir", staging)

    val tag = s"ivfstress:$n"
    // stage 1: trainer + assignment + inverted-file publish (the index)
    val tIdx = System.nanoTime()
    val nAssigned = graft.llm.Similarity.ivfIndexedOn(spark, tag, base).count()
    val idxSec = (System.nanoTime() - tIdx) / 1e9
    // stage 2: steady-state query — probe nprobe cells + exact re-rank,
    // pruned (pushed cell filter) vs unpruned (full corpus scan)
    val t1 = System.nanoTime()
    val ivf = graft.llm.Similarity.ivfTopkOn(spark, tag, base, nprobe)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val querySec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val ivfFull = graft.llm.Similarity.ivfTopkOn(spark, tag, base, nprobe, prune = false)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val queryFullSec = (System.nanoTime() - t2) / 1e9
    require(ivf == ivfFull, "prune changed the result set")
    val recall = (brute & ivf).size.toDouble / brute.size

    println(f"""{"stress":"ivf","vectors":$n,"clusters":$nClusters,"k":16,"nprobe":$nprobe,"recall5":$recall%.3f,"assigned":$nAssigned,"index_sec":$idxSec%.1f,"query_sec":$querySec%.1f,"query_full_sec":$queryFullSec%.1f,"brute_sec":$bruteSec%.1f}""")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
  }
}
