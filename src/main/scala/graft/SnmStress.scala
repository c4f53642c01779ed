package graft

import org.apache.spark.sql.functions._

/** Dev-only scale stress for the multi-seed sorted-neighborhood dedup
  * (`q_llm_dedup_sorted_r2`) at sf1-and-beyond document counts (bench
  * sf0.1 has 5 k docs; default sizes here are 10× and 40× that).
  *
  * Synthesizes n 60-token documents (tokens hash-derived from a 20 k
  * vocabulary, so distinct docs share no 3-shingles in practice); every
  * 10th doc gets a planted near-dup partner — first token substituted,
  * true shingle Jaccard 57/59 ≈ 0.97.  Asserts, distributed:
  *
  *   - PRECISION exactly 1: every emitted pair is a planted (id, id+n)
  *     pair — token-soup docs of this length share no shingles, so any
  *     extra pair is a pipeline bug, not noise;
  *   - RECALL ≥ 0.9 (per-seed miss ≈ 3/58, squared by the two seeded
  *     orderings — SnmRecallSpec measures the same construction at small
  *     scale);
  *   - and the printed wall seconds across sizes let BASELINE.md record
  *     the ~linear growth claim: the pipeline is R distributed rank
  *     passes + R rank-band joins + one Jaccard verify — nothing
  *     all-pairs, nothing single-partition (plan-guarded in
  *     TotalOrderSpec).
  *
  * `SPARK_DRIVER_MEM=96g SPARK_GRAFT_CPUS=32 sbt "runMain graft.SnmStress [<n> ...]"`
  *
  * For the BASELINE.md scaling table run ONE size per JVM: the pipeline's
  * `localCheckpoint` blocks accumulate in the block manager across loop
  * iterations (released only by the async context cleaner), so a
  * multi-size run measures size k under the residue of sizes 1..k-1 —
  * observed 2-3× wall inflation on the later sizes, pure measurement
  * artifact.
  */
object SnmStress {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(50000L, 200000L)
    val spark = DevSession.local()
    for (n <- sizes) {
      val dir = s"/tmp/graft_snm_stress_$n"
      val toks = (0 until 60).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(i)), lit(20000))))
      val base = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", toks: _*).as("text"))
      val partners = spark.range(n).filter(pmod(col("id"), lit(10)) === 0)
        .select((col("id") + n).as("doc_id"),
          concat_ws(" ", concat(lit("u"), col("id")) +: toks.tail: _*).as("text"))
      base.unionByName(partners)
        .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val planted = (n + 9) / 10
      val t0 = System.nanoTime()
      val pairs = Queries.queries("q_llm_dedup_sorted_r2")(spark, dir)
        .select(least(col("ia"), col("ib")).as("a"),
          greatest(col("ia"), col("ib")).as("b"))
        .localCheckpoint()
      val found = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val nonPlanted = pairs
        .filter(!(col("b") === col("a") + n && pmod(col("a"), lit(10)) === 0))
        .count()
      assert(nonPlanted == 0, s"$nonPlanted non-planted pairs emitted at n=$n")
      val recall = found.toDouble / planted
      assert(recall >= 0.9, f"recall collapsed at n=$n: $recall%.3f")
      println(f"""{"stress":"snm_r2","n":$n,"planted":$planted,"found":$found,"recall":$recall%.3f,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
