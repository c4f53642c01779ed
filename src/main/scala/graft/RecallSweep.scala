package graft

import org.apache.spark.sql.DataFrame

/** Recall@5 sweep for the ANN operators vs the exact brute-force top-5:
  * IVF across probe widths (nprobe 1/2/4) and multi-table LSH across
  * per-table probe budgets and table counts.  Results are recorded in
  * BASELINE.md so the accuracy/cost trade-off is documented, not just
  * threshold-gated.
  *
  * Usage: `sbt "runMain graft.RecallSweep [sfDir]"`.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = DevSession.local(defaultCpus = "8", logLevel = "ERROR")
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Queries.queries("q_llm_similarity_topk")(spark, sfDir))
    println(f"| variant | recall@5 | rows returned |")
    println(f"| --- | --- | --- |")
    for (np <- Seq(1, 2, 4)) {
      val df = graft.llm.Similarity.ivfTopk(spark, sfDir, np)
      val p = pairs(df)
      println(f"| IVF nprobe=$np | ${(brute & p).size.toDouble / brute.size}%.3f | ${df.count()} |")
    }
    val base = graft.llm.Similarity.quantized(spark, sfDir)
    for (topR <- Seq(16, 64, 256)) {
      val p = pairs(graft.llm.Similarity.pqTopkOn(spark, sfDir, base, topR))
      println(f"| PQ m=8 k=16 topR=$topR | ${(brute & p).size.toDouble / brute.size}%.3f | 8 B/vec scan |")
    }
    for ((np, topR) <- Seq((2, 64), (4, 64))) {
      val p = pairs(graft.llm.Similarity.ivfPqTopkOn(spark, sfDir, base, np, topR))
      println(f"| IVF-PQ nprobe=$np topR=$topR | ${(brute & p).size.toDouble / brute.size}%.3f | ${np * 100 / 16}%% cells x 8 B/vec |")
    }
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val nQueries = 10L
    for ((tables, np) <- Seq((4, 8), (8, 8), (16, 4), (16, 8), (16, 16))) {
      val df = graft.llm.Similarity.lshTopk(spark, sfDir, np, tables)
      val p = pairs(df)
      // scan cost = distinct candidates fetched per query / corpus size
      val frac = graft.llm.Similarity.lshCandidates(spark, sfDir, np, tables)
        .count().toDouble / nQueries / corpus
      println(f"| LSH L=$tables nprobe=$np/256 | ${(brute & p).size.toDouble / brute.size}%.3f | scan ${frac * 100}%.1f%% |")
    }
    spark.stop()
  }
}
