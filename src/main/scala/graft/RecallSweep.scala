package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Recall@5 sweep for the ANN operators vs the exact brute-force top-5:
  * IVF across probe widths (nprobe 1/2/4) and hyperplane LSH across
  * multi-probe radii (hamming 0/1/2).  Results are recorded in BASELINE.md
  * so the accuracy/cost trade-off is documented, not just threshold-gated.
  *
  * Usage: `sbt "runMain graft.RecallSweep [sfDir]"`.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = DevSession.local(defaultCpus = "8", logLevel = "ERROR")
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def candidates(df: DataFrame): Long = df.count()
    val brute = pairs(Queries.queries("q_llm_similarity_topk")(spark, sfDir))
    println(f"| variant | recall@5 | rows returned |")
    println(f"| --- | --- | --- |")
    for (np <- Seq(1, 2, 4)) {
      val df = graft.llm.Similarity.ivfTopk(spark, sfDir, np)
      val p = pairs(df)
      println(f"| IVF nprobe=$np | ${(brute & p).size.toDouble / brute.size}%.3f | ${candidates(df)} |")
    }
    for (h <- Seq(0, 1, 2)) {
      val df = graft.llm.Similarity.lshTopk(spark, sfDir, h)
      val p = pairs(df)
      println(f"| LSH hamming<=$h | ${(brute & p).size.toDouble / brute.size}%.3f | ${candidates(df)} |")
    }
    spark.stop()
  }
}
