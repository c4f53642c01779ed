package graft

import org.apache.spark.sql.functions._

/** Dev-only throughput stress for the codegen'd BPE encoder
  * (`graft.fns.BpeEncode`): synthetic corpus of `n` documents (~64 words
  * drawn deterministically from a 64-word vocabulary, ~350 bytes/doc),
  * trainer runs once on the corpus dictionary, then the encode pass is
  * timed end-to-end (tokenize every doc, aggregate token count) — the
  * map-only hot path a 100 TB tokenization job repeats per batch.
  *
  * `sbt "runMain graft.BpeStress [nDocs]"`
  */
object BpeStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = DevSession.local()

    val vocab = Seq("query", "join", "filter", "scan", "sort", "merge", "group",
      "agg", "window", "hash", "vector", "stream", "table", "column", "row",
      "batch", "spark", "data", "key", "value", "part", "order", "line",
      "customer", "small", "big", "fast", "slow", "the", "a", "token", "model")
    val wordsPerDoc = 64
    val word = (i: org.apache.spark.sql.Column) =>
      element_at(array(vocab.map(lit): _*),
        (pmod(xxhash64(col("id") * wordsPerDoc + i, lit(17L)), lit(vocab.size.toLong)) + 1)
          .cast("int"))
    val text = concat_ws(" ",
      transform(sequence(lit(0), lit(wordsPerDoc - 1)), i => word(i)))
    val docs = spark.range(n).select(col("id").as("doc_id"), text.as("text"))
      .localCheckpoint()
    val bytes = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)

    // trainer: word-count dictionary (bounded by the 32-word vocab) +
    // driver merge loop — timed separately from the encode hot path
    val t0 = System.nanoTime()
    val dict = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = graft.llm.Bpe.trainMerges(dict)
    val trainSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val enc = graft.fns.BpeExpressions.bpeEncode(spark, col("text"), merges, s"bpestress:$n")
    val toks = docs.select(size(enc).as("k")).agg(sum(col("k"))).collect()(0).getLong(0)
    val encSec = (System.nanoTime() - t1) / 1e9

    println(f"n=$n bytes=$bytes merges=${merges.size} train=$trainSec%.1fs " +
      f"encode=$encSec%.1fs toks=$toks mbps=${bytes / 1e6 / encSec}%.1f " +
      f"tokpersec=${(toks / encSec / 1e6)}%.1fM")
    spark.stop()
  }
}
