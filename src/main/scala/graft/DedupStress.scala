package graft

import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale stress for the near-dup candidate pipeline — the analog
  * of [[ScaleStress]] for dedup.  Synthesizes an N-doc shingle index where
  * every doc shares its 20 shingles with a group of 5 docs (linear pair
  * structure), PLUS a planted boilerplate shingle carried by every 100th
  * doc (df = N/100 — the "all rights reserved" hot key).  Uncapped, the
  * hot key alone contributes (N/100)²/2 candidate pairs, quadratic in N;
  * with the document-frequency cap the pipeline must scale linearly.
  *
  * `sbt "runMain graft.DedupStress <nDocs>"` — prints docs, candidate
  * pairs, wall seconds for the capped pipeline (and the uncapped hot-key
  * pair count it avoided).
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = DevSession.local()
    val SHINGLES = 20
    val SHARE = 5   // docs per share-group: each doc pairs with 4 others
    val HOT_EVERY = 100L
    // postings: (doc_id, s); share-group shingles are disjoint across groups
    val docs = spark.range(n).localCheckpoint()
    val grouped = docs.select(col("id").as("doc_id"),
        explode(sequence(lit(0), lit(SHINGLES - 1))).as("j"))
      .select(col("doc_id"),
        (call_function("div", col("doc_id"), lit(SHARE.toLong)) * SHINGLES + col("j") + 1000000000L).as("s"))
    val hot = docs.filter(pmod(col("id"), lit(HOT_EVERY)) === 0)
      .select(col("id").as("doc_id"), lit(7L).as("s"))
    val index = grouped.unionByName(hot).localCheckpoint()
    val hotDf = n / HOT_EVERY
    val capped = TextOps.dfCapped(index, TextOps.DF_CAP)
    val t0 = System.nanoTime()
    val pairs = Dedup.jaccardPairs(capped).count()
    val sec = (System.nanoTime() - t0) / 1e9
    // the hot key is only dropped once its df exceeds the cap; below that
    // threshold its pairs are IN the measured count, not avoided
    val hotCapped = hotDf > TextOps.DF_CAP
    val avoided = if (hotCapped) hotDf * (hotDf - 1) / 2 else 0L
    println(f"""{"stress":"dedupCapped","docs":$n,"hot_df":$hotDf,"hot_capped":$hotCapped,"pairs":$pairs,"sec":$sec%.1f,"uncapped_extra_pairs":$avoided}""")
    spark.stop()
  }
}
