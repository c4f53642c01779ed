package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement of the incremental-dedup STAGING story
  * (`q_llm_dedup_incremental`, llm/DedupIncr.scala): the corpus shingle
  * index is a durable `graft.io.Staged` artifact, so day-2 runs skip the
  * whole tokenize→shingle→df-cap pipeline and pay only the batch join +
  * Jaccard verify.
  *
  * Three timings, each in its OWN SparkContext (a stopped context drops
  * Staged's in-memory entry, so the day-2 run proves the PARQUET artifact
  * is what's being reused — the daily-application shape, not same-session
  * memoization):
  *
  *   1. cold  — staging dir set, artifact absent: builds + publishes the
  *              index, then runs the query.
  *   2. day2  — NEW context, same staging dir: reads the artifact.
  *   3. batch — the batch-only shingle pipeline WITHOUT staging, the
  *              incremental cost a real day-2 ingest adds for docs the
  *              artifact hasn't seen (here re-derived from the batch
  *              split of the same table).
  *
  * `sbt "runMain graft.IncrStress <sfDir>"` — prints one JSON line; the
  * numbers land in BASELINE.md.
  */
object IncrStress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val stagingDir = java.nio.file.Files.createTempDirectory("graft-incr-staging")
      .toString
    def fresh(): SparkSession = {
      val s = DevSession.local()
      s.conf.set("spark.graft.staging.dir", stagingDir)
      s
    }
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val s1 = fresh()
    val (coldSec, rows1) =
      timed(SparkEntry.queries("q_llm_dedup_incremental")(s1, sfDir).count())
    s1.stop()

    val s2 = fresh()
    val (day2Sec, rows2) =
      timed(SparkEntry.queries("q_llm_dedup_incremental")(s2, sfDir).count())
    s2.stop()
    require(rows1 == rows2, s"cold/day2 row mismatch: $rows1 vs $rows2")

    // incremental-ingest cost: shingle + df-cap ONLY the batch docs,
    // bypassing Staged (no staging conf) so nothing is reused
    val s3 = DevSession.local()
    val (batchSec, batchPostings) = timed {
      val batchShingles = graft.io.Tables.documents(s3, sfDir)
        .filter(col("doc_id") % 10 >= 8)
        .select(col("doc_id"),
          explode(graft.fns.TextKernelCols.shingleHashes(s3, col("text"))).as("s"))
      graft.llm.TextOps.dfCapped(batchShingles, graft.llm.TextOps.DF_CAP).count()
    }
    val artifactBytes = {
      val dir = new java.io.File(stagingDir)
      def size(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      size(dir)
    }
    s3.stop()
    println(f"""{"stress":"dedupIncrStaging","sf":"$sfDir","rows":$rows1,"cold_sec":$coldSec%.2f,"day2_sec":$day2Sec%.2f,"batch_shingle_sec":$batchSec%.2f,"batch_postings":$batchPostings,"artifact_bytes":$artifactBytes}""")

    // ---- day-N ACCRETION: the compaction story (DedupIncr.compactIndex).
    // Corpus = doc_id%10<8, day-2 batch = %10==8, day-3 batch = %10==9.
    // Each day runs in a FRESH context (the artifact chain, not session
    // memoization, is what's reused), pays batch-vs-index verify + one
    // compaction, and the day-3 artifact must equal a from-scratch rebuild
    // over all docs (signature compare) — accretion loses nothing.
    def postings(s: SparkSession, pred: org.apache.spark.sql.Column) =
      graft.io.Tables.documents(s, sfDir).filter(pred)
        .select(col("doc_id"),
          explode(graft.fns.TextKernelCols.shingleHashes(s, col("text"))).as("s"))
    def corpusIdx(s: SparkSession) =
      graft.io.Staged(s, s"incrCorpusIdx|$sfDir") {
        graft.llm.TextOps.dfCapped(postings(s, col("doc_id") % 10 < 8),
          graft.llm.TextOps.DF_CAP)
      }
    def day2Idx(s: SparkSession) =
      graft.llm.DedupIncr.compactIndex(s, s"incrCorpusIdx+d2|$sfDir",
        corpusIdx(s), postings(s, col("doc_id") % 10 === 8))
    // batch-vs-index verify: candidates via the shared-shingle join, exact
    // Jaccard >= 0.3, one verdict per matched batch doc
    def verdicts(batch: org.apache.spark.sql.DataFrame,
        idx: org.apache.spark.sql.DataFrame): Long = {
      val nb = batch.groupBy("doc_id").agg(count(lit(1)).as("nb"))
        .select(col("doc_id").as("bid"), col("nb"))
      val nc = idx.groupBy("doc_id").agg(count(lit(1)).as("nc"))
        .select(col("doc_id").as("cid"), col("nc"))
      batch.select(col("doc_id").as("bid"), col("s"))
        .join(idx.select(col("doc_id").as("cid"), col("s").as("s2")),
          col("s") === col("s2"))
        .groupBy("bid", "cid").agg(count(lit(1)).as("common"))
        .join(nb, "bid").join(nc, "cid")
        .filter(col("common") / (col("nb") + col("nc") - col("common")) >= 0.3)
        .groupBy("bid").agg(min(col("cid")))
        .count()
    }
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("s")))).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val s4 = fresh()
    corpusIdx(s4).count() // day-1 index build (or artifact read) outside day-2 timing
    val (day2QuerySec, d2Verdicts) =
      timed(verdicts(postings(s4, col("doc_id") % 10 === 8), corpusIdx(s4)))
    val (compact2Sec, d2IdxRows) = timed(day2Idx(s4).count())
    s4.stop()

    val s5 = fresh()
    val (day3QuerySec, d3Verdicts) =
      timed(verdicts(postings(s5, col("doc_id") % 10 === 9), day2Idx(s5)))
    val (compact3Sec, d3IdxRows) = timed(
      graft.llm.DedupIncr.compactIndex(s5, s"incrCorpusIdx+d2+d3|$sfDir",
        day2Idx(s5), postings(s5, col("doc_id") % 10 === 9)).count())
    val d3Sig = sig(graft.llm.DedupIncr.compactIndex(s5, s"incrCorpusIdx+d2+d3|$sfDir",
      day2Idx(s5), postings(s5, col("doc_id") % 10 === 9)))
    val rebuildSig = sig(graft.llm.TextOps.dfCapped(
      postings(s5, lit(true)), graft.llm.TextOps.DF_CAP))
    require(d3Sig == rebuildSig,
      s"compacted day-3 index diverged from full rebuild: $d3Sig vs $rebuildSig")
    s5.stop()

    println(f"""{"stress":"dedupIncrCompact","sf":"$sfDir","day2_query_sec":$day2QuerySec%.2f,"day2_compact_sec":$compact2Sec%.2f,"day3_query_sec":$day3QuerySec%.2f,"day3_compact_sec":$compact3Sec%.2f,"day2_verdicts":$d2Verdicts,"day3_verdicts":$d3Verdicts,"day2_idx_rows":$d2IdxRows,"day3_idx_rows":$d3IdxRows,"rebuild_match":true}""")
  }
}
