package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Day-2 INCREMENTAL curation — `q_llm_dedup_incremental`'s
  * batch-vs-corpus discipline composed with every curate-v3 stage: a new
  * batch of documents (the planted slice `doc_id % 10 >= 8`, the same
  * split the incremental dedup query uses) is judged against the STAGED
  * corpus artifacts without recomputing any of them —
  *
  *   1. exact dedup      — batch hash probed into the staged min-id-per-
  *                         hash index ([[stagedMinIdByHash]]);
  *   2. near-dup pruning — batch postings joined against the staged
  *                         df-capped shingle index (corpus side NEVER
  *                         self-joins; candidate pairs are corpus⋈batch
  *                         and batch⋈batch only);
  *   3. quality filter   — per-batch-doc map arithmetic;
  *   4. semantic dedup   — batch vectors pruned against the staged
  *                         fixed-seed cell assignments
  *                         ([[SemanticDedup.stagedAssignments]]);
  *   5. perplexity band  — batch token stream scored against the staged
  *                         trigram count tables ([[TextStats.lmCounts]]),
  *                         accepted inside the staged corpus band
  *                         ([[Curate.stagedBand]]).
  *
  * Because every drop rule is leader-by-lowest-id, deciding a batch doc
  * needs only pairs in which the batch doc is the LARGER id — so the
  * batch verdict computed this way is BYTE-IDENTICAL to running the full
  * [[Curate.curate3]] pipeline and restricting its manifest to the batch
  * slice.  That equivalence is the correctness anchor: the DuckDB oracle
  * IS curate3's oracle filtered to the slice (and CurateIncrSpec pins the
  * Spark-side equality query-vs-query).
  *
  * 100 TB posture: per-day cost is linear in the batch — one hash probe,
  * one postings join keyed on batch shingles, one broadcast-seed cell
  * assignment of the batch, one LM-scoring pass over the batch token
  * stream, four artifact reads.  The corpus is touched only through its
  * staged day-1 artifacts, exactly like [[DedupIncr.dedupIncremental]]
  * and the ANN append family. */
object CurateIncr {

  private val TAU = 0.3
  private val SemTau = 0.7

  /** Min doc_id per md5(text) — the rolling exact-dup index a day-2 run
    * probes (the staged sibling of curate3's exactKeep aggregate). */
  private[graft] def stagedMinIdByHash(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val fp = graft.io.Staged.fingerprint(spark, s"$sfDir/documents.parquet")
    graft.io.Staged(spark, s"md5minid|$sfDir|$fp") {
      documents(spark, sfDir)
        .select(col("doc_id"), md5(col("text")).as("h"))
        .groupBy("h").agg(min(col("doc_id")).as("keep_id"))
    }
  }

  /** Per-doc postings counts of the staged df-capped shingle index — the
    * index metadata the verify join needs (one combine pass, staged). */
  private[graft] def stagedShingleSizes(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val fp = graft.io.Staged.fingerprint(spark, s"$sfDir/documents.parquet")
    graft.io.Staged(spark, s"shsizes|$sfDir|$fp") {
      cappedShingles(spark, sfDir).groupBy("doc_id").agg(count(lit(1)).as("n"))
    }
  }

  val curateIncremental: GraftQuery = GraftQuery("q_llm_curate_incremental",
    // The oracle is the ≡-criterion itself: full curate3 on the whole
    // corpus, restricted to the planted day-2 slice.
    s"""SELECT * FROM (
       |${Curate.curate3.oracle.get}
       |) WHERE doc_id % 10 >= 8""".stripMargin) { (spark, sfDir) =>
    val isBatchDoc = col("doc_id") % 10 >= 8
    val docs = documents(spark, sfDir)
    val batchDocs = docs.filter(isBatchDoc)

    // 1. exact: keep iff the batch doc IS the min id of its hash group
    val exactKeepB = batchDocs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(stagedMinIdByHash(spark, sfDir), "h")
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id")

    // 2. near-dup: batch-keyed postings join — a-side is the full staged
    // index (corpus + batch), b-side only batch postings; ia < ib keeps
    // exactly the pairs that can drop a batch doc
    val sh = cappedShingles(spark, sfDir)
    val sz = stagedShingleSizes(spark, sfDir)
    val dropNearB = sh.select(col("doc_id").as("ia"), col("s"))
      .join(sh.filter(isBatchDoc).select(col("doc_id").as("ib"), col("s").as("s2")),
        col("s") === col("s2") && col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("common"))
      .join(sz.select(col("doc_id").as("ia"), col("n").as("na")), "ia")
      .join(sz.select(col("doc_id").as("ib"), col("n").as("nb")), "ib")
      .filter(col("common") / (col("na") + col("nb") - col("common")) >= TAU)
      .select(col("ib").as("doc_id")).distinct()

    // 3. quality stats on the batch only (curate3's exact arithmetic)
    val t = toks(col("text"))
    val nDistinct = size(graft.fns.TextKernelCols.shingleHashes(spark, col("text")))
    val qB = batchDocs.filter(size(t) >= 3)
      .select(col("doc_id"),
        size(t).cast(LongType).as("n_tok"),
        round(lit(1000.0) -
          (lit(1000L) * nDistinct.cast(LongType)).cast(DoubleType) /
            (size(t) - 2).cast(DoubleType), 0).cast(LongType).as("rep_milli"))

    // 4. semantic: batch vectors pruned against the staged assignments —
    // cell-equal pairs with a LOWER-id member (corpus or earlier batch)
    val assign = SemanticDedup.stagedAssignments(spark, sfDir)
    val simAB = graft.fns.VecExpressions.vecDot(spark, col("qa"), col("qb"))
      .cast(DoubleType) / (sqrt(col("na")) * sqrt(col("nb")))
    val semDroppedB = assign.select(col("cell"), col("vec_id").as("ia"),
        col("qv").as("qa"), col("nrm").as("na"))
      .join(assign.filter(col("vec_id") % 10 >= 8)
          .select(col("cell").as("cell_b"), col("vec_id").as("ib"),
            col("qv").as("qb"), col("nrm").as("nb")),
        col("cell") === col("cell_b") && col("ia") < col("ib"))
      .filter(simAB >= SemTau)
      .select(col("ib").as("doc_id")).distinct()

    // 5. LM: score the batch token stream against the staged count
    // tables (the OOV-free inner-join scorer — batch trigrams are part
    // of the staged corpus LM by the planted-slice construction), accept
    // inside the staged band
    val lm = TextStats.lmCounts(spark, sfDir)
    val xB = batchDocs.select(col("doc_id"), toks(col("text")).as("t"))
    val tgP = transform(sequence(lit(1), size(col("t")) - 2),
      i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1),
        lit(" "), element_at(col("t"), i + 2)))
    val tgB = xB.filter(size(col("t")) >= 3).select(col("doc_id"), explode(tgP).as("p"))
    val p = (lit(0.7) * col("c3") / col("h2") + lit(0.2) * col("c2") / col("h1")
      + lit(0.1) * (col("c1") + lit(1)) / (col("n") + col("v")))
    val nl3B = tgB.join(lm.c3, "p")
      .join(lm.h2, substring_index(col("p"), " ", 2) === col("k2"))
      .join(lm.c2, substring_index(col("p"), " ", -2) === col("b"))
      .join(lm.h1,
        substring_index(substring_index(col("p"), " ", 2), " ", -1) === col("w1h"))
      .join(lm.c1, substring_index(col("p"), " ", -1) === col("w"))
      .crossJoin(broadcast(lm.nv))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tg"),
        (sum(round(log(lit(1.0) / p) * 1000000).cast(LongType)) / 1000000.0).as("nll3"))
      .select(col("doc_id"),
        round(col("nll3") * 1000 / col("n_tg"), 0).cast(LongType).as("nll3_milli"))
    val band = Curate.stagedBand(spark, sfDir)

    val h = pmod(md5Long(col("doc_id")), lit(100L))
    qB.join(exactKeepB, "doc_id")
      .join(dropNearB, Seq("doc_id"), "left_anti")
      .join(semDroppedB, Seq("doc_id"), "left_anti")
      .join(nl3B, "doc_id")
      .crossJoin(broadcast(band))
      .filter(col("n_tok") >= 20L && col("rep_milli") <= 300L &&
        col("nll3_milli") >= col("q05") && col("nll3_milli") <= col("q95"))
      .select(col("doc_id"),
        when(h < 80, "train").when(h < 90, "val").otherwise("test").as("split"),
        col("n_tok"), col("nll3_milli"))
  }

  val all: Seq[GraftQuery] = Seq(curateIncremental)
}
