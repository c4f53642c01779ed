package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data pipeline utilities (B10 extensions): deterministic dataset
  * split, context-window packing, and text scrubbing.
  */
object Pipeline {

  /** Hash-based train/val/test split (80/10/10).  Hash-of-key splitting is
    * THE reproducible way to split a 100 TB corpus: independent of
    * partitioning, stable under re-runs and appends, and trivially
    * mirrored by the oracle. */
  val split: GraftQuery = GraftQuery("q_llm_split",
    s"""SELECT doc_id, lang,
       |  CASE WHEN ${md5LongSql("doc_id")} % 100 < 80 THEN 'train'
       |       WHEN ${md5LongSql("doc_id")} % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin) { (spark, sfDir) =>
    val h = pmod(md5Long(col("doc_id")), lit(100L))
    documents(spark, sfDir).select(col("doc_id"), col("lang"),
      when(h < 80, "train").when(h < 90, "val").otherwise("test").as("split"))
  }

  /** Context-window packing: assign docs (in deterministic doc_id order) to
    * consecutive bins of <= 4096 tokens by cumulative token count — the
    * chunking step that batches documents into training sequences.  A
    * running integer sum over a total order, so both engines agree
    * exactly — computed by the distributed graft.fns.TotalOrder
    * range-partition + offset scheme, NOT a single-partition window
    * (plan-guarded: no Exchange SinglePartition). */
  val pack: GraftQuery = GraftQuery("q_llm_pack",
    s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok
       |           FROM documents),
       |c AS (SELECT doc_id, n_tok,
       |        CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |             - n_tok AS BIGINT) AS before
       |      FROM t)
       |SELECT doc_id, n_tok, before // 4096 AS bin, before % 4096 AS bin_offset
       |FROM c""".stripMargin) { (spark, sfDir) =>
    val t = documents(spark, sfDir)
      .select(col("doc_id"), size(toks(col("text"))).cast(LongType).as("n_tok"))
    graft.fns.TotalOrder.runningSum(t, "n_tok", graft.fns.TotalOrder.defaultParts(spark), col("doc_id"))
      .withColumn("before", col("cum") - col("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        floor(col("before").cast(DoubleType) / 4096).cast(LongType).as("bin"),
        pmod(col("before"), lit(4096L)).as("bin_offset"))
  }

  /** Scrubbing: mask digit runs and long tokens (the PII/noise-redaction
    * shape — same regex class works in Java and RE2). */
  val scrub: GraftQuery = GraftQuery("q_llm_scrub",
    """SELECT doc_id,
      |  regexp_replace(text, '[0-9]+', '<NUM>') AS scrubbed,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_masked
      |FROM documents""".stripMargin) { (spark, sfDir) =>
    documents(spark, sfDir).select(col("doc_id"),
      regexp_replace(col("text"), "[0-9]+", "<NUM>").as("scrubbed"),
      regexp_count(col("text"), lit("[0-9]+")).cast(LongType).as("n_masked"))
  }

  /** Benchmark DECONTAMINATION: flag training documents sharing any
    * 3-gram shingle with a held-out eval set (here: every 50th doc) — the
    * standard train/test-overlap scrub before pretraining.  Candidate
    * generation is an equi join on the shared 60-bit shingle hash between
    * the corpus index and the (small) eval index — at 100 TB the eval side
    * is broadcast and the corpus is scanned once; never all-pairs.
    * Output: contaminated train doc + strength of the overlap. */
  val decontaminate: GraftQuery = GraftQuery("q_llm_decontaminate",
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |sh AS (SELECT doc_id, ${md5LongSql("unnest")} AS s FROM (
       |         SELECT doc_id, unnest($shinglesSql) AS unnest
       |         FROM toks WHERE len(t) >= 3)),
       |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 50 = 0)
       |SELECT t.doc_id, count(*) AS n_hits,
       |       count(DISTINCT t.s) AS n_shingles_hit,
       |       count(DISTINCT ev.eval_id) AS n_eval_docs
       |FROM sh t JOIN ev ON t.s = ev.s AND t.doc_id % 50 <> 0
       |GROUP BY t.doc_id""".stripMargin) { (spark, sfDir) =>
    val sh = hashedShingles(spark, sfDir).select(col("doc_id"), col("h").as("s"))
    val ev = sh.filter(pmod(col("doc_id"), lit(50L)) === 0)
      .select(col("doc_id").as("eval_id"), col("s").as("s_ev"))
    sh.filter(pmod(col("doc_id"), lit(50L)) =!= 0)
      .join(broadcast(ev), col("s") === col("s_ev"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("s")).as("n_shingles_hit"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** Repetition-ratio quality signal: fraction of a document's 3-grams
    * that are duplicates (1 − distinct/total) — the cheap boilerplate/
    * degenerate-text detector every pretraining filter stack carries.
    * Row-local arithmetic on the token array; exact ratio of two small
    * integers, so the doubles agree bit-for-bit across engines. */
  val repetition: GraftQuery = GraftQuery("q_llm_repetition",
    s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents)
       |SELECT doc_id,
       |  CAST(len(t) - 2 AS BIGINT) AS n_grams,
       |  CAST(len($shinglesSql) AS BIGINT) AS n_distinct,
       |  CAST(1 AS DOUBLE) - CAST(len($shinglesSql) AS DOUBLE)
       |    / CAST(len(t) - 2 AS DOUBLE) AS rep_ratio
       |FROM t WHERE len(t) >= 3""".stripMargin) { (spark, sfDir) =>
    val t = toks(col("text"))
    val nGrams = (size(t) - 2).cast(LongType)
    val nDistinct = size(shingles(t)).cast(LongType)
    documents(spark, sfDir)
      .filter(size(t) >= 3)
      .select(col("doc_id"), nGrams.as("n_grams"), nDistinct.as("n_distinct"),
        (lit(1).cast(DoubleType) -
          nDistinct.cast(DoubleType) / nGrams.cast(DoubleType)).as("rep_ratio"))
  }

  /** Weighted corpus mixing: resample each language to a target rate —
    * above 1.0 means epoch-style upsampling (row replication), below 1.0
    * deterministic downsampling.  Rates are percent-scaled integers
    * (en 250% = 2.5 epochs, de 100%, es 50%, fr 25%, zh 10%): every row
    * gets `rate div 100` full copies plus one more iff its md5 draw falls
    * under `rate mod 100` — so expected multiplicity is exactly rate/100,
    * per-row decisions are pure functions of the key (reproducible,
    * append-stable, partitioning-independent), and the whole operator is
    * map-side only: no shuffle, no RNG state, mirrored exactly by the
    * oracle.  This is the domain-reweighting step of a pretraining data
    * recipe, built to run at 100 TB as a single scan + generate.
    */
  val mix: GraftQuery = GraftQuery("q_llm_mix",
    s"""WITH w AS (
       |  SELECT doc_id, lang,
       |    CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 100 WHEN 'es' THEN 50
       |              WHEN 'fr' THEN 25 ELSE 10 END AS r
       |  FROM documents),
       |k AS (
       |  SELECT doc_id, lang,
       |    r // 100 + CASE WHEN ${md5LongSql("doc_id")} % 100 < r % 100
       |                    THEN 1 ELSE 0 END AS copies
       |  FROM w)
       |SELECT doc_id, lang, CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy
       |FROM k WHERE copies >= 1""".stripMargin) { (spark, sfDir) =>
    val r = when(col("lang") === "en", 250L).when(col("lang") === "de", 100L)
      .when(col("lang") === "es", 50L).when(col("lang") === "fr", 25L)
      .otherwise(10L)
    val copies = call_function("div", r, lit(100L)) +
      when(pmod(md5Long(col("doc_id")), lit(100L)) < r % 100L, 1L).otherwise(0L)
    documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), copies.as("copies"))
      .filter(col("copies") >= 1L)
      // sequence(1, 0) would silently step DOWN; the filter above guards it
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("copies"))).as("copy"))
  }

  /** Data selection under a token budget: rank documents by a quality
    * signal (here: inverse repetition — milli-scaled distinct/total 3-gram
    * ratio) and keep the best prefix whose cumulative token count fits the
    * budget.  The greedy-prefix selection every "train on the best N
    * tokens" recipe uses; deterministic (integer score, doc_id tiebreak)
    * and exact in both engines.  The running sum is the distributed
    * graft.fns.TotalOrder range-partition + offset scheme — no
    * single-partition window (plan-guarded). */
  val selectBudget: GraftQuery = GraftQuery("q_llm_select_budget",
    s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
       |q AS (SELECT doc_id,
       |        CAST(len(t) AS BIGINT) AS n_tok,
       |        CAST(round(CAST(1000 * len($shinglesSql) AS BIGINT)
       |                   / CAST(len(t) - 2 AS DOUBLE), 0) AS BIGINT) AS score
       |      FROM t WHERE len(t) >= 3),
       |c AS (SELECT doc_id, n_tok, score,
       |        CAST(sum(n_tok) OVER (ORDER BY score DESC, doc_id
       |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
       |      FROM q)
       |SELECT doc_id, n_tok, score, cum_tok FROM c WHERE cum_tok <= 50000""".stripMargin) {
    (spark, sfDir) =>
      import org.apache.spark.sql.expressions.Window
      // one codegen'd kernel call per doc (tokenize + count distinct
      // shingles in a single pass); the composable toks/shingles column
      // formulation re-split the text once per reference and built the
      // full shingle-string array only to take its size — 5x slower
      val q = documents(spark, sfDir)
        .select(col("doc_id"),
          graft.fns.TextKernelCols.shingleStats(spark, col("text")).as("st"))
        .filter(col("st.n_tok") >= 3L)
        .select(col("doc_id"),
          col("st.n_tok").as("n_tok"),
          round((lit(1000L) * col("st.n_shingles")).cast(DoubleType) /
            (col("st.n_tok") - 2L).cast(DoubleType), 0).cast(LongType).as("score"))
      graft.fns.TotalOrder.runningSum(q, "n_tok", graft.fns.TotalOrder.defaultParts(spark), col("score").desc, col("doc_id"))
        .withColumnRenamed("cum", "cum_tok")
        .filter(col("cum_tok") <= 50000L)
        .select("doc_id", "n_tok", "score", "cum_tok")
  }

  /** Overlapping sliding-window chunking (the RAG / long-context
    * pretraining primitive `q_llm_split` does NOT cover — that one
    * assigns whole docs to train/val/test): windows of 32 tokens at
    * stride 24 (8-token overlap so no boundary context is lost), emitted
    * with exact offsets and the chunk text itself hash-checked.
    * Row-local: one tokenize + one explode per doc — map-only, linear,
    * no shuffle at any corpus size. */
  val chunk: GraftQuery = GraftQuery("q_llm_chunk",
    s"""WITH t0 AS (SELECT doc_id, $toksSql AS t FROM documents),
       |t AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM t0 WHERE len(t) >= 1),
       |ch AS (SELECT doc_id, t, n, unnest(range(0, (n + 23) // 24)) AS cid FROM t)
       |SELECT doc_id, CAST(cid AS BIGINT) AS cid, CAST(cid * 24 AS BIGINT) AS start_tok,
       |  CAST(least(cid * 24 + 32, n) - cid * 24 AS BIGINT) AS n_tok,
       |  array_to_string(t[cid * 24 + 1 : least(cid * 24 + 32, n)], ' ') AS chunk
       |FROM ch""".stripMargin) { (spark, sfDir) =>
    val base = documents(spark, sfDir)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .withColumn("n", size(col("t")).cast(LongType))
    base
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0L), expr("(n + 23) div 24") - 1L)).as("cid"))
      .select(col("doc_id"), col("cid"),
        (col("cid") * 24L).as("start_tok"),
        (least(col("cid") * 24L + 32L, col("n")) - col("cid") * 24L).as("n_tok"),
        concat_ws(" ", slice(col("t"), (col("cid") * 24L + 1L).cast("int"),
          (least(col("cid") * 24L + 32L, col("n")) - col("cid") * 24L).cast("int")))
          .as("chunk"))
  }

  /** CONTENT-DEFINED chunking (the rsync / storage-dedup boundary trick,
    * complementing [[chunk]]'s fixed windows): a chunk ends after any
    * token whose 60-bit hash ≡ 0 (mod 16), so boundaries are a pure
    * function of LOCAL CONTENT — insert a paragraph and only the chunks
    * touching it change identity, where fixed-stride windows all shift.
    * That stability is what makes chunk-level dedup/caching work across
    * corpus versions.  Expected chunk ≈ 16 tokens; the boundary decision
    * is the shared md5 arithmetic, so both engines cut identically.  One
    * doc-partitioned window pass + one aggregate — scales by doc, no
    * global order anywhere. */
  val chunkCdc: GraftQuery = GraftQuery("q_llm_chunk_cdc",
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |w AS (SELECT doc_id, t[i] AS w, CAST(i AS BIGINT) AS pos
       |      FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
       |b AS (SELECT doc_id, w, pos,
       |        CASE WHEN ${md5LongSql("w")} % 16 = 0 THEN 1 ELSE 0 END AS cut
       |      FROM w),
       |c AS (SELECT doc_id, w, pos,
       |        CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
       |             ROWS UNBOUNDED PRECEDING) - cut AS BIGINT) AS cid
       |      FROM b)
       |SELECT doc_id, cid, CAST(count(*) AS BIGINT) AS n_tok,
       |       min(pos) AS start_pos, string_agg(w, ' ' ORDER BY pos) AS chunk
       |FROM c GROUP BY doc_id, cid""".stripMargin) { (spark, sfDir) =>
    val w = documents(spark, sfDir)
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("p0", "w")))
      .select(col("doc_id"), col("w"), (col("p0") + 1L).as("pos"))
    val cut = when(pmod(md5Long(col("w")), lit(16L)) === 0, 1L).otherwise(0L)
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w.withColumn("cut", cut)
      .withColumn("cid", sum(col("cut")).over(win) - col("cut"))
      .groupBy("doc_id", "cid")
      .agg(count(lit(1)).as("n_tok"), min(col("pos")).as("start_pos"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          s => s.getField("w"))).as("chunk"))
  }

  val all: Seq[GraftQuery] =
    Seq(split, pack, scrub, decontaminate, repetition, mix, selectBudget, chunk,
      chunkCdc)
}
