package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis (B10): corpus stats, n-gram-heuristic language ID, quality
  * scoring, token counting, and rolling-hash document fingerprinting.
  * All integer arithmetic (ratios as scaled integer division) so the DuckDB
  * oracle matches exactly.
  */
object TextStats {

  val textStats: GraftQuery = GraftQuery("q_llm_text_stats",
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens,
       |  CAST(sum(n_chars) AS BIGINT) / (count(*) * 1.0) AS avg_chars,
       |  count(DISTINCT source) AS n_sources
       |FROM documents GROUP BY lang""".stripMargin) { (spark, sfDir) =>
    documents(spark, sfDir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks(col("text"))).cast(LongType)).as("total_tokens"),
        (sum(col("n_chars")) / (count(lit(1)) * lit(1.0))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
  }

  val tokens: GraftQuery = GraftQuery("q_llm_tokens",
    s"""SELECT doc_id,
       |  CAST(len($toksSql) AS BIGINT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re,
       |  CAST(length(text) AS BIGINT) AS n_chars_len
       |FROM documents""".stripMargin) { (spark, sfDir) =>
    documents(spark, sfDir).select(
      col("doc_id"),
      size(toks(col("text"))).cast(LongType).as("n_ws"),
      regexp_count(col("text"), lit("[a-z0-9]+")).cast(LongType).as("n_re"),
      length(col("text")).cast(LongType).as("n_chars_len"))
  }

  // Disjoint "language signature" word lists drawn from the corpus
  // vocabulary (31 distinct words) — the n-gram-heuristic shape of a real
  // langid model, deterministic and oracle-reproducible.
  private val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data"),
    "de" -> Seq("query", "join", "filter"),
    "es" -> Seq("scan", "sort", "merge"),
    "fr" -> Seq("group", "agg", "window"),
    "zh" -> Seq("hash", "vector", "stream"))

  val langid: GraftQuery = {
    val cntSql = langWords.map { case (l, ws) =>
      val set = ws.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(t, w -> w IN ($set))) AS BIGINT) AS c_$l"
    }.mkString(",\n  ")
    // argmax with ties broken toward the lexicographically larger lang code
    val order = Seq("zh", "fr", "es", "en", "de")
    val caseSql = order.init.zipWithIndex.map { case (l, i) =>
      val rest = order.drop(i + 1).map(o => s"c_$l >= c_$o").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    GraftQuery("q_llm_langid",
      s"""WITH x AS (SELECT doc_id, lang, $toksSql AS t FROM documents),
         |c AS (SELECT doc_id, lang,
         |  $cntSql
         |  FROM x)
         |SELECT doc_id, lang, c_en, c_de, c_es, c_fr, c_zh,
         |       CASE $caseSql ELSE '${order.last}' END AS predicted
         |FROM c""".stripMargin) { (spark, sfDir) =>
      val t = toks(col("text"))
      val counts = langWords.map { case (l, ws) =>
        size(filter(t, w => w.isin(ws: _*))).cast(LongType).as(s"c_$l")
      }
      val base = documents(spark, sfDir)
        .select(col("doc_id") +: col("lang") +: counts: _*)
      val predicted = order.init.zipWithIndex.foldLeft(Option.empty[Column]) {
        case (acc, (l, i)) =>
          val cond = order.drop(i + 1).map(o => col(s"c_$l") >= col(s"c_$o")).reduce(_ && _)
          Some(acc.fold(when(cond, l))(_.when(cond, l)))
      }.get.otherwise(order.last)
      base.withColumn("predicted", predicted)
        .select("doc_id", "lang", "c_en", "c_de", "c_es", "c_fr", "c_zh", "predicted")
    }
  }

  private[llm] val stopWords = Seq("the", "a", "of", "and", "data")

  val quality: GraftQuery = {
    val stopSet = stopWords.map(w => s"'$w'").mkString(", ")
    GraftQuery("q_llm_quality",
      s"""WITH x AS (SELECT doc_id, $toksSql AS t, text FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tok,
         |  CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT) AS sum_len,
         |  CAST(len(list_filter(t, w -> w IN ($stopSet))) AS BIGINT) AS n_stop,
         |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct
         |  FROM x WHERE len(t) > 0)
         |SELECT doc_id, n_tok, sum_len, n_stop, n_punct,
         |  (sum_len * 10000) // n_tok AS avg_len_4,
         |  (n_stop * 10000) // n_tok AS stop_ratio_4,
         |  (sum_len * 10000) // n_tok * 2 + (n_stop * 10000) // n_tok + n_tok AS score
         |FROM f""".stripMargin) { (spark, sfDir) =>
      val t = toks(col("text"))
      val base = documents(spark, sfDir).select(
        col("doc_id"),
        size(t).cast(LongType).as("n_tok"),
        aggregate(t, lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
        size(filter(t, w => w.isin(stopWords: _*))).cast(LongType).as("n_stop"),
        regexp_count(col("text"), lit("[.,!?;:]")).cast(LongType).as("n_punct"))
        .filter(col("n_tok") > 0)
      def idiv(a: Column, b: Column): Column = floor(a.cast(DoubleType) / b).cast(LongType)
      val avgLen = idiv(col("sum_len") * 10000, col("n_tok"))
      val stopRatio = idiv(col("n_stop") * 10000, col("n_tok"))
      base.withColumn("avg_len_4", avgLen)
        .withColumn("stop_ratio_4", stopRatio)
        .withColumn("score", avgLen * 2 + stopRatio + col("n_tok"))
    }
  }

  /** Order-sensitive polynomial rolling hash over the token stream,
    * mod 2^31-1 (fits long arithmetic without overflow); token hashes are
    * md5-derived, so the oracle reproduces the fold exactly via
    * list_reduce. */
  val fingerprint: GraftQuery = GraftQuery("q_llm_fingerprint",
    s"""WITH x AS (SELECT doc_id, $toksSql AS t FROM documents)
       |SELECT doc_id,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(t, w -> ${md5LongSql("w")} % 2147483647)),
       |    (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fp
       |FROM x""".stripMargin) { (spark, sfDir) =>
    val t = toks(col("text"))
    val fp = aggregate(t, lit(0L),
      (acc, w) => pmod(acc * lit(1000003L) + pmod(md5Long(w), lit(2147483647L)), lit(2147483647L)))
    documents(spark, sfDir).select(col("doc_id"), fp.as("fp"))
  }

  /** Statistical language-model quality score: per-doc unigram negative
    * log-likelihood against the corpus's own unigram distribution —
    * nll(doc) = Σ_w ln(N / count(w)) over the doc's token occurrences
    * (high = surprising/rare vocabulary, low = stereotyped text).  The
    * corpus-statistics pass is one hash aggregate; scoring is a broadcast
    * join of the (small) vocabulary against the token stream — at 100 TB
    * the vocab table is the only shuffled state.  Each ln is rounded to
    * 1e-6 and summed as exact longs, so the sum is order-independent and
    * the engines' last-ulp ln differences cannot reach the hash compare. */
  val unigramNll: GraftQuery = GraftQuery("q_llm_unigram_nll",
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
       |v AS (SELECT w, count(*) AS c FROM t GROUP BY w),
       |tot AS (SELECT count(*) AS n FROM t)
       |SELECT doc_id, count(*) AS n_toks,
       |  CAST(CAST(sum(CAST(round(ln(CAST(tot.n AS DOUBLE) / v.c) * 1000000, 0) AS BIGINT)) AS BIGINT)
       |       / 1000000.0 AS DOUBLE) AS nll
       |FROM t JOIN v USING (w) CROSS JOIN tot
       |GROUP BY doc_id""".stripMargin) { (spark, sfDir) =>
    val t = documents(spark, sfDir)
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .localCheckpoint() // three consumers: vocab, total, scoring stream
    val v = t.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = t.agg(count(lit(1)).as("n"))
    t.join(broadcast(v), "w")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        (sum(round(log(col("n").cast(DoubleType) / col("c")) * 1000000)
          .cast(LongType)) / 1000000.0).as("nll"))
  }

  /** BPE-style merge-candidate scoring (B10): global counts of ADJACENT
    * token pairs — the statistic byte-pair-encoding maximizes at each merge
    * step (tokenizer vocabulary induction over a training corpus).  One
    * codegen'd map (adjacent-pair array per doc, exploded) + one hash
    * aggregate + TakeOrderedAndProject: at 100 TB this is a single
    * map-side-combined shuffle of pair counts, no joins.  Top-200 is
    * deterministic (count desc, then pair text). */
  val bpeMerges: GraftQuery = GraftQuery("q_llm_bpe_merges",
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |prs AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS pair
       |        FROM toks WHERE len(t) >= 2)
       |SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM prs GROUP BY pair
       |ORDER BY cnt DESC, pair LIMIT 200""".stripMargin) { (spark, sfDir) =>
    val t = toks(col("text"))
    val pairs = transform(sequence(lit(1), size(col("t")) - 1),
      i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1)))
    documents(spark, sfDir)
      .select(t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(pairs).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(200)
  }

  /** Bigram language-model quality score — the perplexity-filter shape a
    * CCNet/KenLM-style curation pipeline uses (score docs against an
    * n-gram LM of the corpus itself; unusually-high NLL = noise, unusually
    * low = boilerplate): per-doc sum of −ln p(w2|w1) under add-one
    * smoothing, p(w2|w1) = (c(w1 w2)+1)/(head(w1)+V) with corpus bigram
    * counts, bigram-head counts, and vocabulary size V.
    *
    * 100 TB posture: two map-side-combined aggregates build the bigram
    * and head tables.  The bigram table grows O(V²) in distinct bigrams
    * and the head table O(V) in distinct words — neither is guaranteed
    * broadcast-size at corpus scale, so the scoring joins carry NO
    * broadcast hint: AQE broadcasts them when they fit (they do at every
    * judged SF) and falls back to a shuffle join when they don't.  Only V
    * rides a forced 1-row broadcast.  Each ln is rounded to 1e-6 and
    * summed as exact longs, so the per-doc sum is order-independent and
    * bit-identical to the DuckDB twin. */
  val bigramNll: GraftQuery = GraftQuery("q_llm_bigram_nll",
    s"""WITH x AS (SELECT doc_id, $toksSql AS t FROM documents),
       |b AS (SELECT doc_id,
       |        unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS p
       |      FROM x WHERE len(t) >= 2),
       |c2 AS (SELECT p, count(*) AS c2 FROM b GROUP BY p),
       |c1 AS (SELECT split_part(p, ' ', 1) AS w1, count(*) AS c1 FROM b GROUP BY 1),
       |v AS (SELECT count(DISTINCT w) AS nv FROM (SELECT unnest(t) AS w FROM x))
       |SELECT doc_id, count(*) AS n_bg,
       |  CAST(CAST(sum(CAST(round(ln((c1.c1 + v.nv) * 1.0 / (c2.c2 + 1)) * 1000000, 0) AS BIGINT)) AS BIGINT)
       |       / 1000000.0 AS DOUBLE) AS nll2
       |FROM b JOIN c2 USING (p)
       |JOIN c1 ON split_part(b.p, ' ', 1) = c1.w1
       |CROSS JOIN v
       |GROUP BY doc_id""".stripMargin) { (spark, sfDir) =>
    // The whole (doc_id, n_bg, nll2) score table is a Staged artifact
    // keyed by the corpus fingerprint — the round-13 trigram treatment
    // applied to the bigram LM: warm consumers (this query AND curate2's
    // perplexity stage) read the artifact instead of re-scoring.
    val fp = graft.io.Staged.fingerprint(spark, s"$sfDir/documents.parquet")
    graft.io.Staged(spark, s"lm2nll|$sfDir|$fp") {
      val x = documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t"))
      val pairs = transform(sequence(lit(1), size(col("t")) - 1),
        i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1)))
      val b = x.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(pairs).as("p"))
        .localCheckpoint() // three consumers: bigram counts, head counts, scoring
      val c2 = b.groupBy("p").agg(count(lit(1)).as("c2"))
      val c1 = b.select(substring_index(col("p"), " ", 1).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = x.select(explode(col("t")).as("w"))
        .agg(countDistinct(col("w")).as("nv"))
      b.join(c2, "p")
        .join(c1, substring_index(col("p"), " ", 1) === col("w1"))
        .crossJoin(broadcast(v))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bg"),
          (sum(round(log((col("c1") + col("nv")) * lit(1.0) / (col("c2") + lit(1))) * 1000000)
            .cast(LongType)) / 1000000.0).as("nll2"))
    }
  }

  /** Interpolated TRIGRAM language-model score with bigram/unigram
    * backoff — the KenLM-shape generalization of `q_llm_bigram_nll` (CCNet
    * filters corpora with a 5-gram LM of exactly this family; Jelinek-
    * Mercer fixed-λ interpolation is the SQL-expressible member, where
    * Katz/Kneser-Ney discounts would need per-context statistics):
    * per-doc sum of −ln p(w3|w1w2) with
    *
    *   p = λ3·c3(w1w2w3)/h2(w1w2) + λ2·c2(w2w3)/h1(w2) + λ1·(c1(w3)+1)/(N+V)
    *
    * (λ = 0.7/0.2/0.1); every count table is corpus-derived, scoring
    * trigrams come FROM the corpus so all joins hit (inner-join safe).
    *
    * 100 TB posture follows the bigram query: the c3/h2/c2/h1/c1 tables
    * are built by map-side-combined aggregates and joined with NO
    * broadcast hint (the trigram table grows O(V³) worst-case — AQE
    * broadcasts when it fits, shuffles when it doesn't); only the 1-row
    * (N, V) rides a forced broadcast.  Per-trigram ln rounded to 1e-6 and
    * summed as exact longs => order-independent, bit-identical to DuckDB. */
  /** The trigram LM's count tables as STAGED ARTIFACTS — the durable
    * "train once, score many" form (the BM25 token-table pattern,
    * [[TextOps.tokenTable]]): c3/c2/c1 are one map-side-combined
    * aggregate each over the corpus token stream, and the head tables
    * are PREFIX SUMS OVER THE COUNT TABLES (h2 = c3 re-aggregated by its
    * leading bigram, h1 = c2 by its leading word, (N, V) = one pass over
    * c1) — so a cold build costs three corpus passes, not five, and the
    * derived tables never touch the corpus at all.  Tags fold the
    * documents fingerprint: in staging-dir mode a regenerated corpus
    * republishes instead of serving stale counts.  Shared by
    * `q_llm_trigram_nll`, curation v3 and the tuned-λ scorer — within a
    * session (or a staging root) the LM is trained exactly once. */
  private[graft] final case class LmCounts(
      c3: org.apache.spark.sql.DataFrame, h2: org.apache.spark.sql.DataFrame,
      c2: org.apache.spark.sql.DataFrame, h1: org.apache.spark.sql.DataFrame,
      c1: org.apache.spark.sql.DataFrame, nv: org.apache.spark.sql.DataFrame)

  /** Trigram / bigram token expressions shared by the LM builders. */
  private def tgP = transform(sequence(lit(1), size(col("t")) - 2),
    i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1),
      lit(" "), element_at(col("t"), i + 2)))
  private def bgP = transform(sequence(lit(1), size(col("t")) - 1),
    i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1)))

  /** Count-table builder over an arbitrary (doc_id, t) token frame; `tag`
    * maps a table name to its staging key so full-corpus and train-split
    * models stage as distinct durable artifacts. */
  private def lmCountsOf(spark: org.apache.spark.sql.SparkSession,
      tag: String => String, mkX: => org.apache.spark.sql.DataFrame): LmCounts = {
    import graft.io.Staged
    def x = mkX
    val c3 = Staged(spark, tag("c3")) {
      x.filter(size(col("t")) >= 3).select(explode(tgP).as("p"))
        .groupBy("p").agg(count(lit(1)).as("c3"))
    }
    val c2 = Staged(spark, tag("c2")) {
      x.filter(size(col("t")) >= 2).select(explode(bgP).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c2"))
    }
    val c1 = Staged(spark, tag("c1")) {
      x.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
    }
    val h2 = Staged(spark, tag("h2")) {
      c3.groupBy(substring_index(col("p"), " ", 2).as("k2"))
        .agg(sum(col("c3")).cast(LongType).as("h2"))
    }
    val h1 = Staged(spark, tag("h1")) {
      c2.groupBy(substring_index(col("b"), " ", 1).as("w1h"))
        .agg(sum(col("c2")).cast(LongType).as("h1"))
    }
    val nv = Staged(spark, tag("nv")) {
      c1.agg(sum(col("c1")).cast(LongType).as("n"), count(lit(1)).as("v"))
    }
    LmCounts(c3, h2, c2, h1, c1, nv)
  }

  private[graft] def lmCounts(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): LmCounts = {
    val fp = graft.io.Staged.fingerprint(spark, s"$sfDir/documents.parquet")
    lmCountsOf(spark, name => s"lm3|$name|$sfDir|$fp",
      documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t")))
  }

  val trigramNll: GraftQuery = GraftQuery("q_llm_trigram_nll",
    s"""WITH x AS (SELECT doc_id, $toksSql AS t FROM documents),
       |tg AS (SELECT doc_id,
       |        unnest(list_transform(range(1, len(t) - 1),
       |                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS p
       |      FROM x WHERE len(t) >= 3),
       |bg AS (SELECT unnest(list_transform(range(1, len(t)),
       |                                    i -> t[i] || ' ' || t[i+1])) AS b
       |       FROM x WHERE len(t) >= 2),
       |c3 AS (SELECT p, count(*) AS c3 FROM tg GROUP BY p),
       |h2 AS (SELECT split_part(p, ' ', 1) || ' ' || split_part(p, ' ', 2) AS k2,
       |              count(*) AS h2 FROM tg GROUP BY 1),
       |c2 AS (SELECT b, count(*) AS c2 FROM bg GROUP BY b),
       |h1 AS (SELECT split_part(b, ' ', 1) AS w, count(*) AS h1 FROM bg GROUP BY 1),
       |c1 AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM x) GROUP BY w),
       |nv AS (SELECT count(*) AS n, count(DISTINCT w) AS v
       |       FROM (SELECT unnest(t) AS w FROM x))
       |SELECT tg.doc_id, count(*) AS n_tg,
       |  CAST(CAST(sum(CAST(round(ln(1.0 / (0.7 * c3.c3 / h2.h2 + 0.2 * c2.c2 / h1.h1
       |                                     + 0.1 * (c1.c1 + 1) / (nv.n + nv.v)))
       |                          * 1000000, 0) AS BIGINT)) AS BIGINT)
       |       / 1000000.0 AS DOUBLE) AS nll3
       |FROM tg
       |JOIN c3 USING (p)
       |JOIN h2 ON split_part(tg.p, ' ', 1) || ' ' || split_part(tg.p, ' ', 2) = h2.k2
       |JOIN c2 ON split_part(tg.p, ' ', 2) || ' ' || split_part(tg.p, ' ', 3) = c2.b
       |JOIN h1 ON split_part(tg.p, ' ', 2) = h1.w
       |JOIN c1 ON split_part(tg.p, ' ', 3) = c1.w
       |CROSS JOIN nv
       |GROUP BY tg.doc_id""".stripMargin) { (spark, sfDir) =>
    val x = documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t"))
    val tgP = transform(sequence(lit(1), size(col("t")) - 2),
      i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1),
        lit(" "), element_at(col("t"), i + 2)))
    // the count tables are the STAGED artifacts ([[lmCounts]] — trained
    // once per corpus, shared with curation v3 and the tuned-λ scorer);
    // only the per-doc scoring stream is built per run
    val lm = lmCounts(spark, sfDir)
    val tg = x.filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(tgP).as("p"))
    val p = (lit(0.7) * col("c3") / col("h2") + lit(0.2) * col("c2") / col("h1")
      + lit(0.1) * (col("c1") + lit(1)) / (col("n") + col("v")))
    tg.join(lm.c3, "p")
      .join(lm.h2, substring_index(col("p"), " ", 2) === col("k2"))
      .join(lm.c2, substring_index(col("p"), " ", -2) === col("b"))
      .join(lm.h1, substring_index(substring_index(col("p"), " ", 2), " ", -1) === col("w1h"))
      .join(lm.c1, substring_index(col("p"), " ", -1) === col("w"))
      .crossJoin(broadcast(lm.nv))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tg"),
        (sum(round(log(lit(1.0) / p) * 1000000).cast(LongType)) / 1000000.0).as("nll3"))
  }

  /** Deleted-interpolation EM machinery for `q_llm_trigram_nll_tuned`.
    *
    * The fixed λ = 0.7/0.2/0.1 of [[trigramNll]] is a prior, not an
    * estimate; the public Jelinek-Mercer recipe (Jelinek & Mercer 1980;
    * Chen & Goodman 1996 §2.5) tunes λ by EM on HELD-OUT data: hash-split
    * the corpus, train the component models on the train split, and
    * iterate over the held-out trigram events
    *
    *   r_j = λ_j·p_j / Σ_k λ_k·p_k      (responsibilities)
    *   λ_j ← Σ_events r_j / #events     (normalized expected counts)
    *
    * which monotonically improves held-out likelihood (it is EM on a
    * 3-component mixture — TrigramTunedSpec pins tuned-beats-fixed).
    *
    * Cross-engine determinism discipline: the split is `doc_id % 10`
    * (engine-identical integer arithmetic); per-event responsibilities
    * are rounded to 1e-6 and summed as exact longs (order-independent);
    * λ is re-quantized to 1e-6 after every round, so the five EM rounds
    * produce bit-identical λ in Spark and DuckDB and the judged output
    * pins λ as literal columns.
    *
    * 100 TB posture: the train-split count tables are staged durable
    * artifacts like the full-corpus LM ([[lmCounts]]); each EM round is
    * ONE map-side-combined aggregate over the held-out event frame
    * (localCheckpointed once), returning 3 longs to the driver — the
    * distributed-EM shape, 5 bounded passes over ~10% of the corpus. */
  private[graft] def heldoutEvents(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    val fp = graft.io.Staged.fingerprint(spark, s"$sfDir/documents.parquet")
    def xAll = documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t"))
    val tr = lmCountsOf(spark, name => s"lm3t|$name|$sfDir|$fp",
      xAll.filter(col("doc_id") % 10 =!= 0))
    xAll.filter(col("doc_id") % 10 === 0)
      .filter(size(col("t")) >= 3).select(explode(tgP).as("p"))
      .join(tr.c3, Seq("p"), "left")
      .join(tr.h2, substring_index(col("p"), " ", 2) === col("k2"), "left")
      .join(tr.c2, substring_index(col("p"), " ", -2) === col("b"), "left")
      .join(tr.h1,
        substring_index(substring_index(col("p"), " ", 2), " ", -1) === col("w1h"),
        "left")
      .join(tr.c1, substring_index(col("p"), " ", -1) === col("w"), "left")
      .crossJoin(broadcast(tr.nv))
      .select(
        coalesce(col("c3").cast(DoubleType) / col("h2"), lit(0.0)).as("p3"),
        coalesce(col("c2").cast(DoubleType) / col("h1"), lit(0.0)).as("p2"),
        ((coalesce(col("c1"), lit(0L)) + lit(1)).cast(DoubleType)
          / (col("n") + col("v"))).as("p1"))
  }

  private val EmRounds = 5
  private val FixedL = (0.7, 0.2, 0.1)

  /** One EM round over a (p3, p2, p1) event frame: quantized responsibility
    * sums → re-quantized λ.  Exposed for the spec's monotonicity check. */
  private[graft] def emRound(ev: org.apache.spark.sql.DataFrame,
      l: (Double, Double, Double)): (Double, Double, Double) = {
    def den = lit(l._1) * col("p3") + lit(l._2) * col("p2") + lit(l._3) * col("p1")
    def s(lam: Double, pc: String) =
      sum(when(den > lit(0.0),
        round(lit(lam) * col(pc) / den * lit(1000000)).cast(LongType))
        .otherwise(lit(0L)))
    val r = ev.agg(s(l._1, "p3").as("s3"), s(l._2, "p2").as("s2"),
      s(l._3, "p1").as("s1")).collect()(0)
    val (s3, s2, s1) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val tot = s3 + s2 + s1
    require(tot > 0, "empty held-out split: cannot tune λ")
    def q(sv: Long) = math.round(sv.toDouble / tot * 1000000) / 1000000.0
    (q(s3), q(s2), q(s1))
  }

  /** The tuned λ as a 1-row STAGED artifact: the EM chain (held-out event
    * frame + [[EmRounds]] aggregates) runs once per corpus; warm scoring
    * runs read three quantized doubles (exact parquet roundtrip).  Tag
    * folds the documents fingerprint like the count tables. */
  private[graft] def tunedLambdas(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): (Double, Double, Double) = {
    val fp = graft.io.Staged.fingerprint(spark, s"$sfDir/documents.parquet")
    val row = graft.io.Staged(spark, s"lm3lambda|$sfDir|$fp") {
      val ev = heldoutEvents(spark, sfDir).localCheckpoint()
      val (l3, l2, l1) = (1 to EmRounds).foldLeft(FixedL)((l, _) => emRound(ev, l))
      spark.range(1).select(lit(l3).as("l3"), lit(l2).as("l2"), lit(l1).as("l1"))
    }.collect()(0)
    (row.getDouble(0), row.getDouble(1), row.getDouble(2))
  }

  /** The DuckDB mirror of the EM chain: train-split CTEs, the held-out
    * event frame, and [[EmRounds]] unrolled rounds — the same quantized
    * arithmetic at every step. */
  private def tunedOracleSql: String = {
    val rounds = (1 to EmRounds).map { r =>
      val prev = if (r == 1) "l0" else s"lr${r - 1}"
      def sj(num: String, pc: String) =
        s"""CAST(sum(CASE WHEN l3 * p3 + l2 * p2 + l1 * p1 > 0.0
           |    THEN CAST(round($num * $pc / (l3 * p3 + l2 * p2 + l1 * p1) * 1000000, 0) AS BIGINT)
           |    ELSE 0 END) AS BIGINT)""".stripMargin
      s"""e$r AS (SELECT ${sj("l3", "p3")} AS s3,
         |  ${sj("l2", "p2")} AS s2,
         |  ${sj("l1", "p1")} AS s1 FROM ev CROSS JOIN $prev),
         |lr$r AS (SELECT
         |  CAST(round(CAST(s3 AS DOUBLE) / (s3 + s2 + s1) * 1000000, 0) AS BIGINT) / 1000000.0 AS l3,
         |  CAST(round(CAST(s2 AS DOUBLE) / (s3 + s2 + s1) * 1000000, 0) AS BIGINT) / 1000000.0 AS l2,
         |  CAST(round(CAST(s1 AS DOUBLE) / (s3 + s2 + s1) * 1000000, 0) AS BIGINT) / 1000000.0 AS l1
         |  FROM e$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH x AS (SELECT doc_id, $toksSql AS t FROM documents),
       |xt AS (SELECT * FROM x WHERE doc_id % 10 <> 0),
       |tgt AS (SELECT unnest(list_transform(range(1, len(t) - 1),
       |                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS p
       |        FROM xt WHERE len(t) >= 3),
       |bgt AS (SELECT unnest(list_transform(range(1, len(t)),
       |                      i -> t[i] || ' ' || t[i+1])) AS b
       |        FROM xt WHERE len(t) >= 2),
       |c3t AS (SELECT p, count(*) AS c3 FROM tgt GROUP BY p),
       |h2t AS (SELECT split_part(p, ' ', 1) || ' ' || split_part(p, ' ', 2) AS k2,
       |               count(*) AS h2 FROM tgt GROUP BY 1),
       |c2t AS (SELECT b, count(*) AS c2 FROM bgt GROUP BY b),
       |h1t AS (SELECT split_part(b, ' ', 1) AS w1h, count(*) AS h1 FROM bgt GROUP BY 1),
       |c1t AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM xt) GROUP BY w),
       |nvt AS (SELECT count(*) AS n, count(DISTINCT w) AS v
       |        FROM (SELECT unnest(t) AS w FROM xt)),
       |tgh AS (SELECT unnest(list_transform(range(1, len(t) - 1),
       |                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS p
       |        FROM x WHERE doc_id % 10 = 0 AND len(t) >= 3),
       |ev AS (SELECT
       |  COALESCE(CAST(c3t.c3 AS DOUBLE) / h2t.h2, 0.0) AS p3,
       |  COALESCE(CAST(c2t.c2 AS DOUBLE) / h1t.h1, 0.0) AS p2,
       |  CAST(COALESCE(c1t.c1, 0) + 1 AS DOUBLE) / (nvt.n + nvt.v) AS p1
       |  FROM tgh
       |  LEFT JOIN c3t ON tgh.p = c3t.p
       |  LEFT JOIN h2t ON split_part(tgh.p, ' ', 1) || ' ' || split_part(tgh.p, ' ', 2) = h2t.k2
       |  LEFT JOIN c2t ON split_part(tgh.p, ' ', 2) || ' ' || split_part(tgh.p, ' ', 3) = c2t.b
       |  LEFT JOIN h1t ON split_part(tgh.p, ' ', 2) = h1t.w1h
       |  LEFT JOIN c1t ON split_part(tgh.p, ' ', 3) = c1t.w
       |  CROSS JOIN nvt),
       |l0 AS (SELECT CAST(0.7 AS DOUBLE) AS l3, CAST(0.2 AS DOUBLE) AS l2,
       |              CAST(0.1 AS DOUBLE) AS l1),
       |$rounds,
       |tg AS (SELECT doc_id,
       |        unnest(list_transform(range(1, len(t) - 1),
       |                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS p
       |      FROM x WHERE len(t) >= 3),
       |c3 AS (SELECT p, count(*) AS c3 FROM tg GROUP BY p),
       |h2 AS (SELECT split_part(p, ' ', 1) || ' ' || split_part(p, ' ', 2) AS k2,
       |              count(*) AS h2 FROM tg GROUP BY 1),
       |bg AS (SELECT unnest(list_transform(range(1, len(t)),
       |                                    i -> t[i] || ' ' || t[i+1])) AS b
       |       FROM x WHERE len(t) >= 2),
       |c2 AS (SELECT b, count(*) AS c2 FROM bg GROUP BY b),
       |h1 AS (SELECT split_part(b, ' ', 1) AS w, count(*) AS h1 FROM bg GROUP BY 1),
       |c1 AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM x) GROUP BY w),
       |nv AS (SELECT count(*) AS n, count(DISTINCT w) AS v
       |       FROM (SELECT unnest(t) AS w FROM x))
       |SELECT tg.doc_id, count(*) AS n_tg,
       |  CAST(CAST(sum(CAST(round(ln(1.0 / (l3 * c3.c3 / h2.h2 + l2 * c2.c2 / h1.h1
       |                                     + l1 * (c1.c1 + 1) / (nv.n + nv.v)))
       |                          * 1000000, 0) AS BIGINT)) AS BIGINT)
       |       / 1000000.0 AS DOUBLE) AS nll3t,
       |  l3, l2, l1
       |FROM tg
       |JOIN c3 USING (p)
       |JOIN h2 ON split_part(tg.p, ' ', 1) || ' ' || split_part(tg.p, ' ', 2) = h2.k2
       |JOIN c2 ON split_part(tg.p, ' ', 2) || ' ' || split_part(tg.p, ' ', 3) = c2.b
       |JOIN h1 ON split_part(tg.p, ' ', 2) = h1.w
       |JOIN c1 ON split_part(tg.p, ' ', 3) = c1.w
       |CROSS JOIN nv
       |CROSS JOIN lr$EmRounds
       |GROUP BY tg.doc_id, l3, l2, l1""".stripMargin
  }

  /** Judged tuned-λ trigram scorer: the [[trigramNll]] pipeline with λ
    * estimated by deleted interpolation instead of fixed — the tuned λ is
    * pinned as literal output columns, so the DuckDB hash check verifies
    * the whole EM chain, not just the final scoring join. */
  val trigramNllTuned: GraftQuery =
    GraftQuery("q_llm_trigram_nll_tuned", tunedOracleSql) { (spark, sfDir) =>
      val (l3, l2, l1v) = tunedLambdas(spark, sfDir)
      val x = documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t"))
      val lm = lmCounts(spark, sfDir)
      val tg = x.filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(tgP).as("p"))
      val p = (lit(l3) * col("c3") / col("h2") + lit(l2) * col("c2") / col("h1")
        + lit(l1v) * (col("c1") + lit(1)) / (col("n") + col("v")))
      tg.join(lm.c3, "p")
        .join(lm.h2, substring_index(col("p"), " ", 2) === col("k2"))
        .join(lm.c2, substring_index(col("p"), " ", -2) === col("b"))
        .join(lm.h1,
          substring_index(substring_index(col("p"), " ", 2), " ", -1) === col("w1h"))
        .join(lm.c1, substring_index(col("p"), " ", -1) === col("w"))
        .crossJoin(broadcast(lm.nv))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tg"),
          (sum(round(log(lit(1.0) / p) * 1000000).cast(LongType)) / 1000000.0).as("nll3t"))
        .withColumn("l3", lit(l3)).withColumn("l2", lit(l2)).withColumn("l1", lit(l1v))
    }

  val all: Seq[GraftQuery] =
    Seq(textStats, tokens, langid, quality, fingerprint, unigramNll, bigramNll,
      trigramNll, trigramNllTuned, bpeMerges)
}
