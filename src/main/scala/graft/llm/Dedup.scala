package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
import graft.fns.VecExpressions.vecDot
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication family (B10): exact hash dedup, n-gram Jaccard, MinHash+LSH
  * near-dedup, SimHash near-dedup, and embedding-cosine near-dedup.
  *
  * 100 TB posture: every variant is candidate-generation via *equi join on a
  * derived key* (hash, LSH band, simhash band, cluster id) — never an
  * all-pairs product.  All hashes are md5-derived 60-bit integers shared
  * with the DuckDB oracle, so even the LSH pipelines are exactly
  * reproducible and hash-checked, not just property-tested.
  */
object Dedup {

  // ------------------------------------------------------------- exact
  val dedupExact: GraftQuery = GraftQuery("q_llm_dedup_exact",
    """SELECT sha256(lower(trim(text))) AS h, min(doc_id) AS keep_id,
      |       count(*) AS dups
      |FROM documents GROUP BY 1""".stripMargin) { (spark, sfDir) =>
    documents(spark, sfDir)
      .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dups"))
  }

  // ------------------------------------------- n-gram Jaccard (exact)
  /** Exact near-dup pairs by 3-gram-shingle Jaccard >= tau, via a
    * df-capped inverted shingle index (explode + self-equi-join on
    * shingle) — shuffle-parallel.  The cap (TextOps.DF_CAP) bounds the
    * self-join at DF_CAP · |postings| — linear in the corpus — where the
    * uncapped index would cost sum(df²) and blow up quadratically on hot
    * boilerplate shingles at 100 TB. */
  private val NGRAM_TAU = 0.3

  /** Shared DuckDB CTE chain: capped index -> doc sizes -> pair counts.
    * Expects a `toks(doc_id, t)` CTE upstream; yields `sh`, `sz`, `p`. */
  private[llm] val pairCtesSql: String =
    s"""sh0 AS (SELECT doc_id, ${md5LongSql("unnest")} AS s FROM (
       |         SELECT doc_id, unnest($shinglesSql) AS unnest
       |         FROM toks WHERE len(t) >= 3)),
       |sh AS (${dfCappedSql(DF_CAP)}),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS common
       |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)""".stripMargin

  /** Candidate pairs with exact Jaccard over a (doc_id, s) shingle index
    * (normally the df-capped one).  Returns (ia, ib, common, na, nb, jacc)
    * for every co-occurring pair; callers filter on jacc.  Sizes (na/nb)
    * are measured over the same index the pairs come from, so the Jaccard
    * is exactly the oracle's. */
  private[graft] def jaccardPairs(sh: DataFrame): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val jacc = col("common") / (col("na") + col("nb") - col("common"))
    sh.select(col("doc_id").as("ia"), col("s"))
      .join(sh.select(col("doc_id").as("ib"), col("s").as("s2")),
        col("s") === col("s2") && col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("common"))
      .join(sz.select(col("doc_id"), col("n").as("na")), col("ia") === col("doc_id")).drop("doc_id")
      .join(sz.select(col("doc_id"), col("n").as("nb")), col("ib") === col("doc_id")).drop("doc_id")
      .withColumn("jacc", jacc)
  }

  val dedupNgram: GraftQuery = GraftQuery("q_llm_dedup_ngram",
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |$pairCtesSql
       |SELECT ia, ib, common, x.n AS na, y.n AS nb,
       |       common / (x.n + y.n - common) AS jacc
       |FROM p JOIN sz x ON ia = x.doc_id JOIN sz y ON ib = y.doc_id
       |WHERE common / (x.n + y.n - common) >= $NGRAM_TAU""".stripMargin) { (spark, sfDir) =>
    // The inverted index carries 60-bit shingle hashes, not strings: ~3x
    // less shuffle volume through the candidate join (collisions at 2^-60
    // are immaterial and the oracle hashes identically).  The capped index
    // is the session-staged one shared with clustering.
    jaccardPairs(cappedShingles(spark, sfDir))
      .filter(col("jacc") >= NGRAM_TAU)
      .select("ia", "ib", "common", "na", "nb", "jacc")
  }

  // ------------------------------------------------- MinHash + LSH
  private val K = 16   // signature length
  private val BANDS = 4 // bands of 4 rows each
  private val ROWS = K / BANDS
  private val MH_TAU = 0.5
  // Universal hash family over one md5 base hash: h_j = (a_j*h + b_j) mod P.
  // One md5 per shingle instead of K (md5 is the dominant cost); the affine
  // family is codegen'd integer arithmetic and reproduced verbatim in the
  // oracle SQL.  P = 2^31-1 keeps a_j*h below 2^62 (no signed overflow).
  private val P = 2147483647L
  private val (hashA, hashB) = {
    val rng = new scala.util.Random(1234)
    ((0 until K).map(_ => 1L + rng.nextInt(Int.MaxValue - 1)),
      (0 until K).map(_ => rng.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash(16) signatures -> 4-row LSH bands -> candidate pairs by band
    * equi-join -> exact Jaccard verification.  Fully deterministic (seeded
    * md5 hash family), hence oracle-checked end to end.
    *
    * Signatures are row-local array expressions (`array_min(transform(...))`
    * over the shingle array) — zero shuffle until the band join, so at
    * 100 TB this is one scan + one hash-partitioned candidate join, and the
    * Jaccard verify rides along on the joined shingle arrays. */
  val dedupNear: GraftQuery = {
    val baseSql = s"(${md5LongSql("s")} % $P)"
    def hSql(j: Int) = s"((${hashA(j)} * hb + ${hashB(j)}) % $P)"
    val minsSql = (0 until K).map(j => s"min(${hSql(j)}) AS m$j").mkString(", ")
    def bandStrSql(b: Int) = (b * ROWS until (b + 1) * ROWS)
      .map(j => s"m$j::VARCHAR").mkString(" || ',' || ")
    val bandCases = (0 until BANDS).map(b => s"WHEN $b THEN ${bandStrSql(b)}").mkString(" ")
    GraftQuery("q_llm_dedup_near",
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |shing AS (SELECT doc_id, unnest($shinglesSql) AS s
         |          FROM toks WHERE len(t) >= 3),
         |sh AS (SELECT doc_id, ${md5LongSql("s")} AS hs, $baseSql AS hb FROM shing),
         |sig AS (SELECT doc_id, $minsSql, list(hs) AS sh FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, sh, b, CASE b $bandCases END AS bs,
         |          ${(0 until BANDS - 1).map(j => s"${bandStrSql(j)} AS bs$j").mkString(", ")}
         |          FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) tb(b)),
         |cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib, a.sh AS sha, b.sh AS shb
         |         FROM bands a JOIN bands b
         |           ON a.b = b.b AND a.bs = b.bs AND a.doc_id < b.doc_id
         |         WHERE NOT (${(0 until BANDS - 1).map(j =>
                     s"(a.b > $j AND a.bs$j = b.bs$j)").mkString(" OR ")})),
         |j AS (SELECT ia, ib,
         |        len(list_filter(sha, e -> list_contains(shb, e))) AS common,
         |        len(sha) AS na, len(shb) AS nb
         |      FROM cand)
         |SELECT ia, ib, common / (na + nb - common) AS jacc
         |FROM j WHERE common / (na + nb - common) >= $MH_TAU""".stripMargin) { (spark, sfDir) =>
      // Shape note: explode + ONE hash aggregate (min x16 + collect_list in
      // the same groupBy) keeps everything in WholeStageCodegen (array
      // lambdas would be interpreted), and ONE md5 per shingle feeds the
      // whole affine hash family.  Shingles come from the session-staged
      // shared table.
      val sh = hashedShingles(spark, sfDir)
        .select(col("doc_id"), col("h").as("hs"), pmod(col("h"), lit(P)).as("hb"))
      // The Jaccard-verify arrays carry the 60-bit shingle hashes, not the
      // raw strings: ~3x less signature shuffle and long-array intersects
      // (collisions at 2^-60 are immaterial; the oracle hashes identically).
      val sig = sh.groupBy("doc_id")
        .agg(min(pmod(col("hb") * hashA(0) + hashB(0), lit(P))).as("m0"),
          (1 until K).map(j =>
            min(pmod(col("hb") * hashA(j) + hashB(j), lit(P))).as(s"m$j")) :+
            collect_list(col("hs")).as("sh"): _*)
        // the band self-join references this subplan twice; materialize it
        // once (cluster analog: persist the signature table)
        .localCheckpoint()
      def bandStr(b: Int) = concat_ws(",", (b * ROWS until (b + 1) * ROWS)
        .map(j => col(s"m$j").cast(StringType)): _*)
      val bandStructs = (0 until BANDS).map(b => struct(lit(b).as("b"), bandStr(b).as("bs")))
      // Pairs are emitted from their FIRST matching band only (no earlier
      // band equal), so the candidate set is duplicate-free by construction
      // — the groupBy(ia,ib) dedup shuffle, which carried both signature
      // arrays, disappears entirely.
      val bands = sig.select(col("doc_id") +: col("sh") +:
          (0 until BANDS - 1).map(j => bandStr(j).as(s"bs$j")) :+
          explode(array(bandStructs: _*)).as("x"): _*)
        .select(col("doc_id"), col("sh"), col("bs0"), col("bs1"), col("bs2"),
          col("x.b").as("b"), col("x.bs").as("bs"))
      val firstMatch = (0 until BANDS - 1).map { j =>
        !(col("b") > j && col(s"abs$j") === col(s"bbs$j"))
      }.reduce(_ && _)
      val cand = bands.select(col("doc_id").as("ia"), col("sh").as("sha"), col("b"), col("bs"),
          col("bs0").as("abs0"), col("bs1").as("abs1"), col("bs2").as("abs2"))
        .join(bands.select(col("doc_id").as("ib"), col("sh").as("shb"),
          col("b").as("b2"), col("bs").as("bs2"),
          col("bs0").as("bbs0"), col("bs1").as("bbs1"), col("bs2").as("bbs2")),
          col("b") === col("b2") && col("bs") === col("bs2") && col("ia") < col("ib"))
        .filter(firstMatch)
        .select(col("ia"), col("ib"), col("sha"), col("shb"))
      val common = size(array_intersect(col("sha"), col("shb")))
      val jacc = common / (size(col("sha")) + size(col("shb")) - common)
      cand.filter(jacc >= MH_TAU)
        .select(col("ia"), col("ib"), jacc.as("jacc"))
    }
  }

  // --------------------------------------------------------- SimHash
  // 48 bits in 4 x 12-bit bands: band-collision probability for unrelated
  // docs drops 16x vs 8-bit bands (the corpus' shared vocabulary makes
  // simhashes correlate, so narrow bands go quadratic in candidates).
  // Recall guarantee: hamming <= 3 implies at least one identical band.
  private val SH_BITS = 48
  private val SH_BANDS = 4 // 12-bit bands
  private val SH_MAXHAM = 6

  /** 48-bit SimHash over distinct tokens; candidates share >= 1 of 4 12-bit
    * bands (guarantees recall for hamming <= 3; verified filter <= 6).
    *
    * Bit-sliced counting: instead of 48 separate +-1 sum aggregates (which
    * blows up generated code), the 48 per-bit vote counters are packed as
    * 8-bit lanes into 6 long accumulators — `sum` of a "spread" word whose
    * byte i holds bit (8g+i) of the token hash.  Decode: bit b of the
    * simhash is set iff 2*count_b >= n_tokens.  Docs are capped at 127
    * distinct tokens so no lane can overflow (127 * 2^56 < 2^63).  The
    * oracle reproduces the identical packed arithmetic. */
  val dedupSimhash: GraftQuery = {
    val GROUPS = SH_BITS / 8
    def spreadSql(g: Int) = (0 until 8)
      .map(i => s"(((h >> ${8 * g + i}) & 1) << ${8 * i})").mkString(" + ")
    val accSql = (0 until GROUPS)
      .map(g => s"CAST(sum(${spreadSql(g)}) AS BIGINT) AS acc$g").mkString(", ")
    def bitSql(b: Int) = {
      val g = b / 8; val i = b % 8
      s"(CASE WHEN 2 * ((acc$g >> ${8 * i}) & 255) >= n THEN ${1L << b} ELSE 0 END)"
    }
    val simSql = (0 until SH_BITS).map(bitSql).mkString(" + ")
    GraftQuery("q_llm_dedup_simhash",
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |w AS (SELECT doc_id, unnest(list_distinct(t)[1:127]) AS w FROM toks),
         |h AS (SELECT doc_id, ${md5LongSql("w")} AS h FROM w),
         |s AS (SELECT doc_id, $accSql, count(*) AS n FROM h GROUP BY doc_id),
         |sim AS (SELECT doc_id, $simSql AS simhash FROM s),
         |bands AS (SELECT doc_id, simhash, k, (simhash >> (12 * k)) & 4095 AS bv
         |          FROM sim CROSS JOIN (VALUES (0), (1), (2), (3)) t(k))
         |SELECT a.doc_id AS ia, b.doc_id AS ib,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham
         |FROM bands a JOIN bands b
         |  ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SH_MAXHAM
         |  AND NOT (${(0 until SH_BANDS - 1).map(j =>
             s"(a.k > $j AND ((a.simhash >> ${12 * j}) & 4095) = ((b.simhash >> ${12 * j}) & 4095))")
             .mkString(" OR ")})""".stripMargin) { (spark, sfDir) =>
      // Shape note: one codegen'd kernel (distinct tokens -> md5 hashes) +
      // explode + one hash aggregate — array-lambda folds would leave
      // WholeStageCodegen (interpreted).
      val w = documents(spark, sfDir).select(col("doc_id"),
        explode(graft.fns.TextKernelCols.distinctTokenHashes127(spark, col("text"))).as("h"))
      def spread(g: Int) = (0 until 8)
        .map(i => shiftleft(shiftright(col("h"), 8 * g + i).bitwiseAND(lit(1L)), 8 * i))
        .reduce(_ + _)
      val sums = w.groupBy("doc_id")
        .agg(sum(spread(0)).as("acc0"),
          (1 until GROUPS).map(g => sum(spread(g)).as(s"acc$g")) :+
            count(lit(1)).as("n"): _*)
      def bitOf(b: Int) = {
        val g = b / 8; val i = b % 8
        when(shiftright(col(s"acc$g"), 8 * i).bitwiseAND(lit(255L)) * 2 >= col("n"),
          lit(1L << b)).otherwise(lit(0L))
      }
      val simhash = (0 until SH_BITS).map(bitOf).reduce(_ + _)
      val sim = sums.select(col("doc_id"), simhash.as("simhash"))
        .localCheckpoint() // band self-join references this twice
      val bandStructs = (0 until SH_BANDS).map(k =>
        struct(lit(k).as("k"), shiftright(col("simhash"), 12 * k).bitwiseAND(lit(4095L)).as("bv")))
      val bands = sim.select(col("doc_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("x"))
        .select(col("doc_id"), col("simhash"), col("x.k").as("k"), col("x.bv").as("bv"))
      val ham = bit_count(col("sha").bitwiseXOR(col("shb"))).cast(LongType)
      // A qualifying pair is emitted only from its FIRST matching band —
      // pairs are unique by construction, so no distinct() shuffle over
      // the candidate set, and each pair's hamming check runs once.
      def band(c: org.apache.spark.sql.Column, j: Int) =
        shiftright(c, 12 * j).bitwiseAND(lit(4095L))
      val firstMatch = (0 until SH_BANDS - 1).map { j =>
        !(col("k") > j && band(col("sha"), j) === band(col("shb"), j))
      }.reduce(_ && _)
      bands.select(col("doc_id").as("ia"), col("simhash").as("sha"), col("k"), col("bv"))
        .join(bands.select(col("doc_id").as("ib"), col("simhash").as("shb"),
          col("k").as("k2"), col("bv").as("bv2")),
          col("k") === col("k2") && col("bv") === col("bv2") && col("ia") < col("ib"))
        .filter(ham <= SH_MAXHAM && firstMatch)
        .select(col("ia"), col("ib"), ham.as("ham"))
    }
  }

  // ----------------------------------------- embedding-cosine near-dup
  private val EMB_TAU = 0.8
  private val PREFIX = 16

  /** Embedding near-dup: candidate blocking on the given cluster label (the
    * IVF coarse cell), exact scaled-integer cosine on a 16-dim prefix
    * sketch.  Integer dot products are < 2^53, hence bit-exact doubles in
    * both engines — the threshold can never flip between Spark and the
    * oracle. */
  val dedupEmbed: GraftQuery = GraftQuery("q_llm_dedup_embed",
    s"""WITH q AS (SELECT vec_id, label,
       |  list_transform(embedding[1:$PREFIX],
       |                 x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |n AS (SELECT vec_id, label, qv, list_dot_product(qv, qv) AS nrm FROM q)
       |SELECT a.vec_id AS ia, b.vec_id AS ib, a.label AS label,
       |       list_dot_product(a.qv, b.qv) / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim
       |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE list_dot_product(a.qv, b.qv) / (sqrt(a.nrm) * sqrt(b.nrm)) >= $EMB_TAU""".stripMargin) { (spark, sfDir) =>
    // prefix-16 sketch = slice of the session-staged full quantized base
    // (per-component quantization commutes with slicing)
    val base = Similarity.quantized(spark, sfDir)
      .select(col("vec_id"), col("label"), slice(col("qv"), 1, PREFIX).as("qv"))
      .withColumn("nrm", vecDot(spark, col("qv"), col("qv")).cast(DoubleType))
    val a = base.select(col("vec_id").as("ia"), col("label"),
      col("qv").as("qa"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("ib"), col("label").as("label_b"),
      col("qv").as("qb"), col("nrm").as("nb"))
    val sim = vecDot(spark, col("qa"), col("qb")).cast(DoubleType) /
      (sqrt(col("na")) * sqrt(col("nb")))
    a.join(b, col("label") === col("label_b") && col("ia") < col("ib"))
      .withColumn("sim", sim)
      .filter(col("sim") >= EMB_TAU)
      .select("ia", "ib", "label", "sim")
  }

  val all: Seq[GraftQuery] =
    Seq(dedupExact, dedupNgram, dedupNear, dedupSimhash, dedupEmbed)
}
