package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
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
  /** Exact near-dup pairs by 3-gram-shingle Jaccard >= tau, via an inverted
    * shingle index (explode + self-equi-join on shingle) — shuffle-parallel,
    * output-linear in sum(df^2), never |docs|^2. */
  private val NGRAM_TAU = 0.3

  val dedupNgram: GraftQuery = GraftQuery("q_llm_dedup_ngram",
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |sh AS (SELECT doc_id, unnest($shinglesSql) AS s
       |       FROM toks WHERE len(t) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS common
       |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT ia, ib, common, x.n AS na, y.n AS nb,
       |       common / (x.n + y.n - common) AS jacc
       |FROM p JOIN sz x ON ia = x.doc_id JOIN sz y ON ib = y.doc_id
       |WHERE common / (x.n + y.n - common) >= $NGRAM_TAU""".stripMargin) { (spark, sfDir) =>
    val t = documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t"))
    val sh = t.filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(shingles(col("t"))).as("s"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.select(col("doc_id").as("ia"), col("s"))
      .join(sh.select(col("doc_id").as("ib"), col("s").as("s2")),
        col("s") === col("s2") && col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("common"))
    val jacc = col("common") / (col("na") + col("nb") - col("common"))
    pairs
      .join(sz.select(col("doc_id"), col("n").as("na")), col("ia") === col("doc_id")).drop("doc_id")
      .join(sz.select(col("doc_id"), col("n").as("nb")), col("ib") === col("doc_id")).drop("doc_id")
      .filter(jacc >= NGRAM_TAU)
      .select(col("ia"), col("ib"), col("common"), col("na"), col("nb"), jacc.as("jacc"))
  }

  // ------------------------------------------------- MinHash + LSH
  private val K = 16   // signature length
  private val BANDS = 4 // bands of 4 rows each
  private val ROWS = K / BANDS
  private val MH_TAU = 0.5

  /** MinHash(16) signatures -> 4-row LSH bands -> candidate pairs by band
    * equi-join -> exact Jaccard verification.  Fully deterministic (seeded
    * md5 hash family), hence oracle-checked end to end. */
  val dedupNear: GraftQuery = {
    val minsSql = (0 until K)
      .map(j => s"min(${seededHashSql(j, "s")}) AS m$j").mkString(",\n       ")
    val bandCases = (0 until BANDS).map { b =>
      val cols = (b * ROWS until (b + 1) * ROWS)
        .map(j => s"m$j::VARCHAR").mkString(" || ',' || ")
      s"WHEN $b THEN $cols"
    }.mkString(" ")
    GraftQuery("q_llm_dedup_near",
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id, unnest($shinglesSql) AS s
         |       FROM toks WHERE len(t) >= 3),
         |sig AS (SELECT doc_id,
         |       $minsSql
         |       FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, b, CASE b $bandCases END AS bs
         |          FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) tb(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |         FROM bands a JOIN bands b
         |           ON a.b = b.b AND a.bs = b.bs AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list(s) AS ss, count(*) AS n FROM sh GROUP BY doc_id)
         |SELECT ia, ib,
         |       len(list_filter(x.ss, e -> list_contains(y.ss, e)))
         |         / (x.n + y.n - len(list_filter(x.ss, e -> list_contains(y.ss, e)))) AS jacc
         |FROM cand JOIN sets x ON ia = x.doc_id JOIN sets y ON ib = y.doc_id
         |WHERE len(list_filter(x.ss, e -> list_contains(y.ss, e)))
         |        / (x.n + y.n - len(list_filter(x.ss, e -> list_contains(y.ss, e)))) >= $MH_TAU""".stripMargin) { (spark, sfDir) =>
      val t = documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t"))
      val sh = t.filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(shingles(col("t"))).as("s"))
      val sig = sh.groupBy("doc_id")
        .agg(min(seededHash(0, col("s"))).as("m0"),
          (1 until K).map(j => min(seededHash(j, col("s"))).as(s"m$j")): _*)
      val bandStructs = (0 until BANDS).map { b =>
        val bs = concat_ws(",", (b * ROWS until (b + 1) * ROWS)
          .map(j => col(s"m$j").cast(StringType)): _*)
        struct(lit(b).as("b"), bs.as("bs"))
      }
      val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
        .select(col("doc_id"), col("x.b").as("b"), col("x.bs").as("bs"))
      val cand = bands.select(col("doc_id").as("ia"), col("b"), col("bs"))
        .join(bands.select(col("doc_id").as("ib"), col("b").as("b2"), col("bs").as("bs2")),
          col("b") === col("b2") && col("bs") === col("bs2") && col("ia") < col("ib"))
        .select("ia", "ib").distinct()
      val sets = sh.groupBy("doc_id")
        .agg(collect_list(col("s")).as("ss"), count(lit(1)).as("n"))
      val common = size(array_intersect(col("ssa"), col("ssb"))).cast(LongType)
      val jacc = common / (col("na") + col("nb") - common)
      cand
        .join(sets.select(col("doc_id"), col("ss").as("ssa"), col("n").as("na")),
          col("ia") === col("doc_id")).drop("doc_id")
        .join(sets.select(col("doc_id"), col("ss").as("ssb"), col("n").as("nb")),
          col("ib") === col("doc_id")).drop("doc_id")
        .filter(jacc >= MH_TAU)
        .select(col("ia"), col("ib"), jacc.as("jacc"))
    }
  }

  // --------------------------------------------------------- SimHash
  private val SH_BITS = 32
  private val SH_BANDS = 4 // 8-bit bands
  private val SH_MAXHAM = 6

  /** 32-bit SimHash over distinct tokens; candidates share >= 1 of 4 8-bit
    * bands (guarantees recall for hamming <= 3; verified filter <= 6). */
  val dedupSimhash: GraftQuery = {
    val sumsSql = (0 until SH_BITS)
      .map(b => s"CAST(sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$b")
      .mkString(",\n       ")
    val bitsSql = (0 until SH_BITS)
      .map(b => s"(CASE WHEN s$b >= 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    GraftQuery("q_llm_dedup_simhash",
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |w AS (SELECT doc_id, unnest(list_distinct(t)) AS w FROM toks),
         |h AS (SELECT doc_id, ${md5LongSql("w")} AS h FROM w),
         |s AS (SELECT doc_id,
         |       $sumsSql
         |       FROM h GROUP BY doc_id),
         |sim AS (SELECT doc_id, $bitsSql AS simhash FROM s),
         |bands AS (SELECT doc_id, simhash, k, (simhash >> (8 * k)) & 255 AS bv
         |          FROM sim CROSS JOIN (VALUES (0), (1), (2), (3)) t(k))
         |SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham
         |FROM bands a JOIN bands b
         |  ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SH_MAXHAM""".stripMargin) { (spark, sfDir) =>
      val t = documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t"))
      val w = t.select(col("doc_id"), explode(array_distinct(col("t"))).as("w"))
        .withColumn("h", md5Long(col("w")))
      val sums = w.groupBy("doc_id")
        .agg(sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1)).as("s0"),
          (1 until SH_BITS).map(b =>
            sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1)).as(s"s$b")): _*)
      val simhash = (0 until SH_BITS)
        .map(b => when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      val sim = sums.select(col("doc_id"), simhash.as("simhash"))
      val bandStructs = (0 until SH_BANDS).map(k =>
        struct(lit(k).as("k"), shiftright(col("simhash"), 8 * k).bitwiseAND(lit(255L)).as("bv")))
      val bands = sim.select(col("doc_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("x"))
        .select(col("doc_id"), col("simhash"), col("x.k").as("k"), col("x.bv").as("bv"))
      val ham = bit_count(col("sha").bitwiseXOR(col("shb"))).cast(LongType)
      bands.select(col("doc_id").as("ia"), col("simhash").as("sha"), col("k"), col("bv"))
        .join(bands.select(col("doc_id").as("ib"), col("simhash").as("shb"),
          col("k").as("k2"), col("bv").as("bv2")),
          col("k") === col("k2") && col("bv") === col("bv2") && col("ia") < col("ib"))
        .filter(ham <= SH_MAXHAM)
        .select(col("ia"), col("ib"), ham.as("ham"))
        .distinct()
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
    val qv = transform(slice(col("embedding"), 1, PREFIX),
      x => round(x.cast(DoubleType) * 1000000).cast(LongType))
    val base = embeddings(spark, sfDir).select(col("vec_id"), col("label"), qv.as("qv"))
      .withColumn("nrm",
        aggregate(zip_with(col("qv"), col("qv"), (a, b) => a * b), lit(0L), (acc, x) => acc + x)
          .cast(DoubleType))
    val a = base.select(col("vec_id").as("ia"), col("label"),
      col("qv").as("qa"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("ib"), col("label").as("label_b"),
      col("qv").as("qb"), col("nrm").as("nb"))
    val dot = aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x).cast(DoubleType)
    val sim = dot / (sqrt(col("na")) * sqrt(col("nb")))
    a.join(b, col("label") === col("label_b") && col("ia") < col("ib"))
      .withColumn("sim", sim)
      .filter(col("sim") >= EMB_TAU)
      .select("ia", "ib", "label", "sim")
  }

  val all: Seq[GraftQuery] =
    Seq(dedupExact, dedupNgram, dedupNear, dedupSimhash, dedupEmbed)
}
