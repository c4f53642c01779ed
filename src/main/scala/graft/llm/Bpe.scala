package graft.llm

import graft.GraftQuery
import graft.fns.BpeExpressions
import graft.io.Tables._
import graft.llm.TextOps.toks
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer over the corpus (B10/B11): the trainer
  * learns a merge table from the corpus itself, the encoder applies it as
  * a codegen'd Catalyst expression ([[graft.fns.BpeEncode]]).
  *
  * 100 TB posture (the classic Sennrich dictionary formulation): training
  * never touches the corpus twice — ONE map-side-combined shuffle builds
  * the word-frequency dictionary, df-capped to the top `VocabCap` words
  * (count desc, word asc), and the merge loop runs on that bounded
  * dictionary driver-side, exactly like every other sample/dictionary-
  * bounded trainer in the engine (k-means caps, quantile samples).  The
  * merge table (≤ `NMerges` rows) then ships inside the encode
  * expression — tokenization is map-only, stays in WholeStageCodegen, and
  * scales with corpus bytes, not vocabulary.
  *
  * No SQL oracle: the rank-greedy merge loop is iterative and not
  * expressible in DuckDB SQL (SparkEntry's no-oracle carve-out); BpeSpec
  * pins the encoder against an independent driver-side reimplementation
  * on every document, the exact roundtrip property, dictionary-vs-stream
  * training equivalence, and the codegen plan shape.
  */
object Bpe {

  private[graft] val NMerges = 64
  private[graft] val VocabCap = 4096

  /** Greedy BPE merge training over a word-frequency dictionary: per
    * round, count weighted adjacent symbol pairs across the (symbolized)
    * vocabulary and merge the argmax — count desc, pair asc, so the table
    * is deterministic for a deterministic dictionary. */
  private[graft] def trainMerges(wordCounts: Seq[(String, Long)],
      nMerges: Int = NMerges): Seq[(String, String)] = {
    var vocab = wordCounts.map { case (w, c) =>
      (w.map(String.valueOf(_)).toVector :+ "</w>", c)
    }
    val merges = Vector.newBuilder[(String, String)]
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    var emitted = 0
    var exhausted = false
    while (emitted < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        // A pair can RE-FORM after a later merge recreates one of its
        // operands (e.g. ('ab','c') rebuilding 'abc' next to 'd' after
        // ('abc','d') was already ranked).  Emitting it again would put
        // two ranks on one key — the encoder's table and any last-wins
        // reference Map would then disagree — so the pair is collapsed in
        // the working vocabulary (its existing rank already covers it at
        // encode time) but only ever emitted once.
        if (seen.add(best)) { merges += best; emitted += 1 }
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
      }
    }
    merges.result()
  }

  /** Corpus-trained merge table: distributed df-capped word dictionary,
    * driver merge loop.  Memoized per sfDir (the table is the session's
    * tokenizer artifact, like a staged index). */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private[graft] def merges(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Seq[(String, String)] =
    mergeCache.computeIfAbsent(sfDir, _ => {
      val dict = documents(spark, sfDir)
        .select(explode(toks(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w"))
        .limit(VocabCap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      trainMerges(dict)
    })

  /** Judged tokenizer query: per-doc BPE token count and the token stream
    * itself (space-joined; tokens never contain spaces). */
  val bpeEncode: GraftQuery = GraftQuery.noOracle("q_llm_bpe_encode") { (spark, sfDir) =>
    val t = BpeExpressions.bpeEncode(spark, col("text"), merges(spark, sfDir), sfDir)
    documents(spark, sfDir)
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"),
        size(col("t")).cast(LongType).as("n_bpe"),
        concat_ws(" ", col("t")).as("bpe"))
  }

  /** Training alphabet: the distinct characters of ALL corpus words —
    * deliberately corpus-wide rather than limited to the df-capped merge
    * dictionary, so every character of the training corpus owns a vocab id
    * and n_unk = 0 holds on the corpus itself (unk is reserved for chars
    * first seen at inference).  This stays bounded at 100 TB because a
    * distinct-character set is capped by the charset (≤ 65536 entries),
    * built in one map-side-combined aggregate — unlike the merge
    * dictionary, no df cap is needed for the artifact to be small. */
  private val alphaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Char]]()
  private[graft] def alphabet(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Seq[Char] =
    alphaCache.computeIfAbsent(sfDir, _ => {
      documents(spark, sfDir)
        .select(explode(toks(col("text"))).as("w"))
        .select(explode(split(col("w"), "")).as("c"))
        .filter(col("c") =!= "")
        .distinct().collect().map(_.getString(0).charAt(0)).sorted.toSeq
    })

  /** Judged id-space tokenizer: per-doc vocabulary-id stream (the model
    * input), with the unk count surfaced — on the training corpus itself
    * n_unk must be 0 (every char owns a vocab id), which the spec pins
    * along with ids↔tokens consistency. */
  val bpeIds: GraftQuery = GraftQuery.noOracle("q_llm_bpe_ids") { (spark, sfDir) =>
    val ids = BpeExpressions.bpeEncodeIds(spark, col("text"),
      merges(spark, sfDir), alphabet(spark, sfDir), sfDir)
    documents(spark, sfDir)
      .select(col("doc_id"), ids.as("ids"))
      .select(col("doc_id"),
        size(col("ids")).cast(LongType).as("n_bpe"),
        size(filter(col("ids"), x => x === 0)).cast(LongType).as("n_unk"),
        concat_ws(",", transform(col("ids"), _.cast(StringType))).as("ids_csv"))
  }

  val all: Seq[GraftQuery] = Seq(bpeEncode, bpeIds)
}
