package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The v4 model gate FIRED end-to-end: on the judged synthetic corpus
  * the trained classifier drops zero documents (every survivor of the
  * earlier gates scores ≥ 500), so `q_llm_curate_model_attribution`'s
  * 'model_score' branch was only structurally pinned.  This fixture
  * plants a corpus where the gate must fire: gibberish documents with
  * extreme mean-word-length / zero-stopword features that (a) pass
  * every earlier gate (distinct texts, ≥ 20 tokens, no repetition, no
  * near/semantic dups) and (b) occupy the high-NLL band tail, so the
  * in-query training run labels them negative and the learned weights
  * score them below the 0.5 boundary.  Asserts ≥ 1 model_score drop,
  * that the drops are planted junk, and that the attribution's 'kept'
  * slice still equals the v4 manifest on the same fixture. */
class ModelGateFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nNormal = 200
  private val nJunk = 10

  private def buildFixture(): String = {
    val dir = s"/tmp/graft_model_gate_fixture/${java.util.UUID.randomUUID()}"
    val rnd = new scala.util.Random(4242)
    val syll = Vector("ka", "ro", "mi", "ta", "len", "dor", "vi", "su", "ne", "pal")
    val stops = Vector("the", "a", "of", "and", "data")
    def normalWord() = (0 until (1 + rnd.nextInt(2))).map(_ => syll(rnd.nextInt(syll.size))).mkString
    def junkWord() = (0 until 28).map(_ => ('b' + rnd.nextInt(24)).toChar).mkString
    val docs = (0 until nNormal).map { i =>
      // ~1/3 stopwords, short words: the "good prose" feature profile
      val toks = (0 until 40).map(t =>
        if (t % 3 == 1) stops(rnd.nextInt(stops.size)) else normalWord())
      val text = s"doc$i " + toks.mkString(" ")
      (i.toLong, text, "en", "fix", text.length.toLong)
    } ++ (0 until nJunk).map { j =>
      val text = s"junk$j " + (0 until 25).map(_ => junkWord()).mkString(" ")
      ((nNormal + j).toLong, text, "en", "fix", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // embeddings: two ±1 spikes per doc, every doc a distinct
    // (dim-pair, sign-pair) combo -> pairwise cosine <= 0.5 < the 0.7
    // semantic-dup threshold, deterministically
    val pairs = for {
      a <- 0 until 16; b <- (a + 1) until 16
      sa <- Seq(1f, -1f); sb <- Seq(1f, -1f)
    } yield (a, b, sa, sb)
    val embs = (0 until (nNormal + nJunk)).map { i =>
      val (a, b, sa, sb) = pairs(i)
      val v = Array.fill(64)(0.0f); v(a) = sa; v(b) = sb
      (i.toLong, v.toSeq, i % 2)
    }
    embs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted low-quality docs are dropped by the model gate, manifest stays consistent") {
    val dir = buildFixture()
    val reasons = Curate.curateModelAttribution.fn(spark, dir).localCheckpoint()
    val byReason = reasons.groupBy("reason").count()
      .as[(String, Long)].collect().toMap
    val scores = QualityModel.scored(spark, dir)
      .filter(col("doc_id") >= nNormal)
      .select("doc_id", "s").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(byReason.getOrElse("model_score", 0L) >= 1,
      s"model gate never fired; reasons=$byReason junkScores=$scores")
    // the gate fired on planted junk, not on normal prose
    val dropped = reasons.filter(col("reason") === "model_score")
      .select("doc_id").as[Long].collect().toSet
    assert(dropped.forall(_ >= nNormal),
      s"model_score must hit only the planted junk, got $dropped")
    // every attributed doc_id appears exactly once
    assert(reasons.count() == (nNormal + nJunk).toLong)
    // 'kept' slice == the v4 manifest on the same fixture
    val kept = reasons.filter(col("reason") === "kept").select("doc_id")
    val manifest = Curate.curateModel.fn(spark, dir).select("doc_id")
    assert(kept.exceptAll(manifest).count() == 0 &&
      manifest.exceptAll(kept).count() == 0,
      "attribution 'kept' must equal the v4 manifest")
  }
}
