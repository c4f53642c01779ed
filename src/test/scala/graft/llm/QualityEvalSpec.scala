package graft.llm

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the model-evaluation queries (q_llm_quality_auc,
  * q_llm_quality_calibration, q_llm_drift_kl): the exact-integer AUC
  * reproduces the closed forms on planted extremes, the judged AUC is
  * derivable from the judged model output (the two queries cannot
  * disagree about the same training run), calibration counts tile the
  * scored corpus, and the KL decomposition obeys Gibbs' inequality up to
  * its declared quantization bound with the planted batch slice's counts
  * dominated by the corpus counts. */
class QualityEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = QualityModel.aucOf(rows.toDF("s", "y")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("AUC closed forms on planted extremes") {
    // perfect separation: every positive scored above every negative
    assert(auc(Seq((900L, 1L), (901L, 1L), (100L, 0L), (101L, 0L))) ==
      ((2L, 2L, 1000000L)))
    // inverted model
    assert(auc(Seq((100L, 1L), (101L, 1L), (900L, 0L), (901L, 0L))) ==
      ((2L, 2L, 0L)))
    // one score for everything: pure ties, AUC exactly 1/2
    assert(auc(Seq((500L, 1L), (500L, 1L), (500L, 0L))) == ((2L, 1L, 500000L)))
    // hand-computed mix: P={9,5}, N={7,5}; pairs: (9>7)+(9>5)+(5>7=0)
    // +(5=5 half) = 2.5 of 4 => 625000
    assert(auc(Seq((9L, 1L), (5L, 1L), (7L, 0L), (5L, 0L))) ==
      ((2L, 2L, 625000L)))
  }

  test("judged AUC equals the AUC of the judged model output") {
    val model = Queries.queries("q_llm_quality_model")(spark, TestSpark.sf)
      .select(col("score_milli").as("s"), col("y"))
    val fromModel = QualityModel.aucOf(model).collect()(0)
    val judged = Queries.queries("q_llm_quality_auc")(spark, TestSpark.sf)
      .collect()(0)
    assert(fromModel.getLong(0) == judged.getLong(0) &&
      fromModel.getLong(1) == judged.getLong(1) &&
      fromModel.getLong(2) == judged.getLong(2))
    val aucMicro = judged.getLong(2)
    assert(aucMicro >= 0L && aucMicro <= 1000000L)
  }

  test("calibration buckets tile the scored corpus exactly") {
    val cal = Queries.queries("q_llm_quality_calibration")(spark, TestSpark.sf)
      .localCheckpoint()
    val model = Queries.queries("q_llm_quality_model")(spark, TestSpark.sf)
      .localCheckpoint()
    assert(cal.agg(sum("n")).collect()(0).getLong(0) == model.count())
    assert(cal.agg(sum("n_pos")).collect()(0).getLong(0) ==
      model.agg(sum("y")).collect()(0).getLong(0))
    // per-bucket: n_pos <= n and the bucket really brackets its scores
    assert(cal.filter(col("n_pos") > col("n")).count() == 0)
    assert(cal.filter(col("sum_score_milli") < col("bucket") * 100 * col("n") ||
      col("sum_score_milli") > (col("bucket") * 100 + 99) * col("n")).count() == 0)
  }

  test("model-filtered curation composes the gates and the classifier consistently") {
    val vm = Queries.queries("q_llm_curate_model")(spark, TestSpark.sf)
      .localCheckpoint()
    assert(vm.count() > 0)
    // every kept doc is above the decision boundary, and its score is
    // exactly the judged model's score (same staged training run)
    assert(vm.filter(col("score_milli") < 500).count() == 0)
    val model = Queries.queries("q_llm_quality_model")(spark, TestSpark.sf)
      .select(col("doc_id"), col("score_milli").as("m_score"))
    assert(vm.join(model, "doc_id")
      .filter(col("score_milli") =!= col("m_score")).count() == 0)
    // the dedup/heuristic gates are curate v1's: kept ids ⊆ v1's manifest
    val v1 = Queries.queries("q_llm_curate")(spark, TestSpark.sf).select("doc_id")
    assert(vm.select("doc_id").exceptAll(v1).count() == 0)
  }

  test("embedding drift: full (label × component) grid, exact cross-multiplied shift") {
    val d = Queries.queries("q_llm_drift_embed")(spark, TestSpark.sf)
      .localCheckpoint()
    val labels = graft.io.Tables.embeddings(spark, TestSpark.sf)
      .select(countDistinct("label")).collect()(0).getLong(0)
    assert(d.count() == labels * 64, "one row per (label, component)")
    assert(d.filter(col("n_batch") > col("n_corpus")).count() == 0)
    assert(d.filter(abs(col("n_corpus") * col("s_batch") -
      col("n_batch") * col("s_corpus")) =!= col("shift_num")).count() == 0)
    // the batch slice is non-degenerate and some genuine shift exists
    assert(d.filter(col("n_batch") > 0).count() > 0)
    assert(d.agg(max("shift_num")).collect()(0).getLong(0) > 0L)
  }

  test("KL decomposition: Gibbs bound, slice domination, vocab coverage") {
    val kl = Queries.queries("q_llm_drift_kl")(spark, TestSpark.sf)
      .localCheckpoint()
    // batch is a slice of the corpus: counts dominated, vocab complete
    assert(kl.filter(col("c_batch") > col("c_corpus")).count() == 0)
    val vocab = graft.io.Tables.documents(spark, TestSpark.sf)
      .select(explode(graft.llm.TextOps.toks(col("text"))).as("w"))
      .agg(countDistinct("w")).collect()(0).getLong(0)
    assert(kl.count() == vocab)
    // Gibbs: true KL >= 0; each lnr_micro carries <= 0.5 quantization
    // error weighted by (b+1), so sum(contrib) >= -0.5 * sum(b+1)
    val r = kl.agg(sum("contrib"), sum(col("c_batch") + lit(1L))).collect()(0)
    assert(r.getLong(0) >= -(r.getLong(1) + 1L) / 2L,
      s"KL numerator ${r.getLong(0)} below the quantization floor")
  }
}
