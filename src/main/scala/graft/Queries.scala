package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Assembles the full judged inventory (SURVEY.md §2.B) from the module
  * objects into the SparkEntry contract maps. */
object Queries {

  val all: Seq[GraftQuery] =
    rel.Relational.all ++
      rel.Relational2.all ++
      rel.Relational3.all ++
      rel.Relational4.all ++
      rel.Relational5.all ++
      rel.Relational6.all ++
      rel.Relational7.all ++
      rel.Relational8.all ++
      rel.Relational9.all ++
      rel.Relational10.all ++
      graph.Graphs.all ++
      io.CatalogTables.all ++
      io.Versioned.all ++
      io.Branches.all ++
      io.Zonemap2D.all ++
      io.ChangeFeed.all ++
      io.GraftSinkProvider.all ++
      io.GraftTable.all ++
      io.BloomIndex.all ++
      io.TextIndex.all ++
      io.VectorIndex.all ++
      io.TxnCatalog.all ++
      io.IncrementalView.all ++
      joins.BloomPrune.all ++
      fns.Scalars.all ++
      time.EventWindows.all ++
      time.Resample.all ++
      streaming.StreamSink.all ++
      agg.VectorMeanQuery.all ++
      agg.BitmapDistinctQuery.all ++
      agg.HeavyHittersQuery.all ++
      llm.Dedup.all ++
      llm.DedupCluster.all ++
      llm.DedupIncr.all ++
      llm.SemanticDedup.all ++
      llm.Similarity.all ++
      llm.AnnAuto.all ++
      llm.GraphAnn.all ++
      llm.KnnJoin.all ++
      llm.TextStats.all ++
      llm.Bpe.all ++
      llm.Pipeline.all ++
      llm.Relevance.all ++
      llm.SpanDedup.all ++
      llm.Curate.all ++
      llm.CurateIncr.all ++
      llm.QualityModel.all ++
      llm.Drift.all ++
      llm.EmbedCurate.all ++
      llm.Importance.all ++
      llm.Multimodal.all

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
