package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.multimodal.MultimodalOps
import graft.operators.{Analytics, Ann, Bq, Clustering, Dedup, EventOps, Graph, Hnsw, IvfPq, Opq, Pq, QualityClassifier, Relational, Retrieval, Skew, Sketches, Sq, StoreOps, TextAnalysis, VectorSearch}
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hybrid search (metadata filter ∧ KNN) — the widest slice of the
    * reference surface in one plan. */
  def entry(spark: SparkSession): DataFrame =
    VectorSearch.q14(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorSearch.queries ++ Dedup.queries ++ TextAnalysis.queries ++
      Relational.queries ++ EventOps.queries ++ Ann.queries ++
      Pq.queries ++ IvfPq.queries ++ Analytics.queries ++
      StoreOps.queries ++ EventStream.queries ++ Skew.queries ++
      Retrieval.queries ++ Sketches.queries ++ Clustering.queries ++
      Sq.queries ++ Bq.queries ++ MultimodalOps.queries ++
      graft.multimodal.MediaDedup.queries ++
      graft.multimodal.MediaVectorSearch.queries ++
      Hnsw.queries ++ graft.plans.IndexedTopK.queries ++ Graph.queries ++
      Opq.queries ++ QualityClassifier.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    VectorSearch.oracles ++ Dedup.oracles ++ TextAnalysis.oracles ++
      Relational.oracles ++ EventOps.oracles ++ Ann.oracles ++
      Pq.oracles ++ IvfPq.oracles ++ Analytics.oracles ++
      StoreOps.oracles ++ EventStream.oracles ++ Skew.oracles ++
      Retrieval.oracles ++ Sketches.oracles ++ Clustering.oracles ++
      Sq.oracles ++ Bq.oracles ++ MultimodalOps.oracles ++
      graft.multimodal.MediaDedup.oracles ++
      graft.multimodal.MediaVectorSearch.oracles ++
      Hnsw.oracles ++ graft.plans.IndexedTopK.oracles ++ Graph.oracles ++
      Opq.oracles ++ QualityClassifier.oracles
}
