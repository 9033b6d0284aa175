package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, AudioDedup, Classify, Curation, Dedup, DedupIndex, Dsir, Embeddings, EvalRegistry, Graph, Html, ImageDedup, Reference, Retrieval, RollupIndex, Sketches, Temporal, TextOps, VideoDedup}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; each
  * SQL-expressible one has a matching DuckDB oracle in `oracleSql` with
  * identical output column names (the driver's compare is column-name
  * sorted).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Reference.queries ++ Analytics.queries ++ TextOps.queries ++
      Dedup.queries ++ Embeddings.queries ++ Temporal.queries ++
      Sketches.queries ++ Graph.queries ++ ImageDedup.queries ++
      AudioDedup.queries ++ VideoDedup.queries ++ Classify.queries ++
      Retrieval.queries ++ graft.sources.Sinks.queries ++
      graft.sources.Warc.queries ++ graft.sources.Jsonl.queries ++
      Html.queries ++
      Curation.queries ++ Dsir.queries ++ DedupIndex.queries ++
      RollupIndex.queries ++ EvalRegistry.queries ++
      graft.operators.AdmissionLog.funnelQueries ++
      graft.operators.SftPrep.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Reference.oracle ++ Analytics.oracle ++ TextOps.oracle ++
      Dedup.oracle ++ Embeddings.oracle ++ Temporal.oracle ++
      Sketches.oracle ++ Graph.oracle ++ ImageDedup.oracle ++
      AudioDedup.oracle ++ VideoDedup.oracle ++ Classify.oracle ++
      Retrieval.oracle ++ graft.sources.Sinks.oracle ++
      graft.sources.Warc.oracle ++ graft.sources.Jsonl.oracle ++
      Html.oracle ++
      Curation.oracle ++ Dsir.oracle ++ DedupIndex.oracle ++
      RollupIndex.oracle ++ EvalRegistry.oracle ++
      graft.operators.AdmissionLog.funnelOracle ++
      graft.operators.SftPrep.oracle
}
