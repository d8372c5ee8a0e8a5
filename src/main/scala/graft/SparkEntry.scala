package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 appears in `queries`,
  * with a DuckDB oracle in `oracleSql` where SQL-expressible. */
object SparkEntry {

  /** Flagship: full profile of lineitem (all SURVEY §2.1 statistics as
    * one tidy DataFrame) at sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.profiler.Profiler.profileTidy(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.Extensions.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.EmbedQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.EventsQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.DriftQueries.queries ++
      graft.queries.SampleQueries.queries ++
      graft.queries.QualityQueries.queries ++
      graft.queries.EmbedHealthQueries.queries ++
      graft.queries.StoreQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.UrlQueries.queries ++
      graft.queries.ClassifierQueries.queries ++
      graft.queries.UnigramQueries.queries ++
      graft.queries.WordPieceQueries.queries ++
      graft.queries.BlocklistQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Core.oracle ++ graft.queries.Extensions.oracle ++
      graft.queries.DedupQueries.oracle ++
      graft.queries.EmbedQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.EventsQueries.oracle ++
      graft.queries.MultimodalQueries.oracle ++
      graft.queries.DriftQueries.oracle ++
      graft.queries.SampleQueries.oracle ++
      graft.queries.QualityQueries.oracle ++
      graft.queries.EmbedHealthQueries.oracle ++
      graft.queries.StoreQueries.oracle ++
      graft.queries.CorpusQueries.oracle ++
      graft.queries.UrlQueries.oracle ++
      graft.queries.ClassifierQueries.oracle ++
      graft.queries.UnigramQueries.oracle ++
      graft.queries.WordPieceQueries.oracle ++
      graft.queries.BlocklistQueries.oracle
}
