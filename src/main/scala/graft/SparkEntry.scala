package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, CorpusPipelineQueries, DedupQueries, IngestQueries, MaintenanceQueries, MultimodalQueries, PipelineQueries, QueryDef, RelationalExtras, SamplingQueries, SimilarityQueries, SketchQueries, StreamingQueries, TextQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
  * extensions) is declared here as a named query over the test star schema,
  * with a DuckDB oracle where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All declared capabilities, grouped by module. */
  def registry: Seq[QueryDef] =
    CoreQueries.all ++ RelationalExtras.all ++
      TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++
      PipelineQueries.all ++ StreamingQueries.all ++ SketchQueries.all ++
      IngestQueries.all ++ SamplingQueries.all ++ AnalyticsQueries.all ++
      WarehouseQueries.all ++ MaintenanceQueries.all ++ CorpusPipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_segment_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
