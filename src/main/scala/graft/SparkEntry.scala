package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query sets, one per SURVEY.md §2 area. */
  def sets: Seq[QuerySet] = Seq(CoreQueries, EndpointQueries, SqlSurfaceQueries,
    TextQueries, CorpusOpsQueries, CurationQueries, SearchQueries,
    EmbeddingQueries, CacheQueries, WriteQueries, MultimodalQueries,
    EventQueries)

  def allDefs: Seq[QueryDef] = sets.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
