package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External connector seams for sources the reference reaches through
  * DuckDB extensions (SURVEY §2.1 S3-S5). Each is a TableProvider-style
  * hook: resolution is by Spark data-source format name, so dropping
  * the published connector jar on the classpath lights the source up
  * with no code change here. In this offline build the connectors are
  * absent and `load` raises a directed error instead of a class-path
  * stack trace.
  */
trait ExternalTableProvider {
  def name: String
  def format: String
  def load(spark: SparkSession, options: Map[String, String]): DataFrame = {
    try {
      options.foldLeft(spark.read.format(format)) {
        case (r, (k, v)) => r.option(k, v)
      }.load()
    } catch {
      case e: ClassNotFoundException => throw missing(e)
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("Failed to find") ||
             e.getMessage.contains("DATA_SOURCE_NOT_FOUND") => throw missing(e)
    }
  }
  protected def missing(cause: Throwable): RuntimeException =
    new UnsupportedOperationException(
      s"$name source requires the '$format' Spark connector on the classpath " +
        s"(not bundled in this offline build)", cause)
}

/** S3: BigQuery — `bigquery_scan('project.dataset.table')` in reference
  * templates (examples/sqls/publicis/publicis_cache.sql:8-14) maps to
  * the spark-bigquery connector with option `table`. */
object BigQuerySource extends ExternalTableProvider {
  val name = "BigQuery"
  val format = "bigquery"
  def table(spark: SparkSession, table: String): DataFrame =
    load(spark, Map("table" -> table))
}

/** S4: SAP RFC (`sap_read_table('SFLIGHT')`, ERPL extension;
  * examples/sqls/sap/flights.sql:1). No public Spark connector exists —
  * permanently a stub per SURVEY §2.1; the seam documents the mapping. */
object SapRfcSource extends ExternalTableProvider {
  val name = "SAP RFC"
  val format = "sap-rfc" // no public implementation
}

/** S5: Postgres/MySQL route through the generic JDBC path
  * ([[Connections.registerJdbc]] with the vendor driver + url);
  * Iceberg through `format("iceberg")` when its runtime jar is present. */
object IcebergSource extends ExternalTableProvider {
  val name = "Iceberg"
  val format = "iceberg"
}
