package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query exposed through the driver's correctness gate.
  *
  * @param name   stable id, becomes the parquet dump name in Verify
  * @param oracle equivalent ANSI SQL runnable by DuckDB on the same parquet
  *               tables (None → driver records a weaker rows-only check)
  * @param build  Spark-side implementation
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

trait QuerySet {
  def defs: Seq[QueryDef]
}
