package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the driver-provided parquet tables (TESTDATA.md) as temp views.
  *
  * Mirrors the reference's connection-init step (flapi registers sources via
  * init SQL per connection, /root/reference/src/database_manager.cpp:272-302);
  * here the "connection" is a scale-factor directory and the views are the
  * TPC-H-ish tables.
  *
  * Registration is cached per (session, dir): view creation is a catalog-only
  * operation but reading the parquet footer for schema costs a file open, so
  * we do it once. Views are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, which is exactly what we want at 100 TB
  * (only the referenced columns/row-groups are read).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val registered = new ConcurrentHashMap[String, String]()

  /** Idempotently create one temp view per table over `dir`. */
  def register(spark: SparkSession, dir: String): Unit = {
    val key = System.identityHashCode(spark) + ":" + dir
    if (registered.putIfAbsent(key, dir) == null) {
      // The driver may hand us a session it built itself (entry()); make
      // sure nanos-timestamp parquet (events.ts) is readable in it too.
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Throwable => }
      names.foreach { n =>
        val p = s"$dir/$n.parquet"
        if (new java.io.File(p).exists() || dir.contains("://")) {
          var df = spark.read.parquet(p)
          // events.ts is parquet TIMESTAMP(NANOS) which Spark reads as
          // LongType under spark.sql.legacy.parquet.nanosAsLong (set by our
          // entry points). The data is µs-precision, so converting
          // nanos→micros is lossless and round-trips against DuckDB.
          df.schema.fields.collect {
            case f if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
              df = df.withColumn("ts",
                org.apache.spark.sql.functions.timestamp_micros(
                  org.apache.spark.sql.functions.expr("ts div 1000")))
          }
          df.createOrReplaceTempView(n)
        }
      }
    }
  }

  /** Register views then run a SQL query against them. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    register(spark, dir)
    spark.table(name)
  }
}
