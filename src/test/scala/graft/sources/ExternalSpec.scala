package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** External connector seams (SURVEY §2.1 S3–S5): without the connector
  * jar on the classpath, `load` must raise the directed
  * drop-the-jar-here error — never a raw class-path stack trace — and
  * name both the source and the Spark format to add. The seam is by
  * format name, so the same code lights up unchanged when the
  * published connector jar is present. */
class ExternalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("external-spec")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("BigQuery seam raises the directed error offline") {
    val e = intercept[UnsupportedOperationException] {
      BigQuerySource.table(spark, "proj.dataset.events")
    }
    assert(e.getMessage.contains("BigQuery"))
    assert(e.getMessage.contains("'bigquery'"))
    assert(e.getMessage.contains("classpath"))
    assert(e.getCause != null) // original resolution failure preserved
  }

  test("Iceberg seam raises the directed error offline") {
    val e = intercept[UnsupportedOperationException] {
      IcebergSource.load(spark, Map("path" -> "/tmp/does-not-matter"))
    }
    assert(e.getMessage.contains("Iceberg") && e.getMessage.contains("'iceberg'"))
  }

  test("SAP RFC seam is a permanent stub with the directed error") {
    val e = intercept[UnsupportedOperationException] {
      SapRfcSource.load(spark, Map("table" -> "SFLIGHT"))
    }
    assert(e.getMessage.contains("SAP RFC") && e.getMessage.contains("sap-rfc"))
  }
}
