package graft.template

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TemplateSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("template-source-spec")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("resolution: remote/absolute pass through, relative joins base once") {
    assert(TemplateSource.resolve("s3://bucket/t.sql", Some("/base")) == "s3://bucket/t.sql")
    assert(TemplateSource.resolve("https://x/t.sql", None) == "https://x/t.sql")
    assert(TemplateSource.resolve("/abs/t.sql", Some("/base")) == "/abs/t.sql")
    assert(TemplateSource.resolve("t.sql", Some("/base")) == "/base/t.sql")
    assert(TemplateSource.resolve("t.sql", Some("/base/")) == "/base/t.sql")
    // already-prefixed source is not double-joined (bundled-mode guard)
    assert(TemplateSource.resolve("/base/t.sql", Some("/base")) == "/base/t.sql")
    assert(TemplateSource.resolve("t.sql", None) == "t.sql")
  }

  test("local + file:// (Hadoop VFS) loads round-trip") {
    val dir = Files.createTempDirectory("graft_tmplsrc")
    val f = dir.resolve("probe.sql")
    Files.writeString(f, "SELECT 42 AS answer")
    assert(TemplateSource.load(spark, f.toString) == "SELECT 42 AS answer")
    assert(TemplateSource.load(spark, "probe.sql", Some(dir.toString)) == "SELECT 42 AS answer")
    assert(TemplateSource.load(spark, s"file://$f") == "SELECT 42 AS answer")
  }

  test("missing local file raises the reference's not-found error") {
    val e = intercept[java.io.FileNotFoundException](
      TemplateSource.load(spark, "/nope/missing.sql"))
    assert(e.getMessage.contains("Template file not found"))
  }

  test("unbindable remote scheme fails with a scheme error, not silence") {
    // offline container: s3a has no credentials/implementation wired —
    // the error must surface (directed), never an empty template
    val e = intercept[Exception](
      TemplateSource.load(spark, "s3nope://bucket/t.sql"))
    assert(String.valueOf(e.getMessage).nonEmpty)
  }
}
