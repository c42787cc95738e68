package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, QuerySet, Tables}
import graft.config._
import graft.write.WriteExecutor

/** Write-path correctness (D1/D4/D6): a multi-statement template —
  * DDL, literal INSERT, INSERT..SELECT with a bound parameter, then
  * the trailing SELECT that returns data — executed through the
  * splitter + binding-plan slicing, against a managed parquet table.
  */
object WriteQueries extends QuerySet {

  private val writeTemplate =
    """DROP TABLE IF EXISTS graft_write_demo;
      |CREATE TABLE graft_write_demo (k BIGINT, v STRING) USING parquet
      |  LOCATION '{{conn.location}}';
      |INSERT INTO graft_write_demo VALUES (1, 'one;two'), (2, 'b');
      |INSERT INTO graft_write_demo
      |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= {{params.upper}};
      |SELECT k, v FROM graft_write_demo ORDER BY k""".stripMargin

  private val writeEndpoint = EndpointConfig(
    urlPath = "/write-demo",
    method = "POST",
    templateSource = "write_demo.sql",
    isWrite = true,
    requestFields = Seq(
      RequestFieldConfig("upper", required = true,
        validators = Seq(ValidatorConfig("int")))))

  private val writeMulti = QueryDef(
    "write_multi_statement",
    Some("""SELECT k, v FROM (
           |  SELECT 1::BIGINT AS k, 'one;two' AS v
           |  UNION ALL SELECT 2::BIGINT, 'b'
           |  UNION ALL SELECT o_orderkey, o_orderstatus FROM orders
           |            WHERE o_orderkey <= 50) t
           |ORDER BY k""".stripMargin),
    (s, dir) => {
      Tables.register(s, dir)
      val loc = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_write", "demo")
      if (loc.toFile.exists()) {
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.delete(f))
      }
      val result = WriteExecutor.executeWrite(
        s, writeEndpoint, writeTemplate, Map("upper" -> "50"),
        returnsData = true, connProps = Map("location" -> loc.toString))
      result.returnedData.getOrElse(sys.error("write returned no data"))
        .orderBy("k")
    })

  override val defs: Seq[QueryDef] = Seq(writeMulti)
}
