package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config.ConnectionConfig

/** S2: JDBC attach, exercised for real against Derby (in the Spark jar
  * set) — the analog of the reference's sqlite northwind ATTACH. */
class ConnectionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val jdbcUrl = "jdbc:derby:memory:graftnw;create=true"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("connections-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conn = DriverManager.getConnection(jdbcUrl)
    val st = conn.createStatement()
    st.execute("CREATE TABLE products (id INT PRIMARY KEY, name VARCHAR(64), price DOUBLE)")
    st.execute("INSERT INTO products VALUES (1, 'Chai', 18.0), (2, 'Chang', 19.0), (3, 'Syrup', 10.0)")
    st.close(); conn.close()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("jdbc connection registers prefixed views and filters push down") {
    Connections.init(spark, ConnectionConfig("nw",
      properties = Map("type" -> "jdbc", "url" -> jdbcUrl, "tables" -> "products")))
    val df = spark.sql("SELECT name FROM nw_products WHERE price > 15 ORDER BY name")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Chai", "Chang"))
    // the predicate must reach the JDBC scan, not filter in Spark
    val plan = spark.sql("SELECT name FROM nw_products WHERE price > 15")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("PRICE"),
      s"expected pushed JDBC filter in plan:\n$plan")
  }

  test("init-sql runs through the statement splitter") {
    Connections.init(spark, ConnectionConfig("setup",
      properties = Map.empty,
      initSql = Some(
        "CREATE OR REPLACE TEMP VIEW conn_probe AS SELECT 1 AS one; " +
        "CREATE OR REPLACE TEMP VIEW conn_probe2 AS SELECT ';' AS semi")))
    assert(spark.table("conn_probe").collect().head.getInt(0) == 1)
    assert(spark.table("conn_probe2").collect().head.getString(0) == ";")
  }

  test("view name sanitization") {
    assert(Connections.viewName("nw", "Order Details") == "nw_Order_Details")
  }

  test("typed connection credentials land in Hadoop conf; fs.* refs resolve; raw fs.* wins") {
    val secret = java.nio.file.Files.createTempFile("graft_conn_secret", ".txt")
    java.nio.file.Files.writeString(secret, "from-file\n")
    Connections.init(spark, graft.config.ConnectionConfig("credtest", Map(
      "s3-access-key-id" -> "AKIATYPED",
      "s3-secret-access-key" -> s"secretfile:$secret",
      "s3-region" -> "eu-central-1",
      // raw fs.* applied AFTER discovery/typed props — explicit wins
      "fs.s3a.endpoint.region" -> "us-west-2",
      // file: URI values pass through untouched (legit Hadoop scheme)
      "fs.credtest.probe" -> "file:///srv/data")))
    val conf = spark.sparkContext.hadoopConfiguration
    assert(conf.get("fs.s3a.access.key") == "AKIATYPED")
    assert(conf.get("fs.s3a.secret.key") == "from-file")
    assert(conf.get("fs.s3a.endpoint.region") == "us-west-2")
    assert(conf.get("fs.credtest.probe") == "file:///srv/data")
  }
}
