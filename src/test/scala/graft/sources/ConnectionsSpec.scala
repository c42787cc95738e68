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

  test("csv connection registers per-file views with passthrough options") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_src")
    java.nio.file.Files.writeString(dir.resolve("fruit.csv"),
      "id;name;price\n1;apple;2.5\n2;pear;3.0\n")
    Connections.init(spark, ConnectionConfig("fruits", Map(
      "type" -> "csv", "path" -> dir.toString,
      "option-header" -> "true", "option-delimiter" -> ";")))
    val rows = spark.table("fruits_fruit").orderBy("id").collect()
    assert(rows.length == 2 && rows.head.getAs[String]("name") == "apple")
    // inferSchema typed the numeric columns
    assert(rows.head.getAs[Double]("price") == 2.5)
  }

  test("orc connection round-trips schema and values through the native reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_src")
    // write a real ORC file (Spark's native writer), then register the
    // directory as an orc-typed connection and read it back
    spark.range(3).selectExpr("id", "concat('n', id) AS name",
      "cast(id * 1.5 as double) AS score")
      .coalesce(1).write.mode("overwrite").orc(dir.resolve("scores_w").toString)
    val part = new java.io.File(dir.resolve("scores_w").toString).listFiles()
      .find(_.getName.endsWith(".orc")).get
    java.nio.file.Files.copy(part.toPath, dir.resolve("scores.orc"))
    Connections.init(spark, ConnectionConfig("orcsrc", Map(
      "type" -> "orc", "path" -> dir.resolve("scores.orc").toString)))
    val rows = spark.table("orcsrc").orderBy("id").collect()
    assert(rows.length == 3 && rows.head.getAs[String]("name") == "n0")
    assert(rows.last.getAs[Double]("score") == 3.0)
    // columnar pruning: a single-column projection reads only it
    val plan = spark.table("orcsrc").select("name")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .flatMap(_.split(", ").find(_.startsWith("ReadSchema"))).mkString
    assert(readSchema.contains("name") && !readSchema.contains("score"),
      s"orc scan did not prune columns: $readSchema\n$plan")
  }

  test("csv with explicit DDL schema skips inference and pins types") {
    val f = java.nio.file.Files.createTempFile("graft_csv_one", ".csv")
    java.nio.file.Files.writeString(f, "1,widget\n2,gadget\n")
    Connections.init(spark, ConnectionConfig("parts_src", Map(
      "type" -> "csv", "path" -> f.toString,
      "schema" -> "part_id INT, part_name STRING")))
    val df = spark.table("parts_src")
    assert(df.schema.fieldNames.toSeq == Seq("part_id", "part_name"))
    assert(df.count() == 2)
  }

  test("file basenames with dashes/dots register as sanitized view names") {
    // a directory containing 'daily-extract.csv' must not fail boot
    // with an invalid-identifier error from createOrReplaceTempView
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_odd")
    java.nio.file.Files.writeString(dir.resolve("daily-extract.csv"),
      "id,v\n1,x\n")
    java.nio.file.Files.writeString(dir.resolve("my.data.csv"),
      "id,v\n2,y\n")
    Connections.init(spark, ConnectionConfig("odd-src", Map(
      "type" -> "csv", "path" -> dir.toString, "option-header" -> "true")))
    assert(spark.table("odd_src_daily_extract").count() == 1)
    assert(spark.table("odd_src_my_data").count() == 1)
  }

  test("colliding sanitized names fail init loudly instead of silently overwriting") {
    val a = java.nio.file.Files.createTempFile("graft_coll_a", ".csv")
    val b = java.nio.file.Files.createTempFile("graft_coll_b", ".csv")
    java.nio.file.Files.writeString(a, "1,x\n")
    java.nio.file.Files.writeString(b, "2,y\n")
    Connections.init(spark, ConnectionConfig("coll-src", Map(
      "type" -> "csv", "path" -> a.toString, "schema" -> "id INT, v STRING")))
    // 'coll.src' sanitizes to the same view name as 'coll-src': without
    // the guard the second init would silently repoint the view
    val e = intercept[IllegalArgumentException] {
      Connections.init(spark, ConnectionConfig("coll.src", Map(
        "type" -> "csv", "path" -> b.toString, "schema" -> "id INT, v STRING")))
    }
    assert(e.getMessage.contains("collision"))
    // re-initing the ORIGINAL name is still idempotent
    Connections.init(spark, ConnectionConfig("coll-src", Map(
      "type" -> "csv", "path" -> a.toString, "schema" -> "id INT, v STRING")))
    assert(spark.table("coll_src").count() == 1)
  }

  test("json connection registers a view over JSONL") {
    val f = java.nio.file.Files.createTempFile("graft_json_src", ".json")
    java.nio.file.Files.writeString(f,
      """{"id":1,"tags":["a","b"]}
        |{"id":2,"tags":["c"]}
        |""".stripMargin)
    Connections.init(spark, ConnectionConfig("docs_src", Map(
      "type" -> "json", "path" -> f.toString)))
    val rows = spark.sql(
      "SELECT id, size(tags) AS n FROM docs_src ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 2), (2L, 1)))
  }
}
