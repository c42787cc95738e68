package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.ResponseShape
import graft.config._

/** End-to-end REST + MCP tests against a live GraftServer — the
  * black-box tier the reference covers with tavern suites
  * (test_customers.tavern.yaml, test_mcp_methods.py). */
class ServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var server: GraftServer = _
  private var base: String = _
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private val customersTemplate =
    """SELECT id AS key, name, segment FROM srv_customers
      |WHERE 1=1
      |{{#params.id}} AND id = {{params.id}} {{/params.id}}
      |{{#params.segment}} AND segment = '{{{params.segment}}}' {{/params.segment}}
      |ORDER BY id""".stripMargin

  private val customersEndpoint = ServedEndpoint(
    EndpointConfig(
      urlPath = "/customers",
      templateSource = "srv.sql",
      requestFields = Seq(
        RequestFieldConfig("id", validators = Seq(ValidatorConfig("int", min = 1, max = 1000))),
        RequestFieldConfig("segment",
          validators = Seq(ValidatorConfig("enum", allowedValues = Seq("A", "B"))))),
      requestFieldsValidation = false),
    customersTemplate,
    shape = ResponseShape(maxRows = Some(2)))

  private val byIdEndpoint = ServedEndpoint(
    customersEndpoint.config.copy(urlPath = "/customers/:id"),
    customersTemplate)

  private val writeEndpoint = ServedEndpoint(
    EndpointConfig(
      urlPath = "/notes",
      method = "POST",
      templateSource = "notes.sql",
      isWrite = true,
      requestFields = Seq(
        RequestFieldConfig("note", required = true,
          validators = Seq(ValidatorConfig("string", min = 1, max = 100))))),
    """DROP TABLE IF EXISTS srv_notes;
      |CREATE TABLE srv_notes (note STRING) USING parquet LOCATION '{{conn.loc}}';
      |INSERT INTO srv_notes VALUES ({{params.note}});
      |SELECT note FROM srv_notes""".stripMargin,
    connProps = Map("loc" -> (System.getProperty("java.io.tmpdir") + "/graft_srv_notes")))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("server-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ss = spark
    import ss.implicits._
    Seq((1L, "alice", "A"), (2L, "bob", "B"), (3L, "carol", "A"), (4L, "dave", "B"))
      .toDF("id", "name", "segment").createOrReplaceTempView("srv_customers")
    val loc = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_srv_notes")
    if (loc.exists()) loc.listFiles().foreach(_.delete())
    server = new GraftServer(spark,
      Seq(customersEndpoint, byIdEndpoint, writeEndpoint)).start()
    base = s"http://127.0.0.1:${server.boundPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    if (spark != null) spark.stop()
  }

  private def get(path: String, headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(base + path))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def rpc(body: String): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(post("/mcp/jsonrpc", body).body())

  test("GET returns the pagination envelope with X-headers") {
    val r = get("/customers?limit=2")
    assert(r.statusCode() == 200)
    val j = mapper.readTree(r.body())
    assert(j.get("total_count").asLong() == 4L)
    assert(j.get("data").size() == 2)
    assert(j.get("data").get(0).get("name").asText() == "alice")
    assert(j.get("next").asText() == "/customers?offset=2&limit=2")
    assert(r.headers().firstValue("X-Total-Count").get() == "4")
    assert(r.headers().firstValue("X-Next").isPresent)
  }

  test("typed param filters; section renders conditionally") {
    val j = mapper.readTree(get("/customers?segment=A").body())
    assert(j.get("total_count").asLong() == 2L)
    assert(j.get("data").get(0).get("segment").asText() == "A")
  }

  test("path params bind through route translation") {
    val j = mapper.readTree(get("/customers/3").body())
    assert(j.get("data").size() == 1)
    assert(j.get("data").get(0).get("name").asText() == "carol")
  }

  test("validation failure returns 400 with field errors") {
    val r = get("/customers?id=abc")
    assert(r.statusCode() == 400)
    val j = mapper.readTree(r.body())
    assert(j.get("errors").get(0).get("field").asText() == "id")
    val r2 = get("/customers?segment=C")
    assert(r2.statusCode() == 400)
  }

  test("content negotiation: csv via ?format= and Accept header") {
    val r = get("/customers?format=csv&limit=1")
    assert(r.headers().firstValue("Content-Type").get().startsWith("text/csv"))
    assert(r.body().startsWith("key,name,segment\n"))
    val r2 = get("/customers?limit=1", "Accept" -> "text/csv")
    assert(r2.body().startsWith("key,name,segment\n"))
  }

  test("arrow stream round-trips") {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(base + "/customers?format=arrow&limit=3")).build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(r.headers().firstValue("Content-Type").get()
      .startsWith("application/vnd.apache.arrow.stream"))
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(r.body()), alloc)
    try {
      assert(reader.loadNextBatch())
      assert(reader.getVectorSchemaRoot.getRowCount == 3)
    } finally { reader.close(); alloc.close() }
  }

  test("POST write executes multi-statement template and returns 201") {
    val r = post("/notes", """{"note":"hello; world"}""")
    assert(r.statusCode() == 201)
    val j = mapper.readTree(r.body())
    assert(j.get("rows_affected").asLong() == 1L)
    assert(j.get("data").get(0).get("note").asText() == "hello; world")
  }

  test("MCP initialize, tools/list, tools/call") {
    val init = rpc("""{"jsonrpc":"2.0","id":1,"method":"initialize"}""")
    assert(init.get("result").get("serverInfo").get("name").asText() == "graft")
    val tools = rpc("""{"jsonrpc":"2.0","id":2,"method":"tools/list"}""")
    val names = tools.get("result").get("tools").elements()
    val nameSet = Iterator.continually(names).takeWhile(_.hasNext)
      .map(_.next().get("name").asText()).toSet
    assert(nameSet.contains("customers"))
    val call = rpc(
      """{"jsonrpc":"2.0","id":3,"method":"tools/call",
        |"params":{"name":"customers","arguments":{"segment":"B"}}}""".stripMargin)
    val text = call.get("result").get("content").get(0).get("text").asText()
    val rows = mapper.readTree(text)
    assert(rows.size() == 2)
    assert(rows.get(0).get("segment").asText() == "B")
  }

  test("MCP response shaping caps rows") {
    val call = rpc(
      """{"jsonrpc":"2.0","id":4,"method":"tools/call",
        |"params":{"name":"customers","arguments":{}}}""".stripMargin)
    val rows = mapper.readTree(
      call.get("result").get("content").get(0).get("text").asText())
    assert(rows.size() == 2) // shape.maxRows = 2 of 4
  }

  test("MCP _dryRun returns rendered SQL without executing") {
    val call = rpc(
      """{"jsonrpc":"2.0","id":5,"method":"tools/call",
        |"params":{"name":"customers","arguments":{"id":"7","_dryRun":true}}}""".stripMargin)
    val res = call.get("result")
    assert(res.get("_meta").get("dryRun").asBoolean())
    val sql = res.get("content").get(0).get("text").asText()
    assert(sql.contains("FROM srv_customers"))
    assert(sql.contains("AND id = 7")) // in-section ref rendered (validated int)
  }

  test("openapi.json documents endpoints, params, and inferred response schema") {
    val j = mapper.readTree(get("/openapi.json").body())
    assert(j.get("openapi").asText() == "3.0.0")
    val paths = j.get("paths")
    assert(paths.has("/customers") && paths.has("/customers/{id}") && paths.has("/notes"))
    val getOp = paths.get("/customers").get("get")
    val params = getOp.get("parameters")
    assert(params.get(0).get("name").asText() == "id")
    assert(params.get(0).get("schema").get("type").asText() == "integer")
    val props = getOp.get("responses").get("200").get("content")
      .get("application/json").get("schema").get("properties")
      .get("data").get("items").get("properties")
    assert(props.get("key").get("type").asText() == "integer")
    assert(props.get("name").get("type").asText() == "string")
  }

  test("unknown route 404s; unknown rpc method errors") {
    assert(get("/nope").statusCode() == 404)
    val bad = rpc("""{"jsonrpc":"2.0","id":6,"method":"bogus"}""")
    assert(bad.get("error").get("code").asInt() == -32601)
  }
}
