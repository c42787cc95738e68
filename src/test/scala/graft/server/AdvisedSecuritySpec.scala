package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config._

/** Round-4 advice items, locked as behavior:
  *  1. config tools FAIL CLOSED when no config-service token is set
  *     and mcp auth is enabled (no anonymous endpoint CRUD / SQL exec);
  *  2. a successful write invalidates the serving plan cache even
  *     without cache.invalidate-on-write (read-your-writes);
  *  3. graft_update_template rejects a missing/empty template instead
  *     of bricking the endpoint;
  *  4. failed basic-auth attempts are negative-cached and per-user
  *     throttled (PBKDF2 CPU-burn DoS);
  *  5. the auditor flags an enabled config service with no token.
  */
class AdvisedSecuritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("advised-security-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ss = spark
    import ss.implicits._
    Seq((1L, "alice"), (2L, "bob"))
      .toDF("id", "name").createOrReplaceTempView("adv_customers")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
  }

  private def rpc(base: String, body: String,
                  headers: (String, String)*): com.fasterxml.jackson.databind.JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(base + "/mcp/jsonrpc"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    mapper.readTree(client.send(b.build(), HttpResponse.BodyHandlers.ofString()).body())
  }

  private def resultText(j: com.fasterxml.jackson.databind.JsonNode) =
    j.get("result").get("content").get(0).get("text").asText()

  private def basic(user: String, pass: String): String =
    "Basic " + Base64.getEncoder.encodeToString(s"$user:$pass".getBytes("UTF-8"))

  test("config tools fail closed without a token when mcp auth is enabled") {
    val srv = new GraftServer(spark,
      Seq(ServedEndpoint(
        EndpointConfig(urlPath = "/adv", templateSource = "a.sql",
          withPagination = false),
        "SELECT id FROM adv_customers ORDER BY id")
        .copy(allowedRoles = Some(Seq("admin")))),
      mcpAuthEnabled = true,
      basicAuth = Some(BasicAuthConfig(Map(
        "op" -> ((PasswordHasher.hash("oppw", 1000), Seq("admin")))))),
      configService = Some(ConfigServiceConfig(token = None))).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      // anonymous: denied — both reads and mutations
      val anon = rpc(base,
        """{"jsonrpc":"2.0","id":1,"method":"tools/call",
          |"params":{"name":"graft_list_endpoints","arguments":{}}}""".stripMargin)
      assert(anon.get("result").get("isError").asBoolean())
      assert(resultText(anon).contains("Unauthorized"))
      val anonMut = rpc(base,
        """{"jsonrpc":"2.0","id":2,"method":"tools/call",
          |"params":{"name":"graft_delete_endpoint","arguments":{"slug":"adv"}}}""".stripMargin)
      assert(anonMut.get("result").get("isError").asBoolean())

      // an authenticated session passes the fallback gate
      val authed = rpc(base,
        """{"jsonrpc":"2.0","id":3,"method":"tools/call",
          |"params":{"name":"graft_list_endpoints","arguments":{}}}""".stripMargin,
        "Authorization" -> basic("op", "oppw"))
      assert(!authed.get("result").path("isError").asBoolean(false))
      assert(resultText(authed).contains("adv"))
    } finally srv.stop()
  }

  test("a successful write invalidates cached plans without invalidate-on-write") {
    val loc = java.nio.file.Files.createTempDirectory("adv_ryw").toFile
    val write = ServedEndpoint(
      EndpointConfig(urlPath = "/ryw-notes", method = "POST",
        templateSource = "w.sql", isWrite = true,
        requestFields = Seq(RequestFieldConfig("note", required = true,
          validators = Seq(ValidatorConfig("string", min = 1, max = 100))))),
      """CREATE TABLE IF NOT EXISTS adv_ryw_notes (note STRING) USING parquet LOCATION '{{conn.loc}}';
        |INSERT INTO adv_ryw_notes VALUES ({{params.note}})""".stripMargin,
      connProps = Map("loc" -> loc.getAbsolutePath))
    val read = ServedEndpoint(
      EndpointConfig(urlPath = "/ryw-notes-list", templateSource = "r.sql",
        withPagination = false),
      "SELECT note FROM adv_ryw_notes ORDER BY note")
    spark.sql("DROP TABLE IF EXISTS adv_ryw_notes")
    val srv = new GraftServer(spark, Seq(write, read)).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      def post(note: String) = client.send(
        HttpRequest.newBuilder(URI.create(base + "/ryw-notes"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(s"""{"note":"$note"}"""))
          .build(), HttpResponse.BodyHandlers.ofString())
      def listNotes(): Seq[String] = {
        val r = client.send(
          HttpRequest.newBuilder(URI.create(base + "/ryw-notes-list")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        val j = mapper.readTree(r.body())
        (0 until j.size()).map(j.get(_).get("note").asText())
      }
      assert(post("first").statusCode() == 201)
      assert(listNotes() == Seq("first")) // plan now cached
      assert(post("second").statusCode() == 201)
      // within the plan-cache TTL: the write must have bumped the
      // generation, or this GET serves the pre-write file index
      assert(listNotes() == Seq("first", "second"))
    } finally {
      srv.stop()
      spark.sql("DROP TABLE IF EXISTS adv_ryw_notes")
    }
  }

  test("graft_update_template rejects empty and invalid templates") {
    val token = "adv-token"
    val srv = new GraftServer(spark,
      Seq(ServedEndpoint(
        EndpointConfig(urlPath = "/tpl", templateSource = "t.sql",
          withPagination = false),
        "SELECT id FROM adv_customers ORDER BY id")),
      configService = Some(ConfigServiceConfig(token = Some(token)))).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    val auth = "Authorization" -> s"Bearer $token"
    try {
      // missing argument → error, endpoint untouched
      val missing = rpc(base,
        """{"jsonrpc":"2.0","id":1,"method":"tools/call",
          |"params":{"name":"graft_update_template","arguments":{"slug":"tpl"}}}""".stripMargin,
        auth)
      assert(missing.get("result").get("isError").asBoolean())
      assert(resultText(missing).contains("empty template"))
      val tmpl = rpc(base,
        """{"jsonrpc":"2.0","id":2,"method":"tools/call",
          |"params":{"name":"graft_get_template","arguments":{"slug":"tpl"}}}""".stripMargin,
        auth)
      assert(resultText(tmpl).contains("adv_customers"))

      // a valid replacement installs
      val ok = rpc(base,
        """{"jsonrpc":"2.0","id":3,"method":"tools/call",
          |"params":{"name":"graft_update_template","arguments":{"slug":"tpl",
          |"template":"SELECT name FROM adv_customers ORDER BY name"}}}""".stripMargin,
        auth)
      assert(!ok.get("result").path("isError").asBoolean(false), ok.toString)
    } finally srv.stop()
  }

  test("failed basic-auth attempts are negative-cached and throttled") {
    BasicAuth.resetState()
    val cfg = BasicAuthConfig(Map(
      "victim" -> ((PasswordHasher.hash("rightpw", 1000), Seq("user")))))
    def attempt(pass: String): Boolean =
      BasicAuth.authenticate(cfg, Some(basic("victim", pass))).isDefined

    assert(attempt("rightpw"))
    assert(!attempt("wrong-1"))
    // same wrong credential again: negative cache answers without
    // PBKDF2 — observable as idempotent failure
    assert(!attempt("wrong-1"))
    // distinct wrong passwords exhaust the per-user failure budget...
    (2 to 12).foreach(i => assert(!attempt(s"wrong-$i")))
    // ...after which even a NEW wrong password fails fast (throttled)
    assert(!attempt("wrong-new"))
    // the correct password still authenticates via the positive cache
    assert(attempt("rightpw"))
    BasicAuth.resetState()
  }

  test("rotating client addresses cannot bypass the per-user failure cap") {
    BasicAuth.resetState()
    val cfg = BasicAuthConfig(Map(
      "target" -> ((PasswordHasher.hash("goodpw", 1000), Seq("user")))))
    def attempt(pass: String, client: String): Boolean =
      BasicAuth.authenticate(cfg, Some(basic("target", pass)), client).isDefined
    // 10 clients × 10 distinct wrong passwords: each client stays just
    // under its own 10/min throttle, so without a global cap the brute
    // force continues indefinitely by rotating source addresses
    for (c <- 1 to 10; i <- 1 to 10)
      assert(!attempt(s"wrong-$c-$i", s"10.0.0.$c"))
    // the global per-user cap now blocks even a FRESH client before
    // PBKDF2 runs — observable because the correct password (never
    // positively cached in this spec) is rejected too
    assert(!attempt("goodpw", "10.9.9.9"))
    BasicAuth.resetState()
    assert(attempt("goodpw", "10.9.9.9"))
    BasicAuth.resetState()
  }

  test("auditor flags an enabled config service without a token") {
    val codes = SecurityAuditor.audit(Nil,
      configService = Some(ConfigServiceConfig(token = None))).map(_.code)
    assert(codes.contains("CONFIG_SERVICE_NO_TOKEN"))
    val withToken = SecurityAuditor.audit(Nil,
      configService = Some(ConfigServiceConfig(token = Some("t")))).map(_.code)
    assert(!withToken.contains("CONFIG_SERVICE_NO_TOKEN"))
  }
}
