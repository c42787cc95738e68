package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config._

/** MCP RBAC (deny-by-default under auth), per-tool rate limiting,
  * basic auth, and CORS — the reference's test_mcp_rbac.py /
  * rate-limit / CORS suites in black-box form. */
class McpSecuritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var server: GraftServer = _
  private var base: String = _
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private def ep(path: String) = ServedEndpoint(
    EndpointConfig(urlPath = path, templateSource = "t.sql"),
    "SELECT 1 AS one")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("mcp-security-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    server = new GraftServer(
      spark,
      Seq(
        ep("/admin-tool").copy(allowedRoles = Some(Seq("admin"))),
        ep("/unconfigured-tool"), // no allowed-roles → deny-by-default
        ep("/limited-tool").copy(
          allowedRoles = Some(Seq("admin", "dev")),
          rateLimit = Some(RateLimitConfig(requestsPerMinute = 2)))),
      mcpAuthEnabled = true,
      basicAuth = Some(BasicAuthConfig(Map(
        "admin" -> ((PasswordHasher.hash("adminpw", 1000), Seq("admin"))),
        "dev" -> ((PasswordHasher.hash("devpw", 1000), Seq("dev"))))))).start()
    base = s"http://127.0.0.1:${server.boundPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    if (spark != null) spark.stop()
  }

  private def basic(user: String, pass: String): String =
    "Basic " + Base64.getEncoder.encodeToString(s"$user:$pass".getBytes("UTF-8"))

  private def call(tool: String, cred: Option[(String, String)]): com.fasterxml.jackson.databind.JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(base + "/mcp/jsonrpc"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        s"""{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"$tool","arguments":{}}}"""))
    cred.foreach { case (u, p) => b.header("Authorization", basic(u, p)) }
    mapper.readTree(client.send(b.build(), HttpResponse.BodyHandlers.ofString()).body())
  }

  private def resultText(j: com.fasterxml.jackson.databind.JsonNode): String =
    j.get("result").get("content").get(0).get("text").asText()

  test("REST requires credentials when basic auth is configured") {
    val unauth = client.send(
      HttpRequest.newBuilder(URI.create(base + "/admin-tool")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(unauth.statusCode() == 401)
    assert(unauth.headers().firstValue("WWW-Authenticate").isPresent)
    val ok = client.send(
      HttpRequest.newBuilder(URI.create(base + "/admin-tool"))
        .header("Authorization", basic("dev", "devpw")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(ok.statusCode() == 200)
  }

  test("RBAC: role mismatch denied, matching role allowed") {
    val denied = call("admin-tool", Some("dev" -> "devpw"))
    assert(resultText(denied).startsWith("Permission denied"))
    assert(denied.get("result").get("isError").asBoolean())
    val allowed = call("admin-tool", Some("admin" -> "adminpw"))
    assert(resultText(allowed).contains("\"one\":1"))
  }

  test("RBAC: tool without allowed-roles is deny-by-default under auth") {
    val denied = call("unconfigured-tool", Some("admin" -> "adminpw"))
    assert(resultText(denied).contains("no allowed-roles"))
  }

  test("anonymous caller denied when auth enabled") {
    val denied = call("admin-tool", None)
    assert(resultText(denied).startsWith("Permission denied"))
  }

  test("per-tool rate limit trips after capacity and reports retry-after") {
    val r1 = call("limited-tool", Some("dev" -> "devpw"))
    val r2 = call("limited-tool", Some("dev" -> "devpw"))
    assert(resultText(r1).contains("\"one\":1") && resultText(r2).contains("\"one\":1"))
    val r3 = call("limited-tool", Some("dev" -> "devpw"))
    assert(resultText(r3).contains("Rate limit exceeded"))
    assert(r3.get("result").get("_meta").get("retry_after_seconds").asLong() >= 1L)
    // a different principal has its own bucket
    val other = call("limited-tool", Some("admin" -> "adminpw"))
    assert(resultText(other).contains("\"one\":1"))
  }

  test("CORS: preflight 204, responses carry Allow-Origin") {
    val pre = client.send(
      HttpRequest.newBuilder(URI.create(base + "/admin-tool"))
        .method("OPTIONS", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(pre.statusCode() == 204)
    assert(pre.headers().firstValue("Access-Control-Allow-Origin").get() == "*")
    assert(pre.headers().firstValue("Access-Control-Allow-Methods").get()
      .contains("POST"))
  }

  test("anonymous rate limit is not bypassable by omitting or forging session ids") {
    // auth-less server: anonymous callers must share ONE bucket, and a
    // forged/rotating Mcp-Session-Id must not mint a fresh one
    val anon = new GraftServer(spark, Seq(ServedEndpoint(
      EndpointConfig(urlPath = "/anon-limited", templateSource = "t.sql",
        withPagination = false),
      "SELECT 1 AS one",
      rateLimit = Some(RateLimitConfig(requestsPerMinute = 2))))).start()
    try {
      val anonBase = s"http://127.0.0.1:${anon.boundPort}"
      def callAnon(headers: (String, String)*): com.fasterxml.jackson.databind.JsonNode = {
        val b = HttpRequest.newBuilder(URI.create(anonBase + "/mcp/jsonrpc"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"jsonrpc":"2.0","id":1,"method":"tools/call",
              |"params":{"name":"anon-limited","arguments":{}}}""".stripMargin))
        headers.foreach { case (k, v) => b.header(k, v) }
        mapper.readTree(client.send(b.build(), HttpResponse.BodyHandlers.ofString()).body())
      }
      def text(j: com.fasterxml.jackson.databind.JsonNode) =
        j.get("result").get("content").get(0).get("text").asText()
      assert(text(callAnon()).contains("\"one\":1"))
      assert(text(callAnon("Mcp-Session-Id" -> "forged-1")).contains("\"one\":1"))
      // bucket exhausted — forging a NEW id must not refill it
      val third = callAnon("Mcp-Session-Id" -> "forged-2")
      assert(text(third).contains("Rate limit exceeded"),
        s"forged session id bypassed the rate limit: $third")
      val fourth = callAnon()
      assert(text(fourth).contains("Rate limit exceeded"))
      // a session the SERVER issued (presented back) gets its own bucket
      val init = client.send(HttpRequest.newBuilder(URI.create(anonBase + "/mcp/jsonrpc"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"jsonrpc":"2.0","id":2,"method":"initialize"}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      val sid = init.headers().firstValue("Mcp-Session-Id").get()
      assert(text(callAnon("Mcp-Session-Id" -> sid)).contains("\"one\":1"))
    } finally anon.stop()
  }

  // ---- sessions (Mcp-Session-Id round-trip) ------------------------------

  private def rawRpc(body: String, headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + "/mcp/jsonrpc"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("MCP session: issued at initialize, echoed when presented, replaced when stale") {
    val init = rawRpc(
      """{"jsonrpc":"2.0","id":1,"method":"initialize",
        |"params":{"protocolVersion":"2024-11-05",
        |"capabilities":{"sampling":true,"roots":false}}}""".stripMargin)
    val sid = init.headers().firstValue("Mcp-Session-Id").orElse("")
    assert(sid.nonEmpty, "initialize must issue a session id")
    // presenting the id gets the SAME id echoed back
    val ping = rawRpc("""{"jsonrpc":"2.0","id":2,"method":"ping"}""",
      "Mcp-Session-Id" -> sid)
    assert(ping.headers().firstValue("Mcp-Session-Id").orElse("") == sid)
    // an unknown/expired id is replaced with a fresh session, not trusted
    val stale = rawRpc("""{"jsonrpc":"2.0","id":3,"method":"ping"}""",
      "Mcp-Session-Id" -> "does-not-exist")
    val fresh = stale.headers().firstValue("Mcp-Session-Id").orElse("")
    assert(fresh.nonEmpty && fresh != "does-not-exist")
  }

  test("MCP session: DELETE closes it; DELETE without header is 400") {
    val init = rawRpc("""{"jsonrpc":"2.0","id":4,"method":"initialize"}""")
    val sid = init.headers().firstValue("Mcp-Session-Id").get()
    val del = client.send(
      HttpRequest.newBuilder(URI.create(base + "/mcp/jsonrpc"))
        .header("Mcp-Session-Id", sid)
        .method("DELETE", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(del.statusCode() == 200)
    assert(mapper.readTree(del.body()).get("result").get("closed").asBoolean())
    // closed session is no longer echoed — a new one replaces it
    val after = rawRpc("""{"jsonrpc":"2.0","id":5,"method":"ping"}""",
      "Mcp-Session-Id" -> sid)
    assert(after.headers().firstValue("Mcp-Session-Id").orElse("") != sid)
    val noHeader = client.send(
      HttpRequest.newBuilder(URI.create(base + "/mcp/jsonrpc"))
        .method("DELETE", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(noHeader.statusCode() == 400)
  }

  test("binary result mime emits typed MCP image content with base64 data") {
    val ss = spark
    import ss.implicits._
    Seq((1L, "thumb-a"), (2L, "thumb-b")).toDF("id", "tag")
      .selectExpr("id", "tag", "split(tag, '-') AS parts",
        "cast(tag AS BINARY) AS img")
      .createOrReplaceTempView("mcp_thumbs")
    val binServer = new GraftServer(spark, Seq(ServedEndpoint(
      EndpointConfig(urlPath = "/thumbs", templateSource = "t.sql",
        withPagination = false,
        mcpTool = Some(McpToolConfig(name = "thumbs",
          resultMimeType = "image/png"))),
      "SELECT id, tag, parts, img FROM mcp_thumbs ORDER BY id"))).start()
    try {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${binServer.boundPort}/mcp/jsonrpc"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"jsonrpc":"2.0","id":1,"method":"tools/call",
              |"params":{"name":"thumbs","arguments":{}}}""".stripMargin))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val content = mapper.readTree(r.body()).get("result").get("content")
      val kinds = (0 until content.size()).map(content.get(_).get("type").asText())
      assert(kinds.count(_ == "image") == 2 && kinds.count(_ == "text") == 1)
      val img0 = content.get(0)
      assert(img0.get("mimeType").asText() == "image/png")
      assert(new String(Base64.getDecoder.decode(
        img0.get("data").asText())) == "thumb-a")
      // non-binary columns — including nested array columns — ride in
      // the text item through the standard wire codec
      val text = content.get(content.size() - 1).get("text").asText()
      assert(text.contains("\"tag\":\"thumb-b\"") && !text.contains("img"))
      assert(text.contains("\"parts\":[\"thumb\",\"b\"]"))
    } finally binServer.stop()
  }

  test("client capability negotiation parses sampling/roots/protocols") {
    val params = mapper.readTree(
      """{"capabilities":{"sampling":true,"roots":false,
        |"transport":{"supportedProtocols":["http","stdio"]}}}""".stripMargin)
    val caps = McpClientCapabilities.detectFromInitialize(params)
    assert(caps.supportsSampling && !caps.supportsRoots)
    assert(caps.supportedProtocols == Seq("http", "stdio"))
    // session manager: expiry drops a session lazily
    var now = 0L
    val mgr = new McpSessionManager(timeoutMinutes = 30, clock = () => now)
    val id = mgr.createSession("2024-11-05", caps)
    assert(mgr.getSession(id).exists(_.capabilities.supportsSampling))
    now = 31 * 60000L
    assert(mgr.getSession(id).isEmpty)
  }
}
