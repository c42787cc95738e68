package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config._

/** JWT bearer auth, REST-path rate limiting, and the full MCP method
  * surface (resources/prompts/completion/logging) — the reference
  * covers these with test_mcp_methods.py + auth middleware tests. */
class AuthSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var server: GraftServer = _
  private var rlServer: GraftServer = _
  private var base: String = _
  private var rlBase: String = _
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()
  private val jwtCfg = JwtConfig(secret = "spec-secret", issuer = Some("graft-spec"))

  private val adminTool = ServedEndpoint(
    EndpointConfig(urlPath = "/admin-data", templateSource = "t.sql",
      withPagination = false),
    "SELECT 42 AS answer",
    allowedRoles = Some(Seq("admin")))

  private val schemaResource = ServedEndpoint(
    EndpointConfig(urlPath = "/schema-res", templateSource = "r.sql",
      mcpResource = Some(McpResourceConfig(
        name = "customer_schema", description = "customer columns"))),
    "SELECT 'c_custkey' AS column_name",
    allowedRoles = Some(Seq("admin")))

  private val lookupPrompt = ServedEndpoint(
    EndpointConfig(urlPath = "/lookup-prompt", templateSource = "p.sql",
      requestFields = Seq(RequestFieldConfig("segment",
        validators = Seq(ValidatorConfig("enum",
          allowedValues = Seq("AUTOMOBILE", "BUILDING", "MACHINERY"))))),
      mcpPrompt = Some(McpPromptConfig(
        name = "customer_lookup", description = "find customers",
        template = "Find customers in segment {{segment}} with balance over {{min}}.",
        arguments = Seq("segment", "min")))),
    "SELECT 1 AS one")

  // ---- OIDC fixtures: RSA keypair + static JWKS file ---------------------
  private val rsaKp = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }
  private var jwksPath: java.nio.file.Path = _
  private var oidcServer: GraftServer = _
  private var oidcBase: String = _
  private var oidcCfg: OidcConfig = _

  private def b64url(b: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding().encodeToString(b)
  private def unsigned(bi: java.math.BigInteger): Array[Byte] = {
    val b = bi.toByteArray
    if (b.length > 1 && b(0) == 0) b.drop(1) else b
  }

  /** Mint an RS256 token with the spec keypair under the given kid. */
  private def rs256Token(kid: String, claimsJson: String): String = {
    val enc = java.util.Base64.getUrlEncoder.withoutPadding()
    val h = enc.encodeToString(
      s"""{"alg":"RS256","typ":"JWT","kid":"$kid"}""".getBytes("UTF-8"))
    val p = enc.encodeToString(claimsJson.getBytes("UTF-8"))
    val s = java.security.Signature.getInstance("SHA256withRSA")
    s.initSign(rsaKp.getPrivate)
    s.update(s"$h.$p".getBytes("UTF-8"))
    s"$h.$p.${enc.encodeToString(s.sign())}"
  }

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("auth-surface-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    server = new GraftServer(spark,
      Seq(adminTool, schemaResource, lookupPrompt),
      mcpAuthEnabled = true,
      jwtAuth = Some(jwtCfg)).start()
    base = s"http://127.0.0.1:${server.boundPort}"
    val pub = rsaKp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]
    jwksPath = java.nio.file.Files.createTempFile("graft_jwks", ".json")
    java.nio.file.Files.writeString(jwksPath,
      s"""{"keys":[{"kty":"RSA","kid":"spec-key","use":"sig","alg":"RS256",
         |"n":"${b64url(unsigned(pub.getModulus))}",
         |"e":"${b64url(unsigned(pub.getPublicExponent))}"}]}""".stripMargin.replace("\n", ""))
    oidcCfg = OidcConfig(
      providerType = "generic", issuerUrl = "https://issuer.spec",
      clientId = "graft-client", jwksSource = jwksPath.toString)
    oidcServer = new GraftServer(spark, Seq(adminTool),
      mcpAuthEnabled = true, oidcAuth = Some(oidcCfg)).start()
    oidcBase = s"http://127.0.0.1:${oidcServer.boundPort}"
    auditPath = java.nio.file.Files.createTempFile("graft_audit", ".jsonl")
    java.nio.file.Files.delete(auditPath)
    rlServer = new GraftServer(spark, Seq(ServedEndpoint(
      EndpointConfig(urlPath = "/ping-data", templateSource = "t.sql",
        withPagination = false),
      "SELECT 1 AS one")),
      restRateLimit = Some(RateLimitConfig(requestsPerMinute = 2)),
      audit = Some(RequestAuditConfig(auditPath.toString))).start()
    rlBase = s"http://127.0.0.1:${rlServer.boundPort}"
  }

  private var auditPath: java.nio.file.Path = _

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    if (rlServer != null) rlServer.stop()
    if (oidcServer != null) oidcServer.stop()
    if (spark != null) spark.stop()
  }

  private def token(claims: Map[String, Any]): String = JwtAuth.sign(jwtCfg, claims)

  private def get(b: String, path: String, headers: (String, String)*): HttpResponse[String] = {
    val rb = HttpRequest.newBuilder(URI.create(b + path))
    headers.foreach { case (k, v) => rb.header(k, v) }
    client.send(rb.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def rpc(body: String, headers: (String, String)*): com.fasterxml.jackson.databind.JsonNode = {
    val rb = HttpRequest.newBuilder(URI.create(base + "/mcp/jsonrpc"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => rb.header(k, v) }
    mapper.readTree(client.send(rb.build(), HttpResponse.BodyHandlers.ofString()).body())
  }

  private val far = System.currentTimeMillis() / 1000L + 3600L

  // ---- JWT -----------------------------------------------------------------

  test("valid JWT authenticates REST; claims drive the auth params") {
    val t = token(Map("sub" -> "alice", "roles" -> Seq("admin"),
      "iss" -> "graft-spec", "exp" -> far))
    val r = get(base, "/admin-data", "Authorization" -> s"Bearer $t")
    assert(r.statusCode() == 200)
    assert(mapper.readTree(r.body()).get(0).get("answer").asInt() == 42)
  }

  test("expired, unsigned-tampered, garbage, and wrong-issuer JWTs are 401") {
    val expired = token(Map("sub" -> "a", "iss" -> "graft-spec",
      "exp" -> (System.currentTimeMillis() / 1000L - 10)))
    assert(get(base, "/admin-data", "Authorization" -> s"Bearer $expired").statusCode() == 401)
    val good = token(Map("sub" -> "a", "iss" -> "graft-spec", "exp" -> far))
    val tampered = {
      val parts = good.split('.')
      val enc = java.util.Base64.getUrlEncoder.withoutPadding()
      val forged = enc.encodeToString(
        """{"sub":"mallory","roles":["admin"],"iss":"graft-spec"}""".getBytes("UTF-8"))
      s"${parts(0)}.$forged.${parts(2)}"
    }
    assert(get(base, "/admin-data", "Authorization" -> s"Bearer $tampered").statusCode() == 401)
    assert(get(base, "/admin-data", "Authorization" -> "Bearer not.a.jwt").statusCode() == 401)
    assert(get(base, "/admin-data", "Authorization" -> "Bearer garbage").statusCode() == 401)
    val wrongIss = JwtAuth.sign(jwtCfg.copy(issuer = None),
      Map("sub" -> "a", "iss" -> "evil", "exp" -> far))
    assert(get(base, "/admin-data", "Authorization" -> s"Bearer $wrongIss").statusCode() == 401)
    assert(get(base, "/admin-data").statusCode() == 401)
  }

  test("alg:none downgrade is rejected") {
    val enc = java.util.Base64.getUrlEncoder.withoutPadding()
    val h = enc.encodeToString("""{"alg":"none","typ":"JWT"}""".getBytes("UTF-8"))
    val p = enc.encodeToString(
      s"""{"sub":"mallory","roles":["admin"],"iss":"graft-spec","exp":$far}""".getBytes("UTF-8"))
    assert(get(base, "/admin-data", "Authorization" -> s"Bearer $h.$p.").statusCode() == 401)
  }

  test("JWT role claim drives MCP RBAC") {
    val admin = token(Map("sub" -> "alice", "roles" -> Seq("admin"),
      "iss" -> "graft-spec", "exp" -> far))
    val dev = token(Map("sub" -> "bob", "roles" -> Seq("dev"),
      "iss" -> "graft-spec", "exp" -> far))
    def call(t: String) = rpc(
      """{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"admin-data","arguments":{}}}""",
      "Authorization" -> s"Bearer $t")
    val ok = call(admin)
    assert(ok.get("result").get("content").get(0).get("text").asText().contains("42"))
    val denied = call(dev)
    assert(denied.get("result").get("isError").asBoolean())
    assert(denied.get("result").get("content").get(0).get("text").asText()
      .contains("Permission denied"))
  }

  // ---- REST rate limiting --------------------------------------------------

  test("REST rate limit returns 429 + Retry-After after capacity") {
    assert(get(rlBase, "/ping-data").statusCode() == 200)
    assert(get(rlBase, "/ping-data").statusCode() == 200)
    val third = get(rlBase, "/ping-data")
    assert(third.statusCode() == 429)
    assert(third.headers().firstValue("Retry-After").get().toLong >= 1L)
  }

  test("rate limit buckets key on the route pattern, not the concrete URI") {
    // /rl/:id shares ONE bucket across ids — a per-URI key would be
    // bypassable by iterating ids
    val srv = new GraftServer(spark, Seq(ServedEndpoint(
      EndpointConfig(urlPath = "/rl/:id", templateSource = "t.sql",
        withPagination = false,
        requestFields = Seq(RequestFieldConfig("id"))),
      "SELECT {{params.id}} AS got"),
      ),
      restRateLimit = Some(RateLimitConfig(requestsPerMinute = 2))).start()
    try {
      val b = s"http://127.0.0.1:${srv.boundPort}"
      assert(get(b, "/rl/1").statusCode() == 200)
      assert(get(b, "/rl/2").statusCode() == 200)
      assert(get(b, "/rl/3").statusCode() == 429) // third id, same bucket
    } finally srv.stop()
  }

  test("key-strategy 'user': two users behind one address get separate buckets") {
    // reference rate_limit_key_builder.cpp:26-44 — under `ip` a NAT'd
    // fleet shares one bucket; `user` keys on a hash of the
    // Authorization header instead (both spec clients share 127.0.0.1)
    val srv = new GraftServer(spark, Seq(ServedEndpoint(
      EndpointConfig(urlPath = "/u-data", templateSource = "t.sql",
        withPagination = false),
      "SELECT 1 AS one")),
      restRateLimit = Some(RateLimitConfig(requestsPerMinute = 2,
        keyStrategy = "user"))).start()
    try {
      val b = s"http://127.0.0.1:${srv.boundPort}"
      val alice = "Authorization" -> "Bearer alice-token"
      val bob = "Authorization" -> "Bearer bob-token"
      assert(get(b, "/u-data", alice).statusCode() == 200)
      assert(get(b, "/u-data", alice).statusCode() == 200)
      assert(get(b, "/u-data", alice).statusCode() == 429) // alice exhausted
      // bob shares alice's remote address but NOT her bucket
      assert(get(b, "/u-data", bob).statusCode() == 200)
      // header-less callers pool under the anonymous marker, separate
      // from both users
      assert(get(b, "/u-data").statusCode() == 200)
    } finally srv.stop()
  }

  test("key-strategy 'user-or-ip': anonymous falls back to the client address") {
    val srv = new GraftServer(spark, Seq(ServedEndpoint(
      EndpointConfig(urlPath = "/ui-data", templateSource = "t.sql",
        withPagination = false),
      "SELECT 1 AS one")),
      restRateLimit = Some(RateLimitConfig(requestsPerMinute = 2,
        keyStrategy = "user-or-ip"))).start()
    try {
      val b = s"http://127.0.0.1:${srv.boundPort}"
      // two anonymous requests exhaust the ADDRESS bucket…
      assert(get(b, "/ui-data").statusCode() == 200)
      assert(get(b, "/ui-data").statusCode() == 200)
      assert(get(b, "/ui-data").statusCode() == 429)
      // …but an authenticated caller from the same address proceeds
      assert(get(b, "/ui-data",
        "Authorization" -> "Bearer carol-token").statusCode() == 200)
    } finally srv.stop()
    // the principal is a hash, never the plaintext token (it gets
    // logged in bucket keys), and unknown strategies preserve `ip`
    assert(!RateLimitKey.principal("user", "1.2.3.4",
      Some("Bearer secret-token")).contains("secret"))
    assert(RateLimitKey.principal("user", "1.2.3.4", None) == "anonymous")
    assert(RateLimitKey.principal("bogus", "1.2.3.4",
      Some("Bearer x")) == "1.2.3.4")
  }

  test("request audit log records every request as queryable JSONL") {
    get(rlBase, "/no-such-route") // a 404 is audited too
    val lines = java.nio.file.Files.readAllLines(auditPath)
    assert(lines.size() >= 4) // 3 rate-limit-test requests + the 404
    val parsed = lines.toArray.map(l => mapper.readTree(l.toString))
    assert(parsed.forall(j => j.has("ts") && j.has("method") && j.has("path")
      && j.has("status") && j.has("duration_ms")))
    assert(parsed.exists(_.get("status").asInt() == 429))
    assert(parsed.exists(j => j.get("status").asInt() == 404
      && j.get("path").asText() == "/no-such-route"))
    // and it reads back through the engine
    val df = spark.read.json(auditPath.toString)
    assert(df.count() >= 4)
    assert(df.columns.toSet.contains("principal"))
  }

  // ---- MCP surface ---------------------------------------------------------

  test("initialize advertises resources/prompts/logging/completions") {
    val caps = rpc("""{"jsonrpc":"2.0","id":2,"method":"initialize"}""")
      .get("result").get("capabilities")
    assert(caps.has("tools")); assert(caps.has("resources"))
    assert(caps.has("prompts")); assert(caps.has("logging"))
    assert(caps.has("completions"))
  }

  test("resources/list + resources/read serve endpoint content under RBAC") {
    val admin = token(Map("sub" -> "alice", "roles" -> Seq("admin"),
      "iss" -> "graft-spec", "exp" -> far))
    val listed = rpc("""{"jsonrpc":"2.0","id":3,"method":"resources/list"}""")
      .get("result").get("resources")
    assert(listed.size() == 1)
    assert(listed.get(0).get("uri").asText() == "graft://customer_schema")
    assert(listed.get(0).get("mimeType").asText() == "application/json")

    val read = rpc(
      """{"jsonrpc":"2.0","id":4,"method":"resources/read","params":{"uri":"graft://customer_schema"}}""",
      "Authorization" -> s"Bearer $admin")
    val content = read.get("result").get("contents").get(0)
    assert(content.get("uri").asText() == "graft://customer_schema")
    val rows = mapper.readTree(content.get("text").asText())
    assert(rows.get(0).get("column_name").asText() == "c_custkey")

    val denied = rpc(
      """{"jsonrpc":"2.0","id":5,"method":"resources/read","params":{"uri":"graft://customer_schema"}}""")
    assert(denied.get("error").get("message").asText().contains("Permission denied"))

    val missing = rpc(
      """{"jsonrpc":"2.0","id":6,"method":"resources/read","params":{"uri":"graft://nope"}}""")
    assert(missing.get("error").get("code").asInt() == -32602)
  }

  test("prompts/list + prompts/get substitute arguments") {
    val listed = rpc("""{"jsonrpc":"2.0","id":7,"method":"prompts/list"}""")
      .get("result").get("prompts")
    assert(listed.size() == 1)
    assert(listed.get(0).get("name").asText() == "customer_lookup")
    assert(listed.get(0).get("arguments").size() == 2)

    val got = rpc(
      """{"jsonrpc":"2.0","id":8,"method":"prompts/get",
        |"params":{"name":"customer_lookup","arguments":{"segment":"BUILDING","min":1000}}}""".stripMargin)
    val text = got.get("result").get("messages").get(0).get("content").get("text").asText()
    assert(text == "Find customers in segment BUILDING with balance over 1000.")

    val missing = rpc(
      """{"jsonrpc":"2.0","id":9,"method":"prompts/get","params":{"name":"nope"}}""")
    assert(missing.get("error").get("code").asInt() == -32602)
  }

  test("completion/complete filters enum values by prefix") {
    val done = rpc(
      """{"jsonrpc":"2.0","id":10,"method":"completion/complete",
        |"params":{"ref":"lookup-prompt","argument":"segment","value":"B"}}""".stripMargin)
    val res = done.get("result")
    assert(res.get("values").size() == 1)
    assert(res.get("values").get(0).asText() == "BUILDING")
    assert(res.get("total").asInt() == 3)
    assert(!res.get("hasMore").asBoolean())

    val byPrompt = rpc(
      """{"jsonrpc":"2.0","id":11,"method":"completion/complete",
        |"params":{"ref":"customer_lookup","argument":"segment"}}""".stripMargin)
    assert(byPrompt.get("result").get("values").size() == 3)

    val badRef = rpc(
      """{"jsonrpc":"2.0","id":12,"method":"completion/complete",
        |"params":{"ref":"nope","argument":"segment"}}""".stripMargin)
    assert(badRef.get("error").get("code").asInt() == -32602)
  }

  test("logging/setLevel validates and applies the level") {
    val ok = rpc(
      """{"jsonrpc":"2.0","id":13,"method":"logging/setLevel","params":{"level":"error"}}""")
    assert(ok.get("result") != null && ok.get("result").size() == 0)
    val bad = rpc(
      """{"jsonrpc":"2.0","id":14,"method":"logging/setLevel","params":{"level":"chatty"}}""")
    assert(bad.get("error").get("code").asInt() == -32602)
  }

  // ---- OIDC (RS256 + JWKS) -----------------------------------------------

  private def oidcClaims(roles: String = """["admin"]""",
                         aud: String = "graft-client",
                         exp: Long = 0L): String = {
    val e = if (exp == 0L) far else exp
    s"""{"sub":"alice","iss":"https://issuer.spec","aud":"$aud",
       |"exp":$e,"roles":$roles,"email":"alice@spec"}""".stripMargin.replace("\n", "")
  }

  test("OIDC RS256 token verifies against the JWKS and authenticates REST") {
    val t = rs256Token("spec-key", oidcClaims())
    val r = get(oidcBase, "/admin-data", "Authorization" -> s"Bearer $t")
    assert(r.statusCode() == 200)
    assert(mapper.readTree(r.body()).get(0).get("answer").asInt() == 42)
  }

  test("OIDC: wrong kid, expired token, and wrong audience are 401") {
    val wrongKid = rs256Token("rotated-away", oidcClaims())
    assert(get(oidcBase, "/admin-data",
      "Authorization" -> s"Bearer $wrongKid").statusCode() == 401)
    val expired = rs256Token("spec-key",
      oidcClaims(exp = System.currentTimeMillis() / 1000L - 10))
    assert(get(oidcBase, "/admin-data",
      "Authorization" -> s"Bearer $expired").statusCode() == 401)
    val wrongAud = rs256Token("spec-key", oidcClaims(aud = "other-app"))
    assert(get(oidcBase, "/admin-data",
      "Authorization" -> s"Bearer $wrongAud").statusCode() == 401)
  }

  test("OIDC roles claim drives MCP RBAC") {
    def call(roles: String): com.fasterxml.jackson.databind.JsonNode = {
      val t = rs256Token("spec-key", oidcClaims(roles = roles))
      val rb = HttpRequest.newBuilder(URI.create(oidcBase + "/mcp/jsonrpc"))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Bearer $t")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"jsonrpc":"2.0","id":20,"method":"tools/call",
            |"params":{"name":"admin-data","arguments":{}}}""".stripMargin))
      mapper.readTree(client.send(rb.build(), HttpResponse.BodyHandlers.ofString()).body())
    }
    val allowed = call("""["admin"]""")
    assert(allowed.has("result") && !allowed.get("result").path("isError").asBoolean(false))
    val denied = call("""["intern"]""")
    assert(denied.path("result").path("isError").asBoolean(false),
      s"expected RBAC denial, got: $denied")
  }

  test("OIDC nested role-claim path (Keycloak realm_access.roles)") {
    val kc = oidcCfg.copy(roleClaimPath = "realm_access.roles")
    val jwks = new JwksManager()
    val t = rs256Token("spec-key",
      s"""{"sub":"bob","iss":"https://issuer.spec","aud":"graft-client",
         |"exp":$far,"realm_access":{"roles":["dev","ops"]}}""".stripMargin.replace("\n", ""))
    val p = OidcAuth.authenticate(kc, jwks, Some(s"Bearer $t"))
    assert(p.exists(_("__auth_roles") == "dev,ops"))
  }

  test("OIDC discovery resolves jwks_uri from .well-known/openid-configuration") {
    // offline mode: the issuer base is a directory holding the document
    val issuerDir = java.nio.file.Files.createTempDirectory("graft_oidc_issuer")
    val wellKnown = java.nio.file.Files.createDirectory(issuerDir.resolve(".well-known"))
    java.nio.file.Files.writeString(wellKnown.resolve("openid-configuration"),
      s"""{"issuer":"$issuerDir","jwks_uri":"$jwksPath",
         |"token_endpoint":"https://issuer.spec/token",
         |"scopes_supported":["openid","email"]}""".stripMargin.replace("\n", ""))
    OidcDiscovery.clearCache()
    val md = OidcDiscovery.metadata(issuerDir.toString)
    assert(md.exists(_.jwksUri == jwksPath.toString))
    assert(md.exists(_.scopesSupported == Seq("openid", "email")))
    // a config WITHOUT an explicit jwks source authenticates via discovery
    val cfg = OidcConfig(issuerUrl = issuerDir.toString,
      clientId = "graft-client", jwksSource = "")
    val t = rs256Token("spec-key",
      s"""{"sub":"dora","iss":"$issuerDir","aud":"graft-client","exp":$far}""")
    val p = OidcAuth.authenticate(cfg, new JwksManager(), Some(s"Bearer $t"))
    assert(p.exists(_("__auth_username") == "dora"))
    // a document missing jwks_uri is rejected (required field)
    java.nio.file.Files.writeString(wellKnown.resolve("openid-configuration"),
      s"""{"issuer":"$issuerDir"}""")
    OidcDiscovery.clearCache()
    assert(OidcDiscovery.metadata(issuerDir.toString).isEmpty)
  }

  test("OIDC provider presets + validation mirror the reference") {
    val g = OidcProviderPresets(OidcConfig(providerType = "google", clientId = "c"))
    assert(g.issuerUrl == "https://accounts.google.com" && g.usernameClaim == "email")
    val kc = OidcProviderPresets(OidcConfig(providerType = "keycloak", clientId = "c"))
    assert(kc.roleClaimPath == "realm_access.roles")
    // unresolved placeholders and missing client-id are rejected
    assert(OidcProviderPresets.validate(kc).exists(_.contains("placeholders")))
    val ms = OidcProviderPresets(OidcConfig(providerType = "microsoft",
      issuerUrl = "https://login.microsoftonline.com/tid/v2.0", clientId = ""))
    assert(OidcProviderPresets.validate(ms).exists(_.contains("client-id")))
    assert(OidcProviderPresets.validate(
      OidcConfig(issuerUrl = "https://i", clientId = "c")).isEmpty)
  }

  test("endpoint-declared auth type pins the scheme (basic-only rejects a valid JWT)") {
    val basicOnly = new GraftServer(spark, Seq(ServedEndpoint(
      EndpointConfig(urlPath = "/basic-only", templateSource = "b.sql",
        withPagination = false,
        auth = Some(AuthConfig(enabled = true, tpe = "basic"))),
      "SELECT 7 AS seven")),
      basicAuth = Some(BasicAuthConfig(Map(
        "op" -> ((PasswordHasher.hash("oppw", 1000), Seq("ops")))))),
      jwtAuth = Some(jwtCfg)).start()
    try {
      val b = s"http://127.0.0.1:${basicOnly.boundPort}"
      // a VALID JWT must not satisfy a basic-declared endpoint
      // (reference auth_middleware branches on endpoint.auth.type)
      val jwt = token(Map("sub" -> "a", "iss" -> "graft-spec", "exp" -> far))
      assert(get(b, "/basic-only", "Authorization" -> s"Bearer $jwt").statusCode() == 401)
      val cred = "Basic " + java.util.Base64.getEncoder
        .encodeToString("op:oppw".getBytes("UTF-8"))
      assert(get(b, "/basic-only", "Authorization" -> cred).statusCode() == 200)
    } finally basicOnly.stop()
  }

  // ---- password hashing ----------------------------------------------------

  test("PBKDF2 hash round-trips; plaintext and bcrypt stored entries fail closed") {
    val h = PasswordHasher.hash("s3cret", iterations = 1000)
    assert(h.startsWith(PasswordHasher.Prefix))
    assert(PasswordHasher.verify("s3cret", h))
    assert(!PasswordHasher.verify("wrong", h))
    // plaintext stored value never authenticates (even on exact match)
    assert(!PasswordHasher.verify("plain", "plain"))
    // bcrypt refused rather than failing open
    assert(!PasswordHasher.verify("x", "$2b$12$abcdefghijklmnopqrstuv"))
    // legacy md5 hex digests still verify (deprecated)
    assert(PasswordHasher.verify("hello",
      "5d41402abc4b2a76b9719d911017c592"))
  }

  test("BasicAuth authenticates against hashed credentials only") {
    val cfg = BasicAuthConfig(Map(
      "ops" -> ((PasswordHasher.hash("opspw", 1000), Seq("ops"))),
      "legacy" -> (("legacypw", Seq("ops"))))) // plaintext entry
    def hdr(u: String, p: String) = Some("Basic " +
      java.util.Base64.getEncoder.encodeToString(s"$u:$p".getBytes("UTF-8")))
    assert(BasicAuth.authenticate(cfg, hdr("ops", "opspw"))
      .exists(_("__auth_roles") == "ops"))
    assert(BasicAuth.authenticate(cfg, hdr("ops", "bad")).isEmpty)
    assert(BasicAuth.authenticate(cfg, hdr("legacy", "legacypw")).isEmpty)
  }
}
