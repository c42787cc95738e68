package graft.server

import java.math.BigInteger
import java.security.KeyFactory
import java.security.interfaces.RSAPublicKey
import java.security.spec.RSAPublicKeySpec
import java.util.Base64
import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** OIDC bearer auth: RS256 JWT verification against a JWKS key set.
  *
  * Mirrors the reference stack behaviorally —
  * /root/reference/src/oidc_jwks_manager.cpp (kid-keyed key cache, TTL,
  * refresh-on-miss for rotation, RSA-only JWK parsing),
  * oidc_provider_presets.cpp (per-provider claim-mapping defaults +
  * placeholder validation), oidc_auth_handler.cpp:25-190 (decode →
  * kid → key → signature → sub/aud/exp/roles claims) and the dispatch
  * at auth_middleware.cpp:171-173 — re-expressed on the JDK:
  * `java.security.Signature` for RSA, jackson for JWK/JWT JSON, no
  * OpenSSL-style key conversion needed.
  *
  * `jwksSource` is a file path or URL holding the standard JWKS
  * document (`{"keys":[{"kty":"RSA","kid":…,"n":…,"e":…}]}`). A static
  * file is the offline deployment mode; a URL is fetched with the
  * JDK http client when reachable.
  */
final case class OidcConfig(
    providerType: String = "generic",
    issuerUrl: String = "",
    clientId: String = "",
    jwksSource: String = "",
    usernameClaim: String = "sub",
    emailClaim: String = "email",
    rolesClaim: String = "roles",
    /** dot-path for nested role claims, e.g. Keycloak's
      * `realm_access.roles`; wins over `rolesClaim` when set. */
    roleClaimPath: String = "",
    verifyExpiration: Boolean = true,
    validateAudience: Boolean = true)

/** Provider presets (oidc_provider_presets.cpp): fill in well-known
  * issuer URLs and claim mappings; validation rejects configs whose
  * issuer still carries unresolved `{placeholder}` segments. */
object OidcProviderPresets {

  def apply(cfg: OidcConfig): OidcConfig = cfg.providerType match {
    case "google" => cfg.copy(
      issuerUrl = if (cfg.issuerUrl.isEmpty) "https://accounts.google.com" else cfg.issuerUrl,
      // Google: email is the natural username
      usernameClaim = if (cfg.usernameClaim.isEmpty || cfg.usernameClaim == "sub") "email"
                      else cfg.usernameClaim,
      emailClaim = if (cfg.emailClaim.isEmpty) "email" else cfg.emailClaim,
      rolesClaim = if (cfg.rolesClaim.isEmpty) "roles" else cfg.rolesClaim)
    case "microsoft" => cfg.copy(
      issuerUrl = if (cfg.issuerUrl.isEmpty) "https://login.microsoftonline.com/{tenant}/v2.0"
                  else cfg.issuerUrl,
      usernameClaim = if (cfg.usernameClaim.isEmpty || cfg.usernameClaim == "sub")
                        "preferred_username" else cfg.usernameClaim,
      emailClaim = if (cfg.emailClaim.isEmpty) "email" else cfg.emailClaim,
      rolesClaim = if (cfg.rolesClaim.isEmpty) "roles" else cfg.rolesClaim)
    case "keycloak" => cfg.copy(
      issuerUrl = if (cfg.issuerUrl.isEmpty) "https://keycloak.example.com/realms/{realm}"
                  else cfg.issuerUrl,
      // Keycloak nests roles under realm_access.roles
      roleClaimPath = if (cfg.roleClaimPath.isEmpty) "realm_access.roles" else cfg.roleClaimPath,
      rolesClaim = if (cfg.rolesClaim.isEmpty) "roles" else cfg.rolesClaim)
    case _ => cfg
  }

  /** None = valid; Some(reason) mirrors the reference's error strings. */
  def validate(cfg: OidcConfig): Option[String] = {
    val ph = extractPlaceholders(cfg.issuerUrl)
    if (cfg.providerType == "generic" && cfg.issuerUrl.isEmpty)
      Some("generic OIDC requires 'issuer-url' to be specified")
    else if (ph.nonEmpty)
      Some(s"issuer-url has unresolved placeholders [${ph.mkString(", ")}] — " +
        "substitute them before enabling the endpoint")
    else if (cfg.clientId.isEmpty)
      Some(s"${cfg.providerType} OIDC requires 'client-id' to be specified")
    else None
  }

  def extractPlaceholders(issuerUrl: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = issuerUrl.indexOf('{')
    while (pos >= 0) {
      val end = issuerUrl.indexOf('}', pos)
      if (end < 0) return out.toSeq // malformed tail — stop
      out += issuerUrl.substring(pos + 1, end)
      pos = issuerUrl.indexOf('{', end + 1)
    }
    out.toSeq
  }
}

/** kid-keyed RSA public-key cache over one or more JWKS sources, with
  * TTL expiry and refresh-on-miss so rotated keys are picked up
  * without a restart (oidc_jwks_manager.cpp getKey/refreshJWKS). */
final class JwksManager(
    ttlMillis: Long = 1L * 3600 * 1000,
    clock: () => Long = System.currentTimeMillis) {

  private val mapper = new ObjectMapper()
  private case class Entry(keys: Map[String, RSAPublicKey], refreshedAt: Long)
  private val cache = TrieMap.empty[String, Entry]
  // refresh throttle: an unknown kid triggers refetch (rotation), but
  // a flood of FORGED-kid tokens must not turn into one outbound GET
  // per request — at most one refresh attempt per source per interval
  private val minRefreshIntervalMillis = 30000L
  private val lastAttempt = TrieMap.empty[String, Long]

  /** Cached key if fresh; otherwise refetch once (key rotation) and
    * retry — None when the kid is absent even after refresh. */
  def getKey(kid: String, source: String): Option[RSAPublicKey] = {
    val fresh = cache.get(source)
      .filter(e => clock() - e.refreshedAt < ttlMillis)
      .flatMap(_.keys.get(kid))
    fresh.orElse {
      if (refresh(source)) cache.get(source).flatMap(_.keys.get(kid)) else None
    }
  }

  def refresh(source: String): Boolean = {
    val now = clock()
    val throttled = lastAttempt.get(source).exists(now - _ < minRefreshIntervalMillis)
    if (throttled) return cache.contains(source)
    lastAttempt.put(source, now)
    fetch(source) match {
      case Some(keys) => cache.put(source, Entry(keys, clock())); true
      case None => false
    }
  }

  def clearCache(source: String): Unit = { cache.remove(source); lastAttempt.remove(source) }

  // bounded timeouts: JWKS fetch runs on serving threads off
  // unauthenticated input — a blackholed IdP must not hang them
  private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5)).build()

  private def fetch(source: String): Option[Map[String, RSAPublicKey]] =
    try {
      val body =
        if (source.startsWith("http://") || source.startsWith("https://")) {
          val res = http.send(
            java.net.http.HttpRequest.newBuilder(java.net.URI.create(source))
              .timeout(java.time.Duration.ofSeconds(5)).GET().build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (res.statusCode() != 200) return None
          res.body()
        } else {
          java.nio.file.Files.readString(
            java.nio.file.Paths.get(source.stripPrefix("file:")))
        }
      parseJwks(body)
    } catch { case _: Exception => None }

  /** RSA-only JWK parsing: entries without kid / n / e, or with a
    * non-RSA kty, are skipped (same selectivity as the reference). */
  private[server] def parseJwks(json: String): Option[Map[String, RSAPublicKey]] =
    try {
      val keysNode = mapper.readTree(json).path("keys")
      if (!keysNode.isArray) return None
      val kf = KeyFactory.getInstance("RSA")
      val dec = Base64.getUrlDecoder
      val out = (0 until keysNode.size()).flatMap { i =>
        val jwk = keysNode.get(i)
        val kid = jwk.path("kid").asText("")
        val kty = if (jwk.hasNonNull("kty")) jwk.path("kty").asText() else "RSA"
        val n = jwk.path("n").asText("")
        val e = jwk.path("e").asText("")
        if (kid.isEmpty || kty != "RSA" || n.isEmpty || e.isEmpty) None
        else try {
          val spec = new RSAPublicKeySpec(
            new BigInteger(1, dec.decode(n)), new BigInteger(1, dec.decode(e)))
          Some(kid -> kf.generatePublic(spec).asInstanceOf[RSAPublicKey])
        } catch { case _: Exception => None }
      }.toMap
      Some(out)
    } catch { case _: Exception => None }
}

/** Provider metadata resolved from `<issuer>/.well-known/
  * openid-configuration` (RFC 8414; reference
  * oidc_discovery_client.cpp): issuer + jwks_uri required, the
  * standard endpoint fields optional. Documents cache per issuer. A
  * file-path issuer base resolves the document from disk — the
  * offline deployment mode. */
final case class OidcProviderMetadata(
    issuer: String,
    jwksUri: String,
    authorizationEndpoint: String = "",
    tokenEndpoint: String = "",
    userinfoEndpoint: String = "",
    scopesSupported: Seq[String] = Nil)

object OidcDiscovery {
  private val mapper = new ObjectMapper()
  private val cache = TrieMap.empty[String, OidcProviderMetadata]
  // negative caching: a failed discovery must not retry on every
  // request — forged-token floods against an unreachable IdP would
  // otherwise tie up serving threads in 5 s fetches (same throttle
  // rationale as JwksManager)
  private val minAttemptIntervalMillis = 30000L
  private val lastAttempt = TrieMap.empty[String, Long]
  private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5)).build()

  def metadata(issuerUrl: String): Option[OidcProviderMetadata] =
    cache.get(issuerUrl).orElse {
      val now = System.currentTimeMillis()
      if (lastAttempt.get(issuerUrl).exists(now - _ < minAttemptIntervalMillis)) None
      else {
        lastAttempt.put(issuerUrl, now)
        fetchDocument(issuerUrl).map { m => cache.put(issuerUrl, m); m }
      }
    }

  def clearCache(): Unit = { cache.clear(); lastAttempt.clear() }

  private def fetchDocument(issuerUrl: String): Option[OidcProviderMetadata] =
    try {
      val url = issuerUrl.stripSuffix("/") + "/.well-known/openid-configuration"
      val body =
        if (url.startsWith("http://") || url.startsWith("https://")) {
          val res = http.send(
            java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
              .timeout(java.time.Duration.ofSeconds(5)).GET().build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (res.statusCode() != 200) return None
          res.body()
        } else java.nio.file.Files.readString(
          java.nio.file.Paths.get(url.stripPrefix("file:")))
      val j = mapper.readTree(body)
      val issuer = j.path("issuer").asText("")
      val jwks = j.path("jwks_uri").asText("")
      if (issuer.isEmpty || jwks.isEmpty) None // both REQUIRED (RFC 8414)
      else Some(OidcProviderMetadata(
        issuer = issuer,
        jwksUri = jwks,
        authorizationEndpoint = j.path("authorization_endpoint").asText(""),
        tokenEndpoint = j.path("token_endpoint").asText(""),
        userinfoEndpoint = j.path("userinfo_endpoint").asText(""),
        scopesSupported = {
          val s = j.path("scopes_supported")
          if (s.isArray) (0 until s.size()).map(s.get(_).asText()) else Nil
        }))
    } catch { case _: Exception => None }
}

/** Bearer-token verification for OIDC endpoints. On success the same
  * reserved `__auth_*` params as Basic/JWT, with type "oidc". */
object OidcAuth {
  private val mapper = new ObjectMapper()

  def authenticate(
      cfg: OidcConfig,
      jwks: JwksManager,
      header: Option[String],
      nowEpochSeconds: Long = System.currentTimeMillis() / 1000L): Option[Map[String, String]] =
    header.filter(_.startsWith("Bearer ")).flatMap { h =>
      h.stripPrefix("Bearer ").trim.split('.') match {
        case Array(h64, p64, s64) =>
          for {
            hBytes <- b64urlDecode(h64)
            headerNode <- parse(hBytes)
            // alg pinned to RS256: an HS256 token signed with the
            // PUBLIC key bytes must never verify (alg-confusion)
            if headerNode.path("alg").asText("") == "RS256"
            kid = headerNode.path("kid").asText("")
            if kid.nonEmpty
            // explicit jwks source wins; otherwise resolve it through
            // provider discovery (oidc_auth_handler.cpp:52-58)
            source <- if (cfg.jwksSource.nonEmpty) Some(cfg.jwksSource)
                      else OidcDiscovery.metadata(cfg.issuerUrl).map(_.jwksUri)
            key <- jwks.getKey(kid, source)
            sig <- b64urlDecode(s64)
            if rs256Verify(key, s"$h64.$p64", sig)
            pBytes <- b64urlDecode(p64)
            payload <- parse(pBytes)
            if payload.path("sub").asText("").nonEmpty
            if !cfg.verifyExpiration || payload.path("exp").isMissingNode ||
              payload.path("exp").asLong(0L) > nowEpochSeconds
            if payload.path("nbf").isMissingNode ||
              payload.path("nbf").asLong(0L) <= nowEpochSeconds
            if cfg.issuerUrl.isEmpty || payload.path("iss").asText("") == cfg.issuerUrl
            if !cfg.validateAudience || cfg.clientId.isEmpty ||
              audienceContains(payload, cfg.clientId)
          } yield {
            val username = Option(payload.path(cfg.usernameClaim).asText(""))
              .filter(_.nonEmpty).getOrElse(payload.path("sub").asText(""))
            Map(
              "__auth_username" -> username,
              "__auth_roles" -> roles(payload, cfg).mkString(","),
              "__auth_email" -> payload.path(cfg.emailClaim).asText(""),
              "__auth_type" -> "oidc",
              "__auth_authenticated" -> "true")
          }
        case _ => None
      }
    }

  private def rs256Verify(key: RSAPublicKey, signedPart: String, sig: Array[Byte]): Boolean =
    try {
      val v = java.security.Signature.getInstance("SHA256withRSA")
      v.initVerify(key)
      v.update(signedPart.getBytes("UTF-8"))
      v.verify(sig)
    } catch { case _: Exception => false }

  /** `aud` may be a string or an array of strings (RFC 7519 §4.1.3). */
  private def audienceContains(payload: JsonNode, clientId: String): Boolean = {
    val aud = payload.path("aud")
    if (aud.isTextual) aud.asText() == clientId
    else if (aud.isArray) (0 until aud.size()).exists(aud.get(_).asText("") == clientId)
    else false
  }

  /** roles via the nested dot-path when configured (Keycloak
    * realm_access.roles), else the flat roles claim. */
  private def roles(payload: JsonNode, cfg: OidcConfig): Seq[String] = {
    val node =
      if (cfg.roleClaimPath.nonEmpty)
        cfg.roleClaimPath.split('.').foldLeft(payload: JsonNode)((n, seg) => n.path(seg))
      else payload.path(cfg.rolesClaim)
    if (node.isArray) (0 until node.size()).map(node.get(_).asText()).filter(_.nonEmpty)
    else if (node.isTextual && node.asText().nonEmpty) Seq(node.asText())
    else Nil
  }

  private def b64urlDecode(s: String): Option[Array[Byte]] =
    try Some(Base64.getUrlDecoder.decode(s))
    catch { case _: IllegalArgumentException => None }

  private def parse(bytes: Array[Byte]): Option[JsonNode] =
    try Some(mapper.readTree(bytes)) catch { case _: Exception => None }
}
