package graft.server

import java.util.Base64
import scala.collection.concurrent.TrieMap

/** MCP tool authorization (reference:
  * /root/reference/src/mcp_authorization_policy.cpp): when MCP auth is
  * enabled, a tool with NO allowed-roles is deny-by-default (the
  * operator must opt each tool in); otherwise any caller role matching
  * the allow list passes. Auth disabled = open demo mode.
  */
object AuthorizationPolicy {
  final case class Decision(allowed: Boolean, reason: String = "")

  def authorize(
      toolName: String,
      allowedRoles: Option[Seq[String]],
      userRoles: Seq[String],
      mcpAuthEnabled: Boolean): Decision = {
    if (!mcpAuthEnabled) return Decision(allowed = true)
    allowedRoles match {
      case None =>
        Decision(allowed = false,
          s"Tool '$toolName' has no allowed-roles configured while mcp auth " +
            "is enabled. Add allowed-roles to expose this tool, or disable " +
            "mcp auth to allow anonymous access.")
      case Some(allowed) if userRoles.exists(allowed.contains) =>
        Decision(allowed = true)
      case Some(allowed) =>
        def fmt(rs: Seq[String]) = if (rs.isEmpty) "<none>" else rs.mkString(", ")
        Decision(allowed = false,
          s"Tool '$toolName' requires one of [${fmt(allowed)}]; " +
            s"caller has [${fmt(userRoles)}].")
    }
  }
}

/** Per-(tool, principal) token bucket (reference mcp_tool_handler.cpp
  * W2.5: runs before argument validation so a flood never consumes
  * template/DB work; anonymous callers share one bucket per tool).
  * `keyStrategy` picks the REST-path principal (reference
  * rate_limit_key_builder.cpp:26-44): `ip` (historical default),
  * `user` (hashed Authorization header, `anonymous` fallback), or
  * `user-or-ip` (hashed header when present, client address
  * otherwise) — under `ip` a NAT'd fleet shares one bucket. */
final case class RateLimitConfig(requestsPerMinute: Int,
    keyStrategy: String = "ip")

/** Rate-limit principal per key strategy (reference
  * rate_limit_key_builder.cpp): the `user` principal is a STABLE HASH
  * of the Authorization header — never the plaintext token, because
  * bucket keys get logged — with the `anonymous` marker as fallback.
  * Unknown/empty strategies preserve the historical `ip` behaviour,
  * matching RateLimitKeyStrategyUtils::parse. */
object RateLimitKey {
  val AnonymousMarker = "anonymous"

  def principal(strategy: String, clientIp: String,
      authorizationHeader: Option[String]): String = {
    val header = authorizationHeader.filter(_.nonEmpty)
    strategy match {
      case "user" => header.map(hashHeader).getOrElse(AnonymousMarker)
      case "user-or-ip" => header.map(hashHeader).getOrElse(clientIp)
      case _ => clientIp
    }
  }

  /** `u` + first 16 hex chars of sha256(header): deterministic per
    * caller, no token material in the key (the reference uses
    * std::hash — sha256 gives the same property without platform-
    * dependent hashing). */
  private[server] def hashHeader(h: String): String =
    "u" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(h.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
}

final class RateLimiter(clock: () => Long = System.nanoTime) {
  final case class Decision(allowed: Boolean, retryAfterSeconds: Long)
  private case class Bucket(var tokens: Double, var lastRefill: Long)
  private val buckets = TrieMap.empty[(String, String), Bucket]
  // bucket-map bound: principals churn (sessions, rotating tokens), so
  // past a size threshold drop buckets idle for >10 min — an idle
  // bucket has refilled to capacity anyway, dropping it changes nothing
  private val MaxBuckets = 10000
  private val IdleDropNanos = 10L * 60 * 1000000000L

  def tryAcquire(tool: String, principal: String, cfg: RateLimitConfig): Decision = {
    val key = (tool, principal)
    val now = clock()
    if (buckets.size > MaxBuckets)
      buckets.filterInPlace((_, b) => now - b.lastRefill < IdleDropNanos)
    val ratePerNano = cfg.requestsPerMinute / 60e9
    val b = buckets.getOrElseUpdate(key, Bucket(cfg.requestsPerMinute.toDouble, now))
    b.synchronized {
      val refill = (now - b.lastRefill) * ratePerNano
      b.tokens = math.min(cfg.requestsPerMinute.toDouble, b.tokens + refill)
      b.lastRefill = now
      if (b.tokens >= 1.0) { b.tokens -= 1.0; Decision(allowed = true, 0L) }
      else Decision(allowed = false,
        math.ceil((1.0 - b.tokens) / (ratePerNano * 1e9)).toLong.max(1L))
    }
  }
}

/** Stored-credential hashing (reference password_hasher.cpp): PBKDF2-
  * HMAC-SHA256 in MCF form `$pbkdf2-sha256$<iter>$<salt>$<hash>`
  * (URL-safe base64, no padding), JDK `SecretKeyFactory` — no native
  * crypto. Same constants as the reference (600k iterations, 16-byte
  * salt, 32-byte key, 10M iteration ceiling against config typos that
  * would wedge the verify thread).
  *
  * Format dispatch mirrors classifyFormat (password_hasher.cpp:196):
  * PBKDF2 verifies; legacy MD5 hex digests verify (deprecated —
  * the config auditor warns); bcrypt is refused rather than failing
  * open. Unlike the reference, a PLAINTEXT stored credential never
  * authenticates (r3 verdict #7: one config-file leak must not be a
  * credential leak) — the auditor tells the operator to migrate.
  */
object PasswordHasher {
  val Prefix = "$pbkdf2-sha256$"
  val DefaultIterations = 600000
  val SaltBytes = 16
  val KeyBytes = 32
  private val MaxIterations = 10000000

  sealed trait Format
  case object Pbkdf2Sha256 extends Format
  case object Md5Deprecated extends Format
  case object BcryptUnsupported extends Format
  case object PlaintextRejected extends Format

  def classify(stored: String): Format =
    if (stored.startsWith(Prefix)) Pbkdf2Sha256
    else if (stored.length >= 4 && stored(0) == '$' && stored(1) == '2' &&
      stored(3) == '$' && "aby".contains(stored(2))) BcryptUnsupported
    else if (stored.length == 32 && stored.forall(c =>
      c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F'))) Md5Deprecated
    else PlaintextRejected

  def hash(password: String, iterations: Int = DefaultIterations): String = {
    val salt = new Array[Byte](SaltBytes)
    new java.security.SecureRandom().nextBytes(salt)
    val dk = pbkdf2(password, salt, iterations, KeyBytes)
    val enc = Base64.getUrlEncoder.withoutPadding()
    s"$Prefix$iterations$$${enc.encodeToString(salt)}$$${enc.encodeToString(dk)}"
  }

  def verify(provided: String, stored: String): Boolean = classify(stored) match {
    case Pbkdf2Sha256 => verifyPbkdf2(provided, stored)
    case Md5Deprecated =>
      java.security.MessageDigest.isEqual(
        md5Hex(provided).getBytes("UTF-8"), stored.toLowerCase.getBytes("UTF-8"))
    case BcryptUnsupported => false // migrate to PBKDF2; never fail open
    case PlaintextRejected => false // plaintext compare removed
  }

  private def verifyPbkdf2(provided: String, stored: String): Boolean = {
    stored.stripPrefix(Prefix).split('$') match {
      case Array(iterStr, salt64, hash64) =>
        val iter = try iterStr.toInt catch { case _: NumberFormatException => return false }
        if (iter <= 0 || iter > MaxIterations) return false
        val (salt, expected) =
          try (Base64.getUrlDecoder.decode(salt64), Base64.getUrlDecoder.decode(hash64))
          catch { case _: IllegalArgumentException => return false }
        if (salt.isEmpty || expected.isEmpty) return false
        val actual = pbkdf2(provided, salt, iter, expected.length)
        java.security.MessageDigest.isEqual(actual, expected)
      case _ => false
    }
  }

  private def pbkdf2(pw: String, salt: Array[Byte], iter: Int, len: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(pw.toCharArray, salt, iter, len * 8)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}

/** HTTP Basic credentials → reserved `__auth_*` params (reference
  * request_handler.cpp:178-181 injects them post-middleware; templates
  * see them as the `auth.*` namespace). Stored passwords are PBKDF2
  * MCF strings (see [[PasswordHasher]]); plaintext entries fail
  * closed. */
final case class BasicAuthConfig(users: Map[String, (String, Seq[String])])

object BasicAuth {
  // Successful-verification cache: PBKDF2 at production iteration
  // counts costs ~0.3 s of CPU, and HTTP Basic re-sends credentials on
  // EVERY request — without a cache the hash dominates serving CPU and
  // hands attackers a request-rate CPU-burn primitive. Key = (stored
  // MCF, sha256 of the provided password): no plaintext retained.
  private val VerifyTtlMillis = 5 * 60 * 1000L
  private val MaxCacheEntries = 1000
  private val verified = TrieMap.empty[(String, String), Long]

  // Failed-attempt defenses (r4 advice: ~27 wrong-password req/s for a
  // valid user saturate the whole 8-thread HTTP pool at 0.3 s PBKDF2
  // each):
  //  1. NEGATIVE cache — re-presenting the same wrong credential pays
  //     one sha256, not another PBKDF2. Keyed like the positive cache
  //     ((stored MCF, sha256(pass))), so one garbage attempt can never
  //     poison a DIFFERENT (correct) password for the user. Short TTL:
  //     a just-rotated password is retried successfully within 30 s.
  //  2. Per-user failure throttle — after MaxFailuresPerWindow distinct
  //     wrong passwords inside the window, further UNCACHED attempts
  //     for that user short-circuit to false without running PBKDF2.
  //     Legitimate users are outside this regime (the positive cache
  //     absorbs them; a correct password after throttling engages is
  //     rejected for at most the window remainder — same contract as
  //     any lockout policy).
  //  3. Global PBKDF2 concurrency cap — at most 2 expensive verifies
  //     in flight; excess attempts fail fast instead of queueing on
  //     serving threads. Auth floods can no longer occupy the pool.
  private val NegativeTtlMillis = 30 * 1000L
  private val negative = TrieMap.empty[(String, String), Long]
  private val FailureWindowMillis = 60 * 1000L
  private val MaxFailuresPerWindow = 10
  // rotating source IPs reset the per-(user,client) counter, so a
  // second, higher cap counts failures per USER across all clients —
  // high enough that a fleet of legitimate clients fat-fingering one
  // account never trips it, low enough that a distributed brute force
  // is cut off within the window.
  //
  // DELIBERATE TRADEOFF: any per-user cap is also a lockout lever — an
  // attacker sustaining 100 distinct novel credentials/min against one
  // account defers that account's FRESH logins for the attack's
  // duration. Scope of the damage: sessions already authenticated keep
  // working (the positive cache is consulted before the throttle, and
  // repeats of a cached-correct password never reach it), the window
  // self-clears in 60 s, and every other account is unaffected. The
  // alternative — no global cap — leaves distributed password-spraying
  // bounded only by the PBKDF2 permit rate (~20/s), which guesses a
  // leaked-list password far faster than it locks anyone out. Standard
  // account-lockout reasoning picks the cap.
  private val MaxGlobalFailuresPerWindow = 100
  // structurally distinct key types, not '|'-joined strings: a
  // configured username equal to the sentinel (or containing the
  // separator) must never alias a per-client counter onto the global
  // one or vice versa
  private sealed trait ThrottleKey
  private final case class PerClientKey(user: String, client: String)
      extends ThrottleKey
  private final case class GlobalKey(user: String) extends ThrottleKey
  private val failures = TrieMap.empty[ThrottleKey, (Int, Long)]
  private val pbkdf2Permits = new java.util.concurrent.Semaphore(2)

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def recordFailure(key: ThrottleKey, now: Long): Unit = {
    if (failures.size > MaxCacheEntries)
      failures.filterInPlace((_, v) => now - v._2 < FailureWindowMillis)
    val (n, start) = failures.getOrElse(key, (0, now))
    if (now - start >= FailureWindowMillis) failures.put(key, (1, now))
    else failures.put(key, (n + 1, start))
  }

  private def throttled(key: ThrottleKey, now: Long, limit: Int): Boolean =
    failures.get(key).exists { case (n, start) =>
      now - start < FailureWindowMillis && n >= limit
    }

  /** Test hook: reset throttle/cache state between specs. */
  private[server] def resetState(): Unit = {
    verified.clear(); negative.clear(); failures.clear()
  }

  private def cachedVerify(user: String, pass: String, stored: String,
      client: String): Boolean = {
    val key = (stored, sha256Hex(pass))
    val now = System.currentTimeMillis()
    if (verified.get(key).exists(now - _ < VerifyTtlMillis)) return true
    if (negative.get(key).exists(now - _ < NegativeTtlMillis)) return false
    // throttle keys on (user, client): keyed on user alone, 10 garbage
    // passwords/min from ANY client becomes a renewable unauthenticated
    // lockout of that username for everyone. A global per-user cap
    // (higher, so no single client can trip it for the others) closes
    // the rotating-IP bypass; deployments behind a reverse proxy — all
    // clients share one remote address — should plumb X-Forwarded-For
    // from the trusted hop into `client` to keep the per-client key
    // meaningful.
    if (throttled(PerClientKey(user, client), now, MaxFailuresPerWindow)) return false
    if (throttled(GlobalKey(user), now, MaxGlobalFailuresPerWindow)) return false
    // bounded wait, not fail-fast: legitimate users logging in
    // concurrently after a restart must queue briefly, not get a 401
    // for a correct password. The wait is SHORT (250 ms): every route
    // shares the serving pool, so a 2 s wait here would let a flood of
    // novel credentials for a known user pin most of the pool's
    // threads — a ~100 ms verify drains a 250 ms queue fast enough
    // that only a genuinely saturated burst sheds load.
    val acquired =
      try pbkdf2Permits.tryAcquire(250, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt(); false
      }
    if (!acquired) return false
    val ok =
      try PasswordHasher.verify(pass, stored)
      finally pbkdf2Permits.release()
    if (ok) {
      if (verified.size >= MaxCacheEntries)
        verified.filterInPlace((_, t) => now - t < VerifyTtlMillis)
      if (verified.size < MaxCacheEntries) verified.put(key, now)
    } else {
      if (negative.size >= MaxCacheEntries)
        negative.filterInPlace((_, t) => now - t < NegativeTtlMillis)
      if (negative.size < MaxCacheEntries) negative.put(key, now)
      recordFailure(PerClientKey(user, client), now)
      recordFailure(GlobalKey(user), now)
    }
    ok
  }

  /** None = no/invalid credentials. `client` (remote address) scopes the
    * failure throttle so one host's garbage cannot lock a username out
    * for everyone. */
  def authenticate(cfg: BasicAuthConfig, header: Option[String],
      client: String = ""): Option[Map[String, String]] =
    header.filter(_.startsWith("Basic ")).flatMap { h =>
      val decoded =
        try new String(Base64.getDecoder.decode(h.stripPrefix("Basic ").trim), "UTF-8")
        catch { case _: IllegalArgumentException => "" }
      decoded.split(":", 2) match {
        case Array(user, pass) =>
          cfg.users.get(user).collect {
            case (stored, roles) if cachedVerify(user, pass, stored, client) =>
              Map(
                "__auth_username" -> user,
                "__auth_roles" -> roles.mkString(","),
                "__auth_type" -> "basic",
                "__auth_authenticated" -> "true")
          }
        case _ => None
      }
    }
}

/** HS256 JWT bearer auth (reference auth_middleware.cpp:309-338:
  * jwt-cpp verify with hs256 secret + issuer, claims sub + roles[]).
  * Pure-JDK HMAC — no external JWT library. */
final case class JwtConfig(
    secret: String,
    issuer: Option[String] = None)

object JwtAuth {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def hmacSha256(secret: String, data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8"))
  }

  private def b64urlDecode(s: String): Option[Array[Byte]] =
    try Some(Base64.getUrlDecoder.decode(s))
    catch { case _: IllegalArgumentException => None }

  /** Mint a token (test/ops tooling — the server only verifies). */
  def sign(cfg: JwtConfig, claims: Map[String, Any]): String = {
    val enc = Base64.getUrlEncoder.withoutPadding()
    val header = enc.encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
    val node = mapper.createObjectNode()
    claims.foreach {
      case (k, v: String) => node.put(k, v)
      case (k, v: Long) => node.put(k, v)
      case (k, v: Int) => node.put(k, v)
      case (k, v: Seq[_]) =>
        val arr = node.putArray(k); v.foreach(x => arr.add(x.toString))
      case (k, v) => node.put(k, String.valueOf(v))
    }
    val payload = enc.encodeToString(mapper.writeValueAsBytes(node))
    val sig = enc.encodeToString(hmacSha256(cfg.secret, s"$header.$payload"))
    s"$header.$payload.$sig"
  }

  /** Verify `Authorization: Bearer <jwt>`: HS256 signature over
    * header.payload, alg pinned to HS256 (no alg-confusion downgrade),
    * exp/nbf honored, issuer matched when configured. On success the
    * same reserved `__auth_*` params as Basic, with type "bearer". */
  def authenticate(cfg: JwtConfig, header: Option[String],
                   nowEpochSeconds: Long = System.currentTimeMillis() / 1000L): Option[Map[String, String]] =
    header.filter(_.startsWith("Bearer ")).flatMap { h =>
      val token = h.stripPrefix("Bearer ").trim
      token.split('.') match {
        case Array(h64, p64, s64) =>
          for {
            sig <- b64urlDecode(s64)
            expected = hmacSha256(cfg.secret, s"$h64.$p64")
            // constant-time compare: a timing oracle on the MAC would
            // let an attacker forge signatures byte by byte
            if java.security.MessageDigest.isEqual(sig, expected)
            hBytes <- b64urlDecode(h64)
            pBytes <- b64urlDecode(p64)
            headerNode <- parse(hBytes)
            if headerNode.path("alg").asText("") == "HS256"
            payload <- parse(pBytes)
            if payload.path("exp").isMissingNode ||
              payload.path("exp").asLong(0L) > nowEpochSeconds
            if payload.path("nbf").isMissingNode ||
              payload.path("nbf").asLong(0L) <= nowEpochSeconds
            if cfg.issuer.forall(_ == payload.path("iss").asText(""))
          } yield {
            val roles = Option(payload.get("roles")).filter(_.isArray)
              .map(a => (0 until a.size()).map(a.get(_).asText()).mkString(","))
              .getOrElse("")
            Map(
              "__auth_username" -> payload.path("sub").asText(""),
              "__auth_roles" -> roles,
              "__auth_type" -> "bearer",
              "__auth_authenticated" -> "true")
          }
        case _ => None
      }
    }

  private def parse(bytes: Array[Byte]): Option[com.fasterxml.jackson.databind.JsonNode] =
    try Some(mapper.readTree(bytes)) catch { case _: Exception => None }
}

/** CORS headers (reference: crow CORS middleware, api_server.cpp). */
final case class CorsConfig(
    allowOrigin: String = "*",
    allowMethods: String = "GET, POST, PUT, PATCH, DELETE, OPTIONS",
    allowHeaders: String = "Content-Type, Authorization")
