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
  * template/DB work; anonymous callers share one bucket per tool). */
final case class RateLimitConfig(requestsPerMinute: Int)

final class RateLimiter(clock: () => Long = System.nanoTime) {
  final case class Decision(allowed: Boolean, retryAfterSeconds: Long)
  private case class Bucket(var tokens: Double, var lastRefill: Long)
  private val buckets = TrieMap.empty[(String, String), Bucket]

  def tryAcquire(tool: String, principal: String, cfg: RateLimitConfig): Decision = {
    val key = (tool, principal)
    val now = clock()
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

/** HTTP Basic credentials → reserved `__auth_*` params (reference
  * request_handler.cpp:178-181 injects them post-middleware; templates
  * see them as the `auth.*` namespace). */
final case class BasicAuthConfig(users: Map[String, (String, Seq[String])])

object BasicAuth {
  /** None = no/invalid credentials. */
  def authenticate(cfg: BasicAuthConfig, header: Option[String]): Option[Map[String, String]] =
    header.filter(_.startsWith("Basic ")).flatMap { h =>
      val decoded =
        try new String(Base64.getDecoder.decode(h.stripPrefix("Basic ").trim), "UTF-8")
        catch { case _: IllegalArgumentException => "" }
      decoded.split(":", 2) match {
        case Array(user, pass) =>
          cfg.users.get(user).collect {
            case (expected, roles) if expected == pass =>
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

/** CORS headers (reference: crow CORS middleware, api_server.cpp). */
final case class CorsConfig(
    allowOrigin: String = "*",
    allowMethods: String = "GET, POST, PUT, PATCH, DELETE, OPTIONS",
    allowHeaders: String = "Content-Type, Authorization")
