package graft.server

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.JsonNode

/** Client capabilities declared in the `initialize` params (reference
  * mcp_client_capabilities.cpp): `sampling`/`roots` booleans plus any
  * `supportedProtocols` arrays nested under capability objects. */
final case class McpClientCapabilities(
    supportsSampling: Boolean = false,
    supportsRoots: Boolean = false,
    supportedProtocols: Seq[String] = Nil)

object McpClientCapabilities {
  def detectFromInitialize(params: JsonNode): McpClientCapabilities = {
    val caps = params.path("capabilities")
    if (!caps.isObject) return McpClientCapabilities()
    val protocols = scala.collection.mutable.ListBuffer.empty[String]
    val names = caps.fieldNames()
    while (names.hasNext) {
      val sp = caps.path(names.next()).path("supportedProtocols")
      if (sp.isArray) (0 until sp.size()).foreach { i =>
        if (sp.get(i).isTextual) protocols += sp.get(i).asText()
      }
    }
    McpClientCapabilities(
      supportsSampling = caps.path("sampling").isBoolean && caps.path("sampling").asBoolean(),
      supportsRoots = caps.path("roots").isBoolean && caps.path("roots").asBoolean(),
      supportedProtocols = protocols.toSeq)
  }
}

final case class McpSession(
    sessionId: String,
    clientVersion: String = "",
    capabilities: McpClientCapabilities = McpClientCapabilities(),
    createdAt: Long = 0L,
    lastActivity: Long = 0L)

/** Session registry threading an `Mcp-Session-Id` through every
  * JSON-RPC exchange (reference mcp_session_manager.cpp +
  * mcp_route_handlers.cpp:139-206): created on first contact, echoed
  * in every response header, activity-refreshed per request, expired
  * after 30 minutes idle, and removable via DELETE /mcp/jsonrpc. The
  * id doubles as the rate-limit principal for anonymous callers, so a
  * flood from one client session cannot starve others. */
final class McpSessionManager(
    timeoutMinutes: Long = 30,
    clock: () => Long = System.currentTimeMillis,
    /** hard bound on live sessions: an unauthenticated flood that never
      * re-presents its ids must not grow the map without limit. At the
      * cap, expired entries are reaped; if all are live, the
      * least-recently-active is evicted (abandoning an idle client
      * beats OOMing the server). */
    maxSessions: Int = 10000) {

  private val sessions = TrieMap.empty[String, McpSession]

  def createSession(clientVersion: String = "",
                    capabilities: McpClientCapabilities = McpClientCapabilities()): String = {
    if (sessions.size >= maxSessions) {
      cleanupExpired()
      if (sessions.size >= maxSessions)
        sessions.minByOption(_._2.lastActivity).foreach(e => sessions.remove(e._1))
    }
    val id = java.util.UUID.randomUUID().toString
    val now = clock()
    sessions.put(id, McpSession(id, clientVersion, capabilities, now, now))
    id
  }

  /** None when unknown OR expired (expired entries are dropped — same
    * lazy reaping as the reference's getSession). */
  def getSession(id: String): Option[McpSession] =
    sessions.get(id).flatMap { s =>
      if (clock() - s.lastActivity > timeoutMinutes * 60000L) {
        sessions.remove(id); None
      } else Some(s)
    }

  def updateActivity(id: String): Unit =
    sessions.updateWith(id)(_.map(_.copy(lastActivity = clock())))

  /** Attach initialize-time facts to an existing session. */
  def updateOnInitialize(id: String, clientVersion: String,
                         capabilities: McpClientCapabilities): Unit =
    sessions.updateWith(id)(_.map(_.copy(
      clientVersion = clientVersion, capabilities = capabilities)))

  def removeSession(id: String): Boolean = sessions.remove(id).isDefined

  def cleanupExpired(): Unit = {
    val cutoff = clock() - timeoutMinutes * 60000L
    sessions.filterInPlace((_, s) => s.lastActivity >= cutoff)
  }

  def size: Int = sessions.size
}
