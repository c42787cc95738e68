package graft.config

/** Endpoint/config data model — the Scala analog of the reference's YAML
  * config structs (config_manager.hpp:113-180). Only the data-processing
  * subset is modeled here; serving-shell fields (auth providers, rate
  * limits, CORS) live with the HTTP layer when it exists.
  */
final case class ValidatorConfig(
    tpe: String,
    regex: String = "",
    min: Int = 0,
    max: Int = 0,
    minDate: String = "",
    maxDate: String = "",
    minTime: String = "",
    maxTime: String = "",
    allowedValues: Seq[String] = Nil,
    preventSqlInjection: Boolean = true)

final case class RequestFieldConfig(
    fieldName: String,
    fieldIn: String = "query",
    description: String = "",
    required: Boolean = false,
    defaultValue: Option[String] = None,
    validators: Seq[ValidatorConfig] = Nil)

final case class CursorConfig(column: String, tpe: String)

final case class RetentionConfig(
    keepLastSnapshots: Option[Int] = None,
    maxSnapshotAge: Option[String] = None)

final case class CacheConfig(
    enabled: Boolean = false,
    table: String = "",
    schema: String = "cache",
    schedule: Option[String] = None,
    primaryKeys: Seq[String] = Nil,
    cursor: Option[CursorConfig] = None,
    retention: RetentionConfig = RetentionConfig(),
    templateFile: Option[String] = None,
    /** write-triggered cache behavior (reference config_manager.hpp:
      * 153-154; handleCacheAfterWrite, request_handler.cpp:543): drop
      * cached plans / re-materialize after a successful write. */
    invalidateOnWrite: Boolean = false,
    refreshOnWrite: Boolean = false,
    /** optional z-order file layout for the materialized snapshots:
      * exactly two integral scan-predicate columns (operators/
      * ZOrderLayout) — rows are range-partitioned and sorted by their
      * Morton code at write time so filtered reads prune files. */
    zorderBy: Seq[String] = Nil) {
  def hasCursor: Boolean = cursor.isDefined
  def hasPrimaryKey: Boolean = primaryKeys.nonEmpty
}

final case class ConnectionConfig(
    name: String,
    /** exposed to templates as {{conn.*}} */
    properties: Map[String, String] = Map.empty,
    /** SQL run once per session when the connection is first used */
    initSql: Option[String] = None)

/** Env-var whitelist for {{env.*}} (reference: TemplateConfig,
  * config_manager.hpp:419-435 — regex allowlist, deny by default). */
final case class TemplateEnvConfig(allowedPatterns: Seq[String] = Nil) {
  private lazy val compiled = allowedPatterns.map(_.r)
  def isAllowed(name: String): Boolean = compiled.exists(_.matches(name))
}

/** Endpoint auth block (reference customer-common.yaml `auth:`; types
  * basic / jwt|bearer). Inline users carry roles for RBAC. */
final case class AuthUserConfig(
    username: String,
    password: String,
    roles: Seq[String] = Nil)

/** OIDC sub-block of `auth:` (reference oidc config in auth blocks;
  * provider presets fill issuer/claim defaults). `jwksSource` is a
  * static JWKS file path (offline mode) or URL. */
final case class OidcSettingsConfig(
    provider: String = "generic",
    issuerUrl: String = "",
    clientId: String = "",
    jwksSource: String = "",
    usernameClaim: String = "",
    rolesClaim: String = "",
    roleClaimPath: String = "")

final case class AuthConfig(
    enabled: Boolean = false,
    tpe: String = "basic",
    users: Seq[AuthUserConfig] = Nil,
    jwtSecret: Option[String] = None,
    jwtIssuer: Option[String] = None,
    oidc: Option[OidcSettingsConfig] = None)

/** Endpoint rate-limit block (`rate-limit:` — max requests per
  * interval seconds). */
final case class RateLimitSettings(
    enabled: Boolean = false,
    max: Int = 0,
    intervalSeconds: Int = 60,
    /** `ip` | `user` | `user-or-ip` (reference
      * rate_limit_key_builder.cpp; unknown values preserve `ip`). */
    keyStrategy: String = "ip") {
  def requestsPerMinute: Int =
    if (intervalSeconds <= 0) max else math.max(1, max * 60 / intervalSeconds)
}

/** An endpoint exposed as an MCP tool under an explicit tool name
  * (reference customers-mcp-tool.yaml; tool-only endpoints carry no
  * url-path). */
final case class McpToolConfig(
    name: String,
    description: String = "",
    resultMimeType: String = "application/json")

/** An endpoint exposed as an MCP resource: its template's result is the
  * resource content at `graft://<name>` (reference
  * mcp_route_handlers.cpp:643-652, flapi:// scheme). */
final case class McpResourceConfig(
    name: String,
    description: String = "",
    mimeType: String = "application/json")

/** An endpoint exposed as an MCP prompt: a text template with
  * `{{arg}}` placeholders (reference mcp_route_handlers.cpp:1126-1206). */
final case class McpPromptConfig(
    name: String,
    description: String = "",
    template: String = "",
    arguments: Seq[String] = Nil)

final case class EndpointConfig(
    urlPath: String,
    /** true for tool/resource/prompt-only configs (no url-path in the
      * YAML): they serve ONLY via MCP JSON-RPC, never as a REST route —
      * a REST alias would bypass MCP RBAC. */
    mcpOnly: Boolean = false,
    method: String = "GET",
    templateSource: String,
    connection: Seq[String] = Nil,
    requestFields: Seq[RequestFieldConfig] = Nil,
    /** reject params not declared in requestFields (T7) */
    requestFieldsValidation: Boolean = false,
    withPagination: Boolean = true,
    /** `pagination: keyset: <col>` — deep pagination by a unique
      * ordering key: the page plan is `key > cursor ORDER BY key LIMIT
      * n` (pushed-down range scan, O(page)), never a growing OFFSET
      * (O(offset+page)). The envelope's `next` becomes a cursor link
      * (`?after=<last-key>`). */
    paginationKeyset: Option[String] = None,
    isWrite: Boolean = false,
    /** write endpoints: return the trailing SELECT's rows (reference
      * operation.returns-data, products-create.yaml). */
    returnsData: Boolean = true,
    cache: CacheConfig = CacheConfig(),
    mcpTool: Option[McpToolConfig] = None,
    mcpResource: Option[McpResourceConfig] = None,
    mcpPrompt: Option[McpPromptConfig] = None,
    auth: Option[AuthConfig] = None,
    rateLimit: Option[RateLimitSettings] = None)
