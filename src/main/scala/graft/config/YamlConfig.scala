package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import org.yaml.snakeyaml.Yaml

/** YAML endpoint/config loader (T9) — the Spark-side counterpart of
  * the reference's config system (config_manager.cpp +
  * extended_yaml_parser.cpp):
  *
  *  - `{{env.VAR}}` substitution against an allowlist (deny by
  *    default; extended_yaml_parser.cpp:657-726);
  *  - `{{include:section from file.yaml [if cond]}}` composition —
  *    the included (section of the) file is re-serialized and
  *    re-indented at the directive's indentation; conditions are
  *    true/false/env.VAR/!env.VAR (:728-749);
  *  - endpoint auto-discovery: every `*.yaml` under a template dir
  *    with a `url-path` key becomes an endpoint.
  */
object YamlConfig {

  private val EnvRe: Regex = """\{\{env\.([A-Za-z_][A-Za-z0-9_]*)\}\}""".r
  private val IncludeRe: Regex =
    """\{\{include(?::([^}\s]+))?\s+from\s+([^}\s]+)(?:\s+if\s+([^}]+))?\}\}""".r

  def substituteEnv(
      input: String,
      allow: String => Boolean,
      env: Map[String, String] = sys.env): String =
    EnvRe.replaceAllIn(input, m => {
      val name = m.group(1)
      if (allow(name)) Regex.quoteReplacement(env.getOrElse(name, ""))
      else Regex.quoteReplacement(m.matched) // disallowed: left verbatim
    })

  private[config] def evalCondition(cond: String, env: Map[String, String]): Boolean =
    cond.trim match {
      case "true" => true
      case "false" => false
      case c if c.startsWith("!env.") => env.get(c.substring(5)).forall(_.isEmpty)
      case c if c.startsWith("env.") => env.get(c.substring(4)).exists(_.nonEmpty)
      case _ => false
    }

  /** Expand include directives in `text`, resolving paths against
    * `baseDir`. One level of nesting re-processes recursively. */
  def processIncludes(
      text: String,
      baseDir: Path,
      env: Map[String, String] = sys.env,
      depth: Int = 0): String = {
    require(depth < 10, "include nesting too deep (cycle?)")
    text.linesIterator.map { line =>
      // a YAML comment may MENTION the include syntax (the reference's
      // customer-common.yaml:5 documents it in a header comment) —
      // directives only count on non-comment lines
      IncludeRe.findFirstMatchIn(line)
        .filterNot(_ => line.trim.startsWith("#")) match {
        case Some(m) =>
          val indent = line.takeWhile(_ == ' ')
          val cond = Option(m.group(3))
          if (cond.exists(c => !evalCondition(c, env))) ""
          else {
            val section = Option(m.group(1))
            val file = baseDir.resolve(m.group(2))
            val raw = new String(Files.readAllBytes(file), "UTF-8")
            val processed = processIncludes(raw, file.getParent, env, depth + 1)
            val node = new Yaml().load[Any](processed)
            // reference semantics (extended_yaml_parser.cpp:313-331): a
            // SECTION include re-emits under its own section key — the
            // directive `{{include:request from f}}` expands to
            // `request:\n  - …`; a whole-file include splices the node.
            // block style: flow maps (`{k: v}`) cannot sit beside the
            // including document's sibling block keys
            val dumpOpts = new org.yaml.snakeyaml.DumperOptions()
            dumpOpts.setDefaultFlowStyle(
              org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
            val dumper = new Yaml(dumpOpts)
            val emitted = section match {
              case Some(s) =>
                val selected = node.asInstanceOf[java.util.Map[String, Any]]
                  .asScala.getOrElse(s,
                    throw new IllegalArgumentException(s"section '$s' not found in $file"))
                val wrapper = new java.util.LinkedHashMap[String, Any]()
                wrapper.put(s, selected)
                dumper.dump(wrapper)
              case None => dumper.dump(node)
            }
            emitted.linesIterator.map(l => indent + l).mkString("\n")
          }
        case None => line
      }
    }.mkString("\n")
  }

  // ---- endpoint model binding ------------------------------------------

  private def str(m: java.util.Map[String, Any], k: String): Option[String] =
    Option(m.get(k)).map(String.valueOf)

  private def asMap(v: Any): java.util.Map[String, Any] =
    v.asInstanceOf[java.util.Map[String, Any]]

  private def asList(v: Any): Seq[Any] =
    v.asInstanceOf[java.util.List[Any]].asScala.toSeq

  def parseValidator(v: Any): ValidatorConfig = {
    val m = asMap(v)
    val tpe = str(m, "type").getOrElse("string")
    // the reference's date/time validators spell their bounds as plain
    // min/max (customer-common.yaml: `min: "2000-01-01"`); numeric
    // min/max applies to string/int validators only
    val rawMin = str(m, "min").orElse(str(m, "min-length"))
    val rawMax = str(m, "max").orElse(str(m, "max-length"))
    def intOr0(s: Option[String]) =
      s.flatMap(x => scala.util.Try(x.toInt).toOption).getOrElse(0)
    ValidatorConfig(
      tpe = tpe,
      regex = str(m, "regex").orElse(str(m, "pattern")).getOrElse(""),
      min = if (tpe == "date" || tpe == "time") 0 else intOr0(rawMin),
      max = if (tpe == "date" || tpe == "time") 0 else intOr0(rawMax),
      minDate = str(m, "min-date")
        .orElse(if (tpe == "date") rawMin else None).getOrElse(""),
      maxDate = str(m, "max-date")
        .orElse(if (tpe == "date") rawMax else None).getOrElse(""),
      minTime = str(m, "min-time")
        .orElse(if (tpe == "time") rawMin else None).getOrElse(""),
      maxTime = str(m, "max-time")
        .orElse(if (tpe == "time") rawMax else None).getOrElse(""),
      allowedValues = Option(m.get("allowedValues")).orElse(Option(m.get("allowed-values")))
        .map(asList(_).map(String.valueOf)).getOrElse(Nil),
      preventSqlInjection = str(m, "preventSqlInjection")
        .forall(_.toBoolean))
  }

  def parseField(v: Any): RequestFieldConfig = {
    val m = asMap(v)
    RequestFieldConfig(
      fieldName = str(m, "field-name").getOrElse(
        throw new IllegalArgumentException("request field missing field-name")),
      fieldIn = str(m, "field-in").getOrElse("query"),
      description = str(m, "description").getOrElse(""),
      required = str(m, "required").exists(_.toBoolean),
      defaultValue = str(m, "default"),
      validators = Option(m.get("validators"))
        .map(asList(_).map(parseValidator)).getOrElse(Nil))
  }

  def parseCache(v: Any): CacheConfig = {
    val m = asMap(v)
    CacheConfig(
      enabled = str(m, "enabled").forall(_.toBoolean),
      table = str(m, "table").getOrElse(""),
      schema = str(m, "schema").getOrElse("cache"),
      schedule = str(m, "schedule"),
      // the reference spells both `primary-keys` and `primary-key`
      // (customers-rest.yaml:32)
      primaryKeys = Option(m.get("primary-keys")).orElse(Option(m.get("primary-key")))
        .map(asList(_).map(String.valueOf)).getOrElse(Nil),
      cursor = Option(m.get("cursor")).map { c =>
        val cm = asMap(c)
        CursorConfig(
          str(cm, "column").getOrElse(""),
          str(cm, "type").getOrElse("string"))
      },
      retention = Option(m.get("retention")).map { r =>
        val rm = asMap(r)
        RetentionConfig(
          keepLastSnapshots = str(rm, "keep-last-snapshots").map(_.toInt),
          maxSnapshotAge = str(rm, "max-snapshot-age"))
      }.getOrElse(RetentionConfig()),
      templateFile = str(m, "template-file"),
      invalidateOnWrite = str(m, "invalidate-on-write").exists(_.toBoolean),
      refreshOnWrite = str(m, "refresh-on-write").exists(_.toBoolean),
      zorderBy = Option(m.get("zorder-by"))
        .map(asList(_).map(String.valueOf)).getOrElse(Nil))
  }

  private def parseMcpTool(v: Any): McpToolConfig = {
    val m = asMap(v)
    McpToolConfig(
      name = str(m, "name").getOrElse(
        throw new IllegalArgumentException("mcp-tool missing name")),
      description = str(m, "description").getOrElse(""),
      resultMimeType = str(m, "result-mime-type").getOrElse("application/json"))
  }

  private def parseMcpResource(v: Any): McpResourceConfig = {
    val m = asMap(v)
    McpResourceConfig(
      name = str(m, "name").getOrElse(
        throw new IllegalArgumentException("mcp-resource missing name")),
      description = str(m, "description").getOrElse(""),
      mimeType = str(m, "mime-type").getOrElse("application/json"))
  }

  private def parseMcpPrompt(v: Any): McpPromptConfig = {
    val m = asMap(v)
    McpPromptConfig(
      name = str(m, "name").getOrElse(
        throw new IllegalArgumentException("mcp-prompt missing name")),
      description = str(m, "description").getOrElse(""),
      template = str(m, "template").getOrElse(""),
      arguments = Option(m.get("arguments"))
        .map(asList(_).map(String.valueOf)).getOrElse(Nil))
  }

  private def parseAuth(v: Any): AuthConfig = {
    val m = asMap(v)
    AuthConfig(
      enabled = str(m, "enabled").exists(_.toBoolean),
      tpe = str(m, "type").getOrElse("basic"),
      users = Option(m.get("users")).map(asList(_).map { u =>
        val um = asMap(u)
        AuthUserConfig(
          username = str(um, "username").getOrElse(""),
          password = str(um, "password").getOrElse(""),
          roles = Option(um.get("roles"))
            .map(asList(_).map(String.valueOf)).getOrElse(Nil))
      }).getOrElse(Nil),
      jwtSecret = str(m, "jwt-secret"),
      jwtIssuer = str(m, "jwt-issuer"),
      oidc = Option(m.get("oidc")).map { o =>
        val om = asMap(o)
        OidcSettingsConfig(
          provider = str(om, "provider").getOrElse("generic"),
          issuerUrl = str(om, "issuer-url").getOrElse(""),
          clientId = str(om, "client-id").getOrElse(""),
          jwksSource = str(om, "jwks-file").orElse(str(om, "jwks-url")).getOrElse(""),
          usernameClaim = str(om, "username-claim").getOrElse(""),
          rolesClaim = str(om, "roles-claim").getOrElse(""),
          roleClaimPath = str(om, "role-claim-path").getOrElse(""))
      })
  }

  private def parseRateLimit(v: Any): RateLimitSettings = {
    val m = asMap(v)
    RateLimitSettings(
      enabled = str(m, "enabled").exists(_.toBoolean),
      max = str(m, "max").flatMap(x => scala.util.Try(x.toInt).toOption).getOrElse(0),
      intervalSeconds = str(m, "interval")
        .flatMap(x => scala.util.Try(x.toInt).toOption).getOrElse(60),
      keyStrategy = str(m, "key-strategy").getOrElse("ip"))
  }

  def parseEndpoint(yaml: String): EndpointConfig = {
    val m = asMap(new Yaml().load[Any](yaml))
    val mcpTool = Option(m.get("mcp-tool")).map(parseMcpTool)
    val mcpResource = Option(m.get("mcp-resource")).map(parseMcpResource)
    val mcpPrompt = Option(m.get("mcp-prompt")).map(parseMcpPrompt)
    // MCP-only endpoints (tool/resource/prompt yamls) carry no url-path;
    // their serving identity is the mcp name (reference PathUtils slug)
    val mcpName = mcpTool.map(_.name)
      .orElse(mcpResource.map(_.name)).orElse(mcpPrompt.map(_.name))
    EndpointConfig(
      urlPath = str(m, "url-path")
        .orElse(mcpName.map("/mcp/" + _)).getOrElse(
          throw new IllegalArgumentException(
            "endpoint missing url-path (and no mcp-tool/resource/prompt name)")),
      // no explicit url-path → MCP-only: the synthetic path is an
      // identity, NOT a REST route (REST would bypass MCP RBAC)
      mcpOnly = str(m, "url-path").isEmpty && mcpName.isDefined,
      method = str(m, "method").getOrElse("GET"),
      templateSource = str(m, "template-source").getOrElse(""),
      connection = Option(m.get("connection")).map {
        case l: java.util.List[_] => l.asScala.map(String.valueOf).toSeq
        case s => Seq(String.valueOf(s))
      }.getOrElse(Nil),
      requestFields = Option(m.get("request"))
        .map(asList(_).map(parseField)).getOrElse(Nil),
      requestFieldsValidation =
        str(m, "request-fields-validation").exists(_.toBoolean),
      withPagination = str(m, "with-pagination").forall(_.toBoolean),
      paginationKeyset = Option(m.get("pagination")).map(asMap)
        .flatMap(pm => str(pm, "keyset")),
      // write-ness: an explicit operation.type: write block (reference
      // products-create.yaml) or a mutating HTTP method
      isWrite = Option(m.get("operation")).map(asMap)
        .flatMap(om => str(om, "type")).contains("write") ||
        str(m, "method").exists(x =>
          Set("POST", "PUT", "PATCH", "DELETE").contains(x.toUpperCase)),
      returnsData = Option(m.get("operation")).map(asMap)
        .flatMap(om => str(om, "returns-data")).forall(_.toBoolean),
      cache = Option(m.get("cache")).map(parseCache).getOrElse(CacheConfig()),
      mcpTool = mcpTool,
      mcpResource = mcpResource,
      mcpPrompt = mcpPrompt,
      auth = Option(m.get("auth")).map(parseAuth),
      rateLimit = Option(m.get("rate-limit")).map(parseRateLimit))
  }

  /** Load an endpoint file: env substitution → include expansion →
    * model binding. */
  def loadEndpoint(
      path: Path,
      envAllow: String => Boolean = _ => false,
      env: Map[String, String] = sys.env): EndpointConfig = {
    val raw = new String(Files.readAllBytes(path), "UTF-8")
    val expanded = processIncludes(substituteEnv(raw, envAllow, env), path.getParent, env)
    parseEndpoint(expanded)
  }

  /** Auto-discovery: every *.yaml with a url-path or mcp-* block under `dir`
    * (config_manager endpoint scan). */
  def discoverEndpoints(
      dir: String,
      envAllow: String => Boolean = _ => false): Seq[EndpointConfig] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Nil
    else Files.list(d).iterator().asScala
      .filter(p => p.toString.endsWith(".yaml") || p.toString.endsWith(".yml"))
      .flatMap { p =>
        try {
          val txt = new String(Files.readAllBytes(p), "UTF-8")
          val isEndpoint = txt.contains("url-path") ||
            txt.contains("mcp-tool") || txt.contains("mcp-resource") ||
            txt.contains("mcp-prompt")
          if (isEndpoint) Some(loadEndpoint(p, envAllow)) else None
        } catch { case _: Exception => None }
      }.toSeq.sortBy(_.urlPath)
  }
}
