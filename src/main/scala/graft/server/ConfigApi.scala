package graft.server

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicReference

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.HttpExchange
import org.apache.spark.sql.SparkSession

import graft.api.TemplatePipeline
import graft.config._

/** Live endpoint registry: the serving tables the config service
  * mutates. Swap is atomic (readers see old or new, never a mix) —
  * the Spark analog of the reference's ConfigManager reload semantics
  * (config_manager.cpp refreshConfig: full-vector replacement).
  */
final class EndpointRegistry(initial: Seq[ServedEndpoint]) {
  private val ref = new AtomicReference[Seq[ServedEndpoint]](initial)

  def all: Seq[ServedEndpoint] = ref.get()

  /** URL-safe endpoint identity, identical to the MCP tool name: an
    * explicit mcp-tool name wins; otherwise the sanitized url-path. */
  def slug(ep: ServedEndpoint): String =
    ep.config.mcpTool.map(_.name).getOrElse(
      ep.config.urlPath.stripPrefix("/").replaceAll("[/:]+", "_"))

  def find(slug0: String): Option[ServedEndpoint] = all.find(slug(_) == slug0)

  private def invalidatePlans(): Unit = graft.api.PlanCache.invalidateAll()

  def upsert(ep: ServedEndpoint): Unit = {
    ref.updateAndGet(cur => cur.filterNot(slug(_) == slug(ep)) :+ ep)
    invalidatePlans()
  }

  def remove(slug0: String): Boolean = {
    // atomic like upsert: a get/filter/set window would drop a
    // concurrent upsert landing between the reads
    val before = ref.getAndUpdate(cur => cur.filterNot(slug(_) == slug0))
    invalidatePlans()
    before.exists(slug(_) == slug0)
  }

  /** Atomic PUT: drop the old slug and install the new endpoint in ONE
    * swap — readers never observe the endpoint missing. */
  def replace(oldSlug: String, ep: ServedEndpoint): Unit = {
    ref.updateAndGet(cur =>
      cur.filterNot(e => slug(e) == oldSlug || slug(e) == slug(ep)) :+ ep)
    invalidatePlans()
  }
}

final case class ConfigServiceConfig(
    enabled: Boolean = true,
    /** Bearer token required on every _config route when set
      * (config_service.cpp validateToken). */
    token: Option[String] = None,
    /** `{{conn.*}}` properties granted to endpoints created through the
      * API (the bootstrap passes the project's connection map — an
      * API-created endpoint must render conn refs like a discovered
      * one). */
    connProps: Map[String, String] = Map.empty,
    /** project env allowlist, consulted by the security audit so
      * whitelisted `{{env.*}}` refs aren't flagged as findings. */
    templateEnv: graft.config.TemplateEnvConfig = graft.config.TemplateEnvConfig(),
    /** name → path probed by GET /health/storage (reference
      * vfs_health_checker.cpp wired at config_service.cpp:619-631);
      * the bootstrap passes the config dir + template dir. */
    storagePaths: Map[String, String] = Map.empty)

/** Config-service REST API v1 (reference config_service.cpp:258-660):
  * endpoint CRUD, validation, reload, template get/put/expand/test,
  * parameters, cache refresh trigger, schema listing, log level.
  *
  * All mutation is in-memory registry swap; the engine is the source
  * of truth for schemas (spark.catalog), so "schema" introspects live
  * tables rather than a parallel metadata store.
  */
final class ConfigApi(
    spark: SparkSession,
    registry: EndpointRegistry,
    cfg: ConfigServiceConfig,
    cacheManager: Option[graft.cache.CacheManager],
    respond: (HttpExchange, Int, String, String) => Unit) {

  private val mapper = new ObjectMapper()

  private def json(ex: HttpExchange, status: Int, body: String): Unit =
    respond(ex, status, body, "application/json")

  private def err(ex: HttpExchange, status: Int, msg: String): Unit = {
    val n = mapper.createObjectNode(); n.put("error", msg)
    json(ex, status, mapper.writeValueAsString(n))
  }

  private def authorized(ex: HttpExchange): Boolean = cfg.token match {
    case None => true
    case Some(t) =>
      // constant-time: `==` on a secret leaks match-prefix via timing
      val presented = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .filter(_.startsWith("Bearer "))
        .map(_.stripPrefix("Bearer ").trim).getOrElse("")
      java.security.MessageDigest.isEqual(
        presented.getBytes(UTF_8), t.getBytes(UTF_8))
  }

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  // ---- JSON rendering of the config model --------------------------------

  private def validatorJson(v: ValidatorConfig) = {
    val n = mapper.createObjectNode()
    n.put("type", v.tpe)
    if (v.regex.nonEmpty) n.put("regex", v.regex)
    if (v.min != 0 || v.max != 0) { n.put("min", v.min); n.put("max", v.max) }
    if (v.allowedValues.nonEmpty) {
      val a = n.putArray("allowed-values"); v.allowedValues.foreach(a.add)
    }
    n.put("prevent-sql-injection", v.preventSqlInjection)
    n
  }

  private[server] def fieldJson(f: RequestFieldConfig) = {
    val n = mapper.createObjectNode()
    n.put("field-name", f.fieldName)
    n.put("field-in", f.fieldIn)
    if (f.description.nonEmpty) n.put("description", f.description)
    n.put("required", f.required)
    f.defaultValue.foreach(n.put("default", _))
    val vs = n.putArray("validators")
    f.validators.foreach(v => vs.add(validatorJson(v)))
    n
  }

  private[server] def configJson(ep: ServedEndpoint) = {
    val c = ep.config
    val n = mapper.createObjectNode()
    n.put("slug", registry.slug(ep))
    n.put("url-path", c.urlPath)
    n.put("method", c.method)
    n.put("template-source", c.templateSource)
    n.put("with-pagination", c.withPagination)
    n.put("request-fields-validation", c.requestFieldsValidation)
    val rf = n.putArray("request")
    c.requestFields.foreach(f => rf.add(fieldJson(f)))
    if (c.cache.enabled) {
      val cc = n.putObject("cache")
      cc.put("enabled", true); cc.put("table", c.cache.table)
      c.cache.schedule.foreach(cc.put("schedule", _))
    }
    n
  }

  // ---- endpoint parsing (PUT/POST bodies; JSON is valid YAML, so the
  // shared YamlConfig binder serves both content types) --------------------

  private[server] def parseServed(doc: String): Either[String, ServedEndpoint] =
    try {
      val config = YamlConfig.parseEndpoint(doc)
      val m = new org.yaml.snakeyaml.Yaml().load[Any](doc)
        .asInstanceOf[java.util.Map[String, Any]]
      val inline = Option(m.get("template")).map(String.valueOf).getOrElse("")
      // no inline SQL → resolve template-source through the VFS layer
      // (local path, file://, hdfs://, s3a://, https://)
      val template =
        if (inline.trim.nonEmpty) inline
        else if (config.templateSource.nonEmpty) {
          // API-submitted sources are UNTRUSTED: when storage paths are
          // configured (the bootstrap default: config + template dirs),
          // confine local reads to them — an absolute source like
          // /etc/passwd must not resolve just because it exists. With
          // no storage paths (embedded/test use) behavior is unchanged;
          // traversal + scheme checks still apply inside load.
          val v = graft.template.PathValidator.validate(
            config.templateSource, cfg.storagePaths.get("templates"),
            graft.template.PathValidator.Config(
              allowedPrefixes = cfg.storagePaths.values.toSeq))
          v.left.foreach(reason =>
            throw new SecurityException(s"template-source rejected: $reason"))
          graft.template.TemplateSource.load(spark, config.templateSource,
            cfg.storagePaths.get("templates"))
        } else ""
      if (template.trim.isEmpty) Left("missing 'template' (SQL text) or resolvable 'template-source'")
      else Right(ServedEndpoint(config, template,
        // same wiring as bootstrap-discovered endpoints: conn props,
        // declared rate limit, RBAC roles from the auth block — an
        // API-created endpoint must not silently shed its config
        connProps = cfg.connProps,
        rateLimit = config.rateLimit.filter(_.enabled)
          .map(rl => RateLimitConfig(rl.requestsPerMinute)),
        allowedRoles = config.auth.filter(_.enabled)
          .map(_.users.flatMap(_.roles).distinct)))
    } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }

  /** Endpoint-config validation: the shared rule set (structural +
    * dry render) the offline CLI also runs — one source of truth so
    * the two surfaces cannot drift. */
  private[server] def validate(ep: ServedEndpoint): Seq[String] =
    graft.api.EndpointValidator.errors(ep.config, ep.template, ep.connProps)

  // ---- dispatcher --------------------------------------------------------

  def handle(ex: HttpExchange): Unit = {
    if (!cfg.enabled) { err(ex, 404, "config service disabled"); return }
    if (!authorized(ex)) { err(ex, 401, "Unauthorized: Invalid or missing token"); return }
    val rel = ex.getRequestURI.getPath.stripPrefix("/api/v1/_config")
      .stripPrefix("/").stripSuffix("/")
    val parts = if (rel.isEmpty) Array.empty[String]
      else rel.split("/").map(URLDecoder.decode(_, UTF_8))
    val method = ex.getRequestMethod.toUpperCase
    // the exchange body is a one-shot stream: read it exactly once
    val rawBody = if (method == "GET" || method == "DELETE") "" else body(ex)

    (parts.toList, method) match {
      case (Nil, "GET") | (List("project"), "GET") =>
        val n = mapper.createObjectNode()
        n.put("name", "graft"); n.put("engine", "spark")
        n.put("endpoints", registry.all.size)
        json(ex, 200, mapper.writeValueAsString(n))

      // overall service health (reference CLI `health` hits GET
      // /api/v1/_config/health): storage verdict + serving counts
      case (List("health"), "GET") =>
        val h = graft.template.VfsHealth.checkHealth(
          spark, cfg.storagePaths.toSeq.sortBy(_._1))
        val root = mapper.createObjectNode()
        root.put("status", if (h.healthy) "healthy" else "unhealthy")
        root.put("endpoints", registry.all.size)
        root.put("storage_backends", h.backends.size)
        json(ex, if (h.healthy) 200 else 503, mapper.writeValueAsString(root))

      // storage-backend health (reference vfs_health_checker.cpp via
      // config_service.cpp:619-631): accessibility + latency per path
      case (List("health", "storage"), "GET") =>
        val h = graft.template.VfsHealth.checkHealth(
          spark, cfg.storagePaths.toSeq.sortBy(_._1))
        val root = mapper.createObjectNode()
        root.put("status", if (h.healthy) "healthy" else "unhealthy")
        root.put("total_latency_ms", h.totalLatencyMs)
        val a = root.putArray("backends")
        h.backends.foreach { b =>
          val n = mapper.createObjectNode()
          n.put("name", b.name); n.put("path", b.path); n.put("scheme", b.scheme)
          n.put("accessible", b.accessible); n.put("latency_ms", b.latencyMs)
          if (b.error.nonEmpty) n.put("error", b.error)
          a.add(n)
        }
        json(ex, if (h.healthy) 200 else 503, mapper.writeValueAsString(root))

      // security audit over the LIVE registry (reference
      // security_auditor.cpp; findings are advisory — serving continues)
      case (List("audit"), "GET") =>
        val warnings = SecurityAuditor.audit(registry.all, cfg.templateEnv, Some(cfg))
        val root = mapper.createObjectNode()
        root.put("warning_count", warnings.size)
        val a = root.putArray("warnings")
        warnings.foreach { w =>
          val n = mapper.createObjectNode()
          n.put("code", w.code); n.put("message", w.message)
          n.put("location", w.location)
          a.add(n)
        }
        json(ex, 200, mapper.writeValueAsString(root))

      case (List("endpoints"), "GET") =>
        val a = mapper.createArrayNode()
        registry.all.sortBy(_.config.urlPath).foreach { ep =>
          val n = mapper.createObjectNode()
          n.put("slug", registry.slug(ep))
          n.put("url-path", ep.config.urlPath)
          n.put("method", ep.config.method)
          n.put("template-source", ep.config.templateSource)
          a.add(n)
        }
        json(ex, 200, mapper.writeValueAsString(a))

      case (List("endpoints"), "POST") =>
        parseServed(rawBody) match {
          case Left(e) => err(ex, 400, e)
          case Right(ep) =>
            val errs = validate(ep)
            if (errs.nonEmpty) err(ex, 400, errs.mkString("; "))
            else { registry.upsert(ep); json(ex, 201, mapper.writeValueAsString(configJson(ep))) }
        }

      case (List("endpoints", slug), "GET") =>
        registry.find(slug) match {
          case None => err(ex, 404, s"no endpoint '$slug'")
          case Some(ep) => json(ex, 200, mapper.writeValueAsString(configJson(ep)))
        }

      case (List("endpoints", slug), "PUT") =>
        parseServed(rawBody) match {
          case Left(e) => err(ex, 400, e)
          case Right(ep) =>
            val errs = validate(ep)
            if (errs.nonEmpty) err(ex, 400, errs.mkString("; "))
            else {
              // atomic replace under the SLUG identity: an endpoint
              // whose url-path changed swaps routes in one step
              registry.replace(slug, ep)
              json(ex, 200, mapper.writeValueAsString(configJson(ep)))
            }
        }

      case (List("endpoints", slug), "DELETE") =>
        if (registry.remove(slug)) json(ex, 200, """{"deleted":true}""")
        else err(ex, 404, s"no endpoint '$slug'")

      case (List("endpoints", slug, "validate"), "POST") =>
        val target = if (rawBody.trim.nonEmpty) parseServed(rawBody)
          else registry.find(slug).toRight(s"no endpoint '$slug'")
        target match {
          case Left(e) => err(ex, 400, e)
          case Right(ep) =>
            val errs = validate(ep)
            val n = mapper.createObjectNode()
            n.put("valid", errs.isEmpty)
            val a = n.putArray("errors"); errs.foreach(a.add)
            json(ex, 200, mapper.writeValueAsString(n))
        }

      case (List("endpoints", slug, "reload"), "POST") =>
        registry.find(slug) match {
          case None => err(ex, 404, s"no endpoint '$slug'")
          case Some(ep) =>
            // in-memory registry: reload = re-validate + atomic re-swap
            val errs = validate(ep)
            if (errs.nonEmpty) err(ex, 400, errs.mkString("; "))
            else { registry.upsert(ep); json(ex, 200, """{"reloaded":true}""") }
        }

      case (List("endpoints", slug, "parameters"), "GET") =>
        registry.find(slug) match {
          case None => err(ex, 404, s"no endpoint '$slug'")
          case Some(ep) =>
            val a = mapper.createArrayNode()
            ep.config.requestFields.foreach(f => a.add(fieldJson(f)))
            json(ex, 200, mapper.writeValueAsString(a))
        }

      case (List("endpoints", slug, "template"), "GET") =>
        registry.find(slug) match {
          case None => err(ex, 404, s"no endpoint '$slug'")
          case Some(ep) =>
            val n = mapper.createObjectNode(); n.put("template", ep.template)
            json(ex, 200, mapper.writeValueAsString(n))
        }

      case (List("endpoints", slug, "template"), "PUT") =>
        registry.find(slug) match {
          case None => err(ex, 404, s"no endpoint '$slug'")
          case Some(ep) =>
            val raw = rawBody
            val template =
              try Option(mapper.readTree(raw).path("template").asText(""))
                .filter(_.nonEmpty).getOrElse(raw)
              catch { case _: Exception => raw }
            if (template.trim.isEmpty) err(ex, 400, "empty template")
            else { registry.upsert(ep.copy(template = template)); json(ex, 200, """{"updated":true}""") }
        }

      case (List("endpoints", slug, "template", "expand"), "POST") =>
        withParams(ex, slug, rawBody) { (ep, params) =>
          TemplatePipeline.prepare(ep.config, ep.template, params, ep.connProps) match {
            case Left(errs) => err(ex, 400, errs.mkString("; "))
            case Right((sql, binds)) =>
              val n = mapper.createObjectNode()
              n.put("sql", sql); n.put("bind_count", binds.length)
              json(ex, 200, mapper.writeValueAsString(n))
          }
        }

      case (List("endpoints", slug, "template", "test"), "POST") =>
        withParams(ex, slug, rawBody) { (ep, params) =>
          val df = TemplatePipeline.run(spark, ep.config, ep.template, params, ep.connProps)
            .limit(10) // test harness: a peek, never a full run
          val rows = df.collect()
          val n = mapper.createObjectNode()
          val cols = n.putArray("columns"); df.schema.fieldNames.foreach(cols.add)
          n.put("row_count", rows.length)
          n.put("data", mapper.readTree(
            graft.serialize.JsonWire.rows(df.schema, rows.iterator).mkString("[", ",", "]")))
          json(ex, 200, mapper.writeValueAsString(n))
        }

      case (List("endpoints", slug, "cache", "refresh"), "POST") =>
        registry.find(slug) match {
          case None => err(ex, 404, s"no endpoint '$slug'")
          case Some(ep) if !ep.config.cache.enabled =>
            err(ex, 400, s"endpoint '$slug' has no cache configured")
          case Some(ep) => cacheManager match {
            case None => err(ex, 400, "no cache manager wired")
            case Some(cm) =>
              val id = cm.refresh(ep.config, ep.template, Map.empty, ep.connProps)
              val n = mapper.createObjectNode()
              n.put("refreshed", true); n.put("snapshot_id", id)
              json(ex, 200, mapper.writeValueAsString(n))
          }
        }

      case (List("schema"), "GET") =>
        // live engine introspection (the reference lists DuckDB schemas;
        // here the catalog IS the schema source)
        val a = mapper.createArrayNode()
        spark.catalog.listTables().collect().sortBy(_.name).foreach { t =>
          val n = mapper.createObjectNode()
          n.put("name", t.name)
          n.put("is_temporary", t.isTemporary)
          val cols = n.putArray("columns")
          try spark.table(t.name).schema.fields.foreach { f =>
            val c = mapper.createObjectNode()
            c.put("name", f.name); c.put("type", f.dataType.simpleString)
            cols.add(c)
          } catch { case _: Exception => () }
          a.add(n)
        }
        json(ex, 200, mapper.writeValueAsString(a))

      case (List("log-level"), "PUT" | "POST") =>
        val level = try mapper.readTree(rawBody).path("level").asText("")
          catch { case _: Exception => "" }
        Seq("DEBUG", "INFO", "WARN", "ERROR").find(_.equalsIgnoreCase(level)) match {
          case None => err(ex, 400, s"invalid level '$level'")
          case Some(l) => spark.sparkContext.setLogLevel(l); json(ex, 200, """{"updated":true}""")
        }

      case _ => err(ex, 404, s"no such config route: $method $rel")
    }
  }

  private def withParams(ex: HttpExchange, slug: String, rawBody: String)(
      f: (ServedEndpoint, Map[String, String]) => Unit): Unit =
    registry.find(slug) match {
      case None => err(ex, 404, s"no endpoint '$slug'")
      case Some(ep) =>
        val params =
          try {
            val node = mapper.readTree(rawBody).path("parameters")
            if (!node.isObject) Map.empty[String, String]
            else {
              val it = node.fields()
              val b = Map.newBuilder[String, String]
              while (it.hasNext) {
                val e = it.next()
                b += e.getKey -> graft.api.ParamAssembly.jsonValueToString(e.getValue)
              }
              b.result()
            }
          } catch { case _: Exception => Map.empty[String, String] }
        f(ep, params)
    }
}
