package graft.server

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

import graft.api.TemplatePipeline

/** Config-management MCP tools (reference config_tool_adapter.cpp):
  * the config service's capabilities exposed to AI operators as
  * `graft_*` tools — same inventory as the reference's `flapi_*` set,
  * same auth split (read-only tools open, MUTATING tools require the
  * config-service bearer token when one is configured; a mutation can
  * never ride an unauthenticated MCP session past the REST gate).
  * All operations reuse the ConfigApi machinery (parse/validate/
  * registry swap), so MCP and REST mutations have identical semantics.
  */
final class ConfigToolAdapter(
    spark: SparkSession,
    registry: EndpointRegistry,
    cfg: ConfigServiceConfig,
    api: ConfigApi,
    cacheManager: Option[graft.cache.CacheManager],
    monitors: Option[MonitorManager] = None) {

  private val mapper = new ObjectMapper()

  /** name → description. Same inventory as the reference's tool table.
    * Unlike the reference's per-tool auth flags, EVERY config tool
    * gates on the config-service bearer token when one is configured —
    * identical to the REST _config routes, which 401 every method
    * including GETs. Anything weaker leaks templates/configs/schema
    * (and graft_test_template executes endpoint SQL) past the gate the
    * operator explicitly set. */
  val tools: Seq[(String, String)] = Seq(
    ("graft_get_project_config", "Project summary: name, engine, endpoint count"),
    ("graft_get_environment", "Engine environment: versions, parallelism"),
    ("graft_get_filesystem", "Warehouse and catalog locations"),
    ("graft_get_schema", "List catalog tables, or columns of {table}"),
    ("graft_refresh_schema", "Refresh catalog metadata (optionally for {table})"),
    ("graft_get_template", "SQL template of endpoint {slug}"),
    ("graft_update_template", "Replace the SQL template of endpoint {slug}"),
    ("graft_expand_template", "Render endpoint {slug}'s template with {params}"),
    ("graft_test_template", "Execute endpoint {slug} with {params}, first rows"),
    ("graft_explain_template", "Formatted Spark physical plan of endpoint {slug} with {params}"),
    ("graft_list_endpoints", "List endpoint slugs and routes"),
    ("graft_get_endpoint", "Full config of endpoint {slug}"),
    ("graft_create_endpoint", "Create an endpoint from a YAML/JSON {config}"),
    ("graft_update_endpoint", "Replace endpoint {slug} with {config}"),
    ("graft_delete_endpoint", "Delete endpoint {slug}"),
    ("graft_reload_endpoint", "Re-validate and re-install endpoint {slug}"),
    ("graft_get_cache_status", "Snapshot manifest of endpoint {slug}'s cache"),
    ("graft_refresh_cache", "Refresh endpoint {slug}'s cache table now"),
    ("graft_get_cache_audit", "Recent cache sync events"),
    ("graft_run_cache_gc", "Apply retention to endpoint {slug}'s cache"),
    ("graft_get_monitors", "Standing drift-monitor verdicts (PSI/CUSUM/SRM/quantile/embedding)"))

  private val toolNames = tools.map(_._1).toSet

  def handles(name: String): Boolean = toolNames.contains(name)

  /** Bearer-token gate — same token, same scope as the REST config
    * API (all routes). Constant-time compare: plain `==` on a secret
    * leaks the match-prefix length via timing.
    *
    * With NO token configured the gate falls back to the SESSION'S
    * auth state when mcp auth is enabled (fail closed — an anonymous
    * MCP session must not create/delete endpoints or execute SQL via
    * graft_test_template just because the operator skipped the
    * config-service token). Only mcpAuthEnabled=false AND no token is
    * open (demo mode) — and the SecurityAuditor flags that combination
    * (CONFIG_SERVICE_NO_TOKEN). */
  def authorized(name: String, authHeader: Option[String],
                 sessionAuthenticated: => Boolean,
                 mcpAuthEnabled: Boolean): Boolean =
    cfg.token match {
      case None => !mcpAuthEnabled || sessionAuthenticated
      case Some(t) =>
        val presented = authHeader.filter(_.startsWith("Bearer "))
          .map(_.stripPrefix("Bearer ").trim).getOrElse("")
        java.security.MessageDigest.isEqual(
          presented.getBytes("UTF-8"), t.getBytes("UTF-8"))
    }

  /** True iff the presented Authorization header carries the valid
    * config-service token (constant-time). Used to give the admin its
    * OWN rate-limit principal: without this a token-authenticated
    * operator with no basic/JWT session shares the "anonymous" bucket,
    * so an unauthenticated flood (charged before the 401) would
    * rate-limit the admin off the config surface. */
  def tokenValid(authHeader: Option[String]): Boolean =
    cfg.token.exists { t =>
      val presented = authHeader.filter(_.startsWith("Bearer "))
        .map(_.stripPrefix("Bearer ").trim).getOrElse("")
      java.security.MessageDigest.isEqual(
        presented.getBytes("UTF-8"), t.getBytes("UTF-8"))
    }

  /** Left(error message) | Right(result JSON). */
  def call(name: String, args: JsonNode): Either[String, String] = {
    def slugArg: Either[String, ServedEndpoint] = {
      val s = args.path("slug").asText("")
      registry.find(s).toRight(s"no endpoint '$s'")
    }
    def paramsArg: Map[String, String] = {
      val p = args.path("params")
      if (!p.isObject) Map.empty
      else {
        val it = p.fieldNames()
        Iterator.continually(it).takeWhile(_.hasNext)
          .map(_.next()).map(k => k -> p.path(k).asText("")).toMap
      }
    }
    def obj(fs: (String, Any)*): String = {
      val n = mapper.createObjectNode()
      fs.foreach {
        case (k, v: String) => n.put(k, v)
        case (k, v: Boolean) => n.put(k, v)
        case (k, v: Int) => n.put(k, v)
        case (k, v: Long) => n.put(k, v)
        case (k, v: JsonNode) => n.set(k, v)
        case (k, v) => n.put(k, String.valueOf(v))
      }
      mapper.writeValueAsString(n)
    }

    try name match {
      case "graft_get_project_config" =>
        Right(obj("name" -> "graft", "engine" -> "spark",
          "endpoints" -> registry.all.size))
      case "graft_get_environment" =>
        Right(obj("spark_version" -> spark.version,
          "java_version" -> System.getProperty("java.version"),
          "default_parallelism" -> spark.sparkContext.defaultParallelism,
          "shuffle_partitions" -> spark.conf.get("spark.sql.shuffle.partitions")))
      case "graft_get_filesystem" =>
        Right(obj(
          "warehouse" -> spark.conf.get("spark.sql.warehouse.dir", ""),
          "current_database" -> spark.catalog.currentDatabase,
          "cache_warehouse" -> cacheManager.map(_.warehouse).getOrElse("")))
      case "graft_get_schema" =>
        val table = args.path("table").asText("")
        if (table.isEmpty) {
          val a = mapper.createArrayNode()
          spark.catalog.listTables().collect().foreach(t => a.add(t.name))
          Right(mapper.writeValueAsString(a))
        } else {
          val a = mapper.createArrayNode()
          spark.table(table).schema.fields.foreach { f =>
            val n = mapper.createObjectNode()
            n.put("name", f.name); n.put("type", f.dataType.simpleString)
            a.add(n)
          }
          Right(mapper.writeValueAsString(a))
        }
      case "graft_refresh_schema" =>
        val table = args.path("table").asText("")
        if (table.nonEmpty) spark.catalog.refreshTable(table)
        else spark.catalog.clearCache()
        Right(obj("refreshed" -> true))
      case "graft_get_template" =>
        slugArg.map(ep => obj("template" -> ep.template))
      case "graft_update_template" =>
        slugArg.flatMap { ep =>
          // same gate as the REST template PUT: a missing/misspelled
          // argument must not silently install an empty template and
          // brick the endpoint; then full endpoint validation (prepare
          // with sample binds) before the registry swap
          val t = args.path("template").asText("")
          if (t.trim.isEmpty) Left("empty template")
          else {
            val updated = ep.copy(template = t)
            val errs = api.validate(updated)
            if (errs.nonEmpty) Left(errs.mkString("; "))
            else {
              registry.replace(registry.slug(ep), updated)
              Right(obj("updated" -> true))
            }
          }
        }
      case "graft_expand_template" =>
        slugArg.flatMap { ep =>
          // same cache-key stripping + injection as every other
          // execution surface — no redirect via caller-supplied keys
          val p = ServedEndpoint.withCacheNamespace(ep, paramsArg)
          TemplatePipeline.prepare(ep.config, ep.template, p, ep.connProps) match {
            case Left(errs) => Left(errs.map(_.message).mkString("; "))
            case Right((sql, binds)) =>
              Right(obj("sql" -> sql, "bind_count" -> binds.length))
          }
        }
      case "graft_test_template" =>
        slugArg.flatMap { ep =>
          // a write template executed "as a test" would mutate data —
          // spark.sql runs a single-statement INSERT eagerly
          if (ep.config.isWrite)
            Left("test_template refuses write endpoints — use the endpoint's write route")
          else try {
            val p = ServedEndpoint.withCacheNamespace(ep, paramsArg)
            val df = TemplatePipeline.run(spark, ep.config, ep.template,
              p, ep.connProps).limit(10)
            val rows = df.toJSON.collect().mkString("[", ",", "]")
            Right(obj("rows" -> mapper.readTree(rows)))
          } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
        }
      case "graft_explain_template" =>
        // plan-only introspection: analyze + optimize without running a
        // job — the AI operator's `.explain("formatted")`, showing
        // PushedFilters / ReadSchema / join strategies for the endpoint
        // as it would actually execute (cache namespace included)
        slugArg.flatMap { ep =>
          try {
            val p = ServedEndpoint.withCacheNamespace(ep, paramsArg)
            val df = TemplatePipeline.run(spark, ep.config, ep.template, p, ep.connProps)
            Right(obj("plan" -> df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)))
          } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
        }
      case "graft_list_endpoints" =>
        val a = mapper.createArrayNode()
        registry.all.sortBy(_.config.urlPath).foreach { ep =>
          val n = mapper.createObjectNode()
          n.put("slug", registry.slug(ep)); n.put("url-path", ep.config.urlPath)
          n.put("method", ep.config.method)
          a.add(n)
        }
        Right(mapper.writeValueAsString(a))
      case "graft_get_endpoint" =>
        slugArg.map(ep => mapper.writeValueAsString(api.configJson(ep)))
      case "graft_create_endpoint" | "graft_update_endpoint" =>
        val doc = args.path("config").asText("")
        api.parseServed(doc) match {
          case Left(e) => Left(e)
          case Right(ep) =>
            val errs = api.validate(ep)
            if (errs.nonEmpty) Left(errs.mkString("; "))
            else {
              if (name == "graft_update_endpoint")
                registry.replace(args.path("slug").asText(registry.slug(ep)), ep)
              else registry.upsert(ep)
              Right(obj("slug" -> registry.slug(ep), "installed" -> true))
            }
        }
      case "graft_delete_endpoint" =>
        val s = args.path("slug").asText("")
        Right(obj("deleted" -> registry.remove(s)))
      case "graft_reload_endpoint" =>
        slugArg.flatMap { ep =>
          val errs = api.validate(ep)
          if (errs.nonEmpty) Left(errs.mkString("; "))
          else { registry.upsert(ep); Right(obj("reloaded" -> true)) }
        }
      case "graft_get_cache_status" =>
        slugArg.flatMap { ep =>
          val c = ep.config.cache
          if (!c.enabled || c.table.isEmpty) Left("endpoint has no cache")
          else cacheManager.toRight("no cache manager configured").map { cm =>
            val rows = cm.table(c).snapshots().toJSON.collect().mkString("[", ",", "]")
            mapper.writeValueAsString(mapper.readTree(rows))
          }
        }
      case "graft_refresh_cache" =>
        slugArg.flatMap { ep =>
          cacheManager.toRight("no cache manager configured").flatMap { cm =>
            try Right(obj("snapshot_id" ->
              cm.refresh(ep.config, ep.cacheTemplate.getOrElse(ep.template),
                connProps = ep.connProps)))
            catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
          }
        }
      case "graft_get_cache_audit" =>
        cacheManager.toRight("no cache manager configured").flatMap { cm =>
          try {
            val rows = cm.syncEvents().limit(100).toJSON.collect().mkString("[", ",", "]")
            Right(mapper.writeValueAsString(mapper.readTree(rows)))
          } catch { case _: Exception => Right("[]") } // no events yet
        }
      case "graft_run_cache_gc" =>
        slugArg.flatMap { ep =>
          val c = ep.config.cache
          if (!c.enabled || c.table.isEmpty) Left("endpoint has no cache")
          else cacheManager.toRight("no cache manager configured").map { cm =>
            val dropped = c.retention.keepLastSnapshots
              .map(k => cm.table(c).expireSnapshots(k)).getOrElse(Nil)
            obj("dropped_snapshots" -> dropped.size)
          }
        }
      case "graft_get_monitors" =>
        // read-only like the /mcp/monitors route; reachable from the
        // MCP surface where an AI operator cannot GET arbitrary paths
        monitors.toRight("no monitors configured").map(_.toJson)
      case other => Left(s"unknown config tool '$other'")
    } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
  }
}
