package graft.cli

import java.io.PrintStream
import java.nio.file.{Files, Path, Paths}

import graft.api.TemplatePipeline
import graft.config.{ConfigBundle, EndpointConfig, YamlConfig}

/** Offline command-line surface over the config machinery — the
  * capability analog of the reference's TypeScript CLI
  * (/root/reference/cli/src/commands/{config/validate.ts,templates,
  * project}): validate endpoint configs, expand a template to its
  * final engine SQL, pack/unpack config bundles. The offline
  * subcommands bind the config machinery in-process and need no
  * server and no SparkSession — local-developer authoring tools that
  * work air-gapped. `--server URL` switches to remote mode: an HTTP
  * client for a RUNNING GraftServer's config service, the same role
  * the reference CLI plays (ping/health/endpoints/schema/validate/
  * cache refresh — cli/src/index.ts:6-14).
  *
  * Subcommands:
  *  - `validate <file|dir>`: structural checks + a dry render with
  *    defaults (the ConfigApi.validate semantics, standalone);
  *  - `expand-template <file> [k=v ...]`: run the full prepare
  *    pipeline (validate → prepared-rewrite → Mustache → dialect) and
  *    print the final Spark SQL with its ordered bind values;
  *  - `bundle pack <dir> <out> [--allow-secrets] [--epoch N]` /
  *    `bundle unpack <bundle> <destDir>`: the ConfigBundle surface.
  */
object Cli {

  def main(args: Array[String]): Unit =
    sys.exit(run(args.toIndexedSeq, System.out, System.err))

  private val usage =
    """usage: graft-cli <command>
      |  init [dir] [--name N] [--no-examples] [--force]
      |  validate <endpoint.yaml | config-dir>
      |  expand-template <endpoint.yaml> [param=value ...]
      |  bundle pack <config-dir> <out.zip> [--allow-secrets] [--epoch N]
      |  bundle unpack <bundle.zip> <dest-dir>
      |  serve [-c project.yaml] [--port N] [--host H] [--log-level L]
      |        [--warehouse DIR] [--validate-config]
      |    12-factor precedence: flags > GRAFT_CONFIG/GRAFT_PORT/
      |    GRAFT_HOST/GRAFT_LOG_LEVEL env > config file > defaults;
      |    --validate-config parses + validates and exits (no Spark)
      |
      |remote mode (client for a running graft server, mirroring the
      |reference CLI's server commands):
      |  --server URL [--token T] [--timeout SECS] <remote-command>
      |    ping                        GET    _config/project
      |    health                      GET    _config/health
      |    audit                       GET    _config/audit
      |    endpoints list              GET    _config/endpoints
      |    endpoints get <slug>        GET    _config/endpoints/<slug>
      |    endpoints create <file>     POST   _config/endpoints (file = endpoint YAML/JSON)
      |    endpoints delete <slug>     DELETE _config/endpoints/<slug>
      |    schema                      GET    _config/schema
      |    validate <slug>             POST   _config/endpoints/<slug>/validate
      |    expand <slug> [k=v ...]     POST   _config/endpoints/<slug>/template/expand
      |    test <slug> [k=v ...]       POST   _config/endpoints/<slug>/template/test
      |    cache refresh <slug>        POST   _config/endpoints/<slug>/cache/refresh
      |    log-level <level>           PUT    _config/log-level
      |    monitors                    GET    /mcp/monitors (drift verdicts)
      |    metrics                     GET    /mcp/metrics (arrow + scan budget)""".stripMargin

  /** Testable entry: returns the process exit code. */
  def run(args: Seq[String], out: PrintStream, err: PrintStream): Int =
    try {
      val (remote, rest) = parseRemoteFlags(args.toList)
      remote match {
        case Some(r) => runRemote(r, rest, out, err)
        case None => runLocal(rest, out, err)
      }
    } catch {
      case e: Exception =>
        err.println(s"error: ${String.valueOf(e.getMessage)}")
        1
    }

  private def runLocal(args: List[String], out: PrintStream, err: PrintStream): Int =
    try args match {
      case "init" :: rest =>
        init(rest, out, err)
      case "validate" :: path :: Nil =>
        validate(Paths.get(path), out, err)
      case "expand-template" :: path :: params =>
        expand(Paths.get(path), params, out, err)
      case "bundle" :: "pack" :: dir :: dest :: flags =>
        pack(dir, dest, flags, out, err)
      case "bundle" :: "unpack" :: bundle :: dest :: Nil =>
        val root = ConfigBundle.unpackTo(Paths.get(bundle), Paths.get(dest))
        out.println(s"unpacked to $root")
        0
      case "serve" :: rest =>
        serve(rest, out, err)
      case _ =>
        err.println(usage)
        2
    } catch {
      case e: Exception =>
        err.println(s"error: ${String.valueOf(e.getMessage)}")
        1
    }

  // ---- remote mode (HTTP client for a running GraftServer) --------------

  /** The reference CLI is an HTTP client for the server's config
    * service (/root/reference/cli/src/index.ts — ping/health/
    * endpoints/schema/cache commands over axios); `--server` puts this
    * CLI in the same role against GraftServer's /api/v1/_config
    * surface using the JDK HttpClient. Exit code is 0 for 2xx, 1
    * otherwise; the response body (JSON) prints verbatim to stdout so
    * output composes with jq the way the reference's does. */
  private final case class RemoteConfig(
      base: String, token: Option[String], timeoutSec: Long)

  /** Extract --server/--token/--timeout wherever they appear; the
    * remainder is the (sub)command. */
  private def parseRemoteFlags(args: List[String]): (Option[RemoteConfig], List[String]) = {
    var server: Option[String] = None
    var token: Option[String] = None
    var timeout = 30L
    val rest = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--server" if i + 1 < args.length => server = Some(args(i + 1)); i += 2
        case "--token" if i + 1 < args.length => token = Some(args(i + 1)); i += 2
        case "--timeout" if i + 1 < args.length =>
          timeout = args(i + 1).toLong; i += 2
        case a => rest += a; i += 1
      }
    }
    (server.map(s => RemoteConfig(s.stripSuffix("/"), token, timeout)), rest.toList)
  }

  private def request(r: RemoteConfig, method: String, path: String,
      body: Option[String] = None,
      contentType: String = "application/json"): (Int, String) = {
    val b = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(r.base + path))
      .timeout(java.time.Duration.ofSeconds(r.timeoutSec))
    r.token.foreach(t => b.header("Authorization", s"Bearer $t"))
    // an explicit Content-Type on every body-bearing request:
    // GraftServer itself doesn't validate it, but proxies and stricter
    // dispatchers in front of a server commonly reject untyped bodies
    body.foreach(_ => b.header("Content-Type", contentType))
    // bodyless POST matters: the server's validate route treats a
    // non-empty body as an endpoint definition to validate INSTEAD of
    // the served one; the CLI's slug form targets the served endpoint
    val pub = body.fold(java.net.http.HttpRequest.BodyPublishers.noBody())(
      java.net.http.HttpRequest.BodyPublishers.ofString(_))
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, pub)
    }).build()
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(r.timeoutSec)).build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** Render `k=v` args as the {"parameters": {...}} body the template
    * expand/test routes take. */
  private def paramsBody(kvs: List[String]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val p = root.putObject("parameters")
    kvs.foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => p.put(k, v)
        case _ => throw new IllegalArgumentException(s"expected key=value, got '$kv'")
      }
    }
    mapper.writeValueAsString(root)
  }

  private def runRemote(r: RemoteConfig, args: List[String],
      out: PrintStream, err: PrintStream): Int = {
    val cfgBase = "/api/v1/_config"
    val call: Option[(String, String, Option[String])] = args match {
      case List("ping") => Some(("GET", s"$cfgBase/project", None))
      case List("health") => Some(("GET", s"$cfgBase/health", None))
      case List("audit") => Some(("GET", s"$cfgBase/audit", None))
      // drift-monitor standing verdicts + serving metrics — read-only
      // surfaces an operator polls without the config token
      case List("monitors") => Some(("GET", "/mcp/monitors", None))
      case List("metrics") => Some(("GET", "/mcp/metrics", None))
      case List("endpoints", "list") => Some(("GET", s"$cfgBase/endpoints", None))
      case List("endpoints", "get", slug) =>
        Some(("GET", s"$cfgBase/endpoints/${enc(slug)}", None))
      case List("endpoints", "create", file) =>
        Some(("POST", s"$cfgBase/endpoints",
          Some(Files.readString(Paths.get(file)))))
      // (create's body is YAML or JSON by file content — typed below)
      case List("endpoints", "delete", slug) =>
        Some(("DELETE", s"$cfgBase/endpoints/${enc(slug)}", None))
      case List("schema") => Some(("GET", s"$cfgBase/schema", None))
      case List("validate", slug) =>
        Some(("POST", s"$cfgBase/endpoints/${enc(slug)}/validate", None))
      case "expand" :: slug :: kvs =>
        Some(("POST", s"$cfgBase/endpoints/${enc(slug)}/template/expand",
          Some(paramsBody(kvs))))
      case "test" :: slug :: kvs =>
        Some(("POST", s"$cfgBase/endpoints/${enc(slug)}/template/test",
          Some(paramsBody(kvs))))
      case List("cache", "refresh", slug) =>
        Some(("POST", s"$cfgBase/endpoints/${enc(slug)}/cache/refresh", None))
      case List("log-level", level) =>
        // Jackson, not interpolation: a level containing a quote must
        // arrive escaped, not as malformed JSON the server coerces to ''
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val n = mapper.createObjectNode(); n.put("level", level)
        Some(("PUT", s"$cfgBase/log-level", Some(mapper.writeValueAsString(n))))
      case _ => None
    }
    call match {
      case None =>
        err.println(usage)
        2
      case Some((method, path, body)) =>
        // every JSON body above is Jackson-built; the one pass-through
        // body (endpoint create) is YAML or JSON by file content
        val ctype = body match {
          case Some(s) if path.endsWith("/endpoints") && method == "POST" =>
            if (s.dropWhile(_.isWhitespace).headOption.contains('{'))
              "application/json"
            else "application/yaml"
          case _ => "application/json"
        }
        val (code, bodyText) = request(r, method, path, body, ctype)
        if (code >= 200 && code < 300) { out.println(bodyText); 0 }
        else { err.println(s"HTTP $code: $bodyText"); 1 }
    }
  }

  // ---- serve ---------------------------------------------------------------

  /** Boot (or just validate) a project the way the reference binary
    * does (`flapi -c config.yaml [--port N] ...`), honoring the
    * 12-factor env tier: GRAFT_CONFIG/GRAFT_PORT/GRAFT_HOST/
    * GRAFT_LOG_LEVEL with CLI > env > config > default precedence and
    * directed errors for invalid values (reference
    * test_env_overrides.py:1-13). `--validate-config` parses the
    * project (including the enforce-https block) and validates every
    * endpoint WITHOUT a SparkSession, then exits — the reference's
    * `--validate-config` contract (test_https_config.py). */
  private[cli] def serve(args: List[String], out: PrintStream, err: PrintStream,
      env: String => Option[String] = k => sys.env.get(k),
      // test seam: run everything except the Spark boot + HTTP bind
      validateOnlyDefault: Boolean = false): Int = {
    var config: Option[String] = None
    var port: Option[Int] = None
    var host: Option[String] = None
    var logLevel: Option[String] = None
    var warehouse: Option[String] = None
    var validateOnly = validateOnlyDefault
    var rest = args
    while (rest.nonEmpty) rest match {
      case ("-c" | "--config") :: v :: t => config = Some(v); rest = t
      case "--port" :: v :: t =>
        port = Some(graft.server.GraftBootstrap.parsePort(v, "--port")); rest = t
      case "--host" :: v :: t => host = Some(v); rest = t
      case "--log-level" :: v :: t => logLevel = Some(v); rest = t
      case "--warehouse" :: v :: t => warehouse = Some(v); rest = t
      case "--validate-config" :: t => validateOnly = true; rest = t
      case f :: _ => err.println(s"unknown serve flag: $f"); return 2
    }
    val boot = graft.server.GraftBootstrap.resolveBootOptions(
      cliConfig = config, cliPort = port, cliHost = host,
      cliLogLevel = logLevel, env = env)
    val projectPath = Paths.get(boot.configPath)
    if (!Files.isRegularFile(projectPath)) {
      err.println(s"no such config: $projectPath"); return 1
    }
    // parse the project FIRST so config-tier values join the precedence
    // walk and enforce-https structural errors surface before any boot
    val project = graft.server.GraftBootstrap
      .parseProject(Files.readString(projectPath))
    val resolved = graft.server.GraftBootstrap.resolveBootOptions(
      cliConfig = config, cliPort = port, cliHost = host,
      cliLogLevel = logLevel, env = env, project = Some(project))
    if (validateOnly) {
      // file-level TLS validation (paths resolved against the project
      // dir, like loadProject)
      val base = Option(projectPath.toAbsolutePath.getParent).getOrElse(Paths.get("."))
      graft.server.TlsSupport.validate(project.https.map { h =>
        def res(p: String) = if (p.isEmpty) p else base.resolve(p).normalize().toString
        h.copy(certFile = res(h.certFile), keyFile = res(h.keyFile))
      })
      val templateDir = base.resolve(project.templatePath).normalize()
      val rc =
        if (Files.isDirectory(templateDir)) validate(templateDir, out, err)
        else { out.println(s"note: template dir $templateDir absent — structural checks only"); 0 }
      if (rc == 0) out.println(s"config OK: $projectPath " +
        s"(port=${resolved.port}, host=${resolved.host})")
      rc
    } else {
      val spark = graft.GraftSession.build(s"graft-serve-${project.projectName}")
      val server = graft.server.GraftBootstrap.serve(
        spark, projectPath.toString, port = resolved.port,
        cacheWarehouse = warehouse, host = resolved.host)
      out.println(s"serving ${project.projectName} on " +
        s"${resolved.host}:${server.boundPort}" +
        (if (project.https.exists(_.enabled)) " (https)" else ""))
      // block until killed — the reference binary's foreground behavior
      new java.util.concurrent.CountDownLatch(1).await()
      0
    }
  }

  // ---- init --------------------------------------------------------------

  /** Scaffold a project tree GraftBootstrap.serve can boot (the
    * reference CLI's `project init`, cli/src/commands/project/init.ts):
    * flapi.yaml + sqls/ with a working example endpoint, then validate
    * the generated configs. Refuses to clobber without --force. */
  private def init(args: List[String], out: PrintStream, err: PrintStream): Int = {
    val dirArg = args.headOption.filterNot(_.startsWith("--")).getOrElse(".")
    val flags = args.drop(args.headOption.count(!_.startsWith("--")))
    val force = flags.contains("--force")
    val noExamples = flags.contains("--no-examples")
    val root = Paths.get(dirArg)
    val name = flags.sliding(2).collectFirst { case List("--name", n) => n }
      .getOrElse(root.toAbsolutePath.normalize().getFileName.toString)
    Files.createDirectories(root.resolve("sqls"))
    val files = scala.collection.mutable.LinkedHashMap(
      "flapi.yaml" ->
        s"""project-name: $name
           |template:
           |  path: './sqls'
           |connections:
           |  main-data:
           |    properties:
           |      path: '/path/to/your/data.parquet'
           |""".stripMargin,
      ".gitignore" -> "*.log\nspark-warehouse/\n")
    if (!noExamples) {
      // the example deliberately uses the TOP-LEVEL double-brace form:
      // PreparedRewriter binds those as prepared parameters, so the
      // user value never splices into SQL text. A triple-brace (or a
      // tag buried in a conditional section) would be raw splice
      // guarded only by the injection heuristic — never teach that
      // pattern in generated code.
      files += "sqls/customers.yaml" ->
        """url-path: /customers
          |template-source: customers.sql
          |with-pagination: "false"
          |request:
          |  - field-name: segment
          |    required: true
          |    validators:
          |      - type: string
          |""".stripMargin
      files += "sqls/customers.sql" ->
        """SELECT * FROM read_parquet('{{conn.path}}')
          |WHERE segment = {{params.segment}}
          |LIMIT 100""".stripMargin
    }
    val clobbered = files.keys.filter(rel => Files.exists(root.resolve(rel)))
    if (clobbered.nonEmpty && !force) {
      err.println(s"refusing to overwrite: ${clobbered.mkString(", ")} (use --force)")
      return 1
    }
    files.foreach { case (rel, content) =>
      Files.writeString(root.resolve(rel), content)
      out.println(s"created $rel")
    }
    if (noExamples) 0 else validate(root.resolve("sqls"), out, err)
  }

  // ---- validate ----------------------------------------------------------

  private def endpointFiles(path: Path): Seq[Path] =
    if (Files.isDirectory(path)) {
      import scala.jdk.CollectionConverters._
      val stream = Files.walk(path) // walk holds directory handles — close it
      try stream.iterator().asScala.filter(Files.isRegularFile(_))
        .filter(p => p.toString.endsWith(".yaml") || p.toString.endsWith(".yml"))
        .filter { p =>
          val txt = Files.readString(p)
          txt.contains("url-path") || txt.contains("mcp-tool") ||
            txt.contains("mcp-resource") || txt.contains("mcp-prompt")
        }
        .toSeq.sortBy(_.toString)
      finally stream.close()
    } else Seq(path)

  private def inlineTemplate(p: Path): Option[String] =
    try {
      val m = new org.yaml.snakeyaml.Yaml().load[Any](Files.readString(p))
        .asInstanceOf[java.util.Map[String, Any]]
      Option(m.get("template")).map(String.valueOf).filter(_.trim.nonEmpty)
    } catch { case _: Exception => None }

  /** Right(Some(sql)) = resolvable locally; Right(None) = a REMOTE
    * template-source (https/s3a/hdfs…) — a first-class server feature
    * this offline tool cannot fetch, so callers validate structure
    * only instead of failing a working production config. */
  private def templateOf(p: Path, cfg: EndpointConfig): Either[String, Option[String]] =
    inlineTemplate(p) match {
      case Some(t) => Right(Some(t))
      case None if cfg.templateSource.trim.isEmpty =>
        Left("missing 'template' (SQL text) or 'template-source'")
      case None if graft.template.TemplateSource.isRemote(cfg.templateSource) =>
        Right(None)
      case None =>
        val base = Option(p.toAbsolutePath.getParent).map(_.toString)
        val resolved = Paths.get(
          graft.template.TemplateSource.resolve(cfg.templateSource, base))
        if (Files.isRegularFile(resolved)) Right(Some(Files.readString(resolved)))
        else Left(s"template-source not found: $resolved")
    }

  /** The config service's validation, standalone: the SHARED
    * EndpointValidator rule set (structure + dry prepare), plus
    * CLI-side template resolution. */
  private[cli] def endpointErrors(p: Path): Seq[String] =
    try {
      val cfg = YamlConfig.loadEndpoint(p)
      val structural = graft.api.EndpointValidator.structuralErrors(cfg)
      // prompt-only configs carry a prose template inside the
      // mcp-prompt block (reference customers-mcp-prompt.yaml) — no SQL
      // template to resolve or dry-render
      if (cfg.mcpPrompt.isDefined && cfg.templateSource.trim.isEmpty &&
          inlineTemplate(p).isEmpty) return structural
      templateOf(p, cfg) match {
        case Left(e) => structural :+ e
        case Right(None) => structural // remote source: structure only
        case Right(Some(template)) =>
          if (structural.nonEmpty) structural
          else graft.api.EndpointValidator.errors(cfg, template)
      }
    } catch { case e: Exception => Seq(s"parse error: ${String.valueOf(e.getMessage)}") }

  private def validate(path: Path, out: PrintStream, err: PrintStream): Int = {
    if (!Files.exists(path)) { err.println(s"no such path: $path"); return 1 }
    val files = endpointFiles(path)
    if (files.isEmpty) { err.println(s"no endpoint configs under $path"); return 1 }
    var failures = 0
    files.foreach { f =>
      endpointErrors(f) match {
        case Seq() => out.println(s"OK    ${f.getFileName}")
        case errors =>
          failures += 1
          out.println(s"FAIL  ${f.getFileName}")
          errors.foreach(e => out.println(s"      - $e"))
      }
    }
    out.println(s"${files.size - failures} ok, $failures failed")
    if (failures == 0) 0 else 1
  }

  // ---- expand-template ---------------------------------------------------

  private def expand(p: Path, paramArgs: List[String],
      out: PrintStream, err: PrintStream): Int = {
    val split = paramArgs.map(kv => kv -> kv.split("=", 2))
    split.collectFirst { case (raw, parts) if parts.length != 2 => raw } match {
      case Some(bad) => err.println(s"bad param (want k=v): $bad"); return 2
      case None => ()
    }
    val params = split.map { case (_, Array(k, v)) => k -> v }.toMap
    val cfg = YamlConfig.loadEndpoint(p)
    templateOf(p, cfg) match {
      case Left(e) => err.println(e); 1
      case Right(None) =>
        err.println("remote template-source: fetching requires a running " +
          "session — use the server's template/expand API")
        1
      case Right(Some(template)) =>
        TemplatePipeline.prepare(cfg, template, params) match {
          case Left(errors) =>
            errors.foreach(e => err.println(s"${e.field}: ${e.message}"))
            1
          case Right((sql, binds)) =>
            out.println(sql)
            binds.zipWithIndex.foreach { case (v, i) =>
              out.println(s"-- bind[${i + 1}] = ${String.valueOf(v)}")
            }
            0
        }
    }
  }

  // ---- bundle ------------------------------------------------------------

  private def pack(dir: String, dest: String, flags: List[String],
      out: PrintStream, err: PrintStream): Int = {
    var allowSecrets = false
    var epoch: Option[Long] = None
    var rest = flags
    while (rest.nonEmpty) rest match {
      case "--allow-secrets" :: t => allowSecrets = true; rest = t
      case "--epoch" :: v :: t =>
        v.toLongOption match {
          case Some(n) => epoch = Some(n); rest = t
          case None => err.println(s"--epoch requires a number, got '$v'"); return 2
        }
      case "--epoch" :: Nil =>
        err.println("--epoch requires a value"); return 2
      case f :: _ =>
        err.println(s"unknown flag: $f"); return 2
    }
    val r = ConfigBundle.pack(Paths.get(dir), Paths.get(dest),
      allowSecrets = allowSecrets, sourceDateEpoch = epoch)
    out.println(s"packed ${r.entryCount} entries, ${r.archiveSize} bytes -> ${r.output}")
    0
  }
}
