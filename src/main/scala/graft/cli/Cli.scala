package graft.cli

import java.io.PrintStream
import java.nio.file.{Files, Path, Paths}

import graft.api.TemplatePipeline
import graft.config.{ConfigBundle, EndpointConfig, YamlConfig}

/** Offline command-line surface over the config machinery — the
  * capability analog of the reference's TypeScript CLI
  * (/root/reference/cli/src/commands/{config/validate.ts,templates,
  * project}): validate endpoint configs, expand a template to its
  * final engine SQL, pack/unpack config bundles. The reference CLI is
  * an HTTP client for a running ConfigService; graft is a library, so
  * the CLI binds the same machinery in-process (the REST/MCP config
  * surface already covers the remote case) and needs no server and no
  * SparkSession — every subcommand is a local-developer authoring
  * tool that works air-gapped.
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
      |  bundle unpack <bundle.zip> <dest-dir>""".stripMargin

  /** Testable entry: returns the process exit code. */
  def run(args: Seq[String], out: PrintStream, err: PrintStream): Int =
    try args.toList match {
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
      case _ =>
        err.println(usage)
        2
    } catch {
      case e: Exception =>
        err.println(s"error: ${String.valueOf(e.getMessage)}")
        1
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
