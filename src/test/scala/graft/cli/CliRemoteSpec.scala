package graft.cli

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.ResponseShape
import graft.cache.CacheManager
import graft.config.{CacheConfig, EndpointConfig}
import graft.server.{ConfigServiceConfig, GraftServer, ServedEndpoint}

/** The CLI's remote mode end-to-end: boot a real GraftServer (config
  * service + cache manager wired) and drive every `--server`
  * subcommand against it — the coverage the reference holds for its
  * TypeScript client (cli/src/commands/{ping,health,endpoints,schema,
  * cache}). */
class CliRemoteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var server: GraftServer = _
  private var base: String = _
  private val token = "cli-secret"

  private val cachedEndpoint = ServedEndpoint(
    EndpointConfig(
      urlPath = "/cli-cached",
      templateSource = "cli_cached.sql",
      requestFieldsValidation = false,
      cache = CacheConfig(enabled = true, table = "cli_cache")),
    "SELECT id, name FROM cli_src ORDER BY id",
    shape = ResponseShape())

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("cli-remote-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ss = spark
    import ss.implicits._
    Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
      .createOrReplaceTempView("cli_src")
    val mgr = new CacheManager(spark,
      Files.createTempDirectory("graft_cli_remote").toString)
    server = new GraftServer(spark, Seq(cachedEndpoint),
      configService = Some(ConfigServiceConfig(token = Some(token))),
      cacheManager = Some(mgr)).start()
    base = s"http://127.0.0.1:${server.boundPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    if (spark != null) spark.stop()
  }

  private def cli(args: String*): (Int, String, String) = {
    val o = new ByteArrayOutputStream()
    val e = new ByteArrayOutputStream()
    val code = Cli.run(args.toIndexedSeq,
      new PrintStream(o, true, "UTF-8"), new PrintStream(e, true, "UTF-8"))
    (code, o.toString("UTF-8"), e.toString("UTF-8"))
  }

  private def remote(args: String*): (Int, String, String) =
    cli(Seq("--server", base, "--token", token) ++ args: _*)

  test("ping reports the running project") {
    val (code, out, _) = remote("ping")
    assert(code == 0, out)
    assert(out.contains("\"graft\"") && out.contains("\"endpoints\":1"))
  }

  test("health reports overall status") {
    val (code, out, _) = remote("health")
    assert(code == 0, out)
    assert(out.contains("\"status\":\"healthy\""))
  }

  test("endpoints list and get surface the served endpoint") {
    val (code, out, _) = remote("endpoints", "list")
    assert(code == 0, out)
    assert(out.contains("cli-cached"))
    val (code2, out2, _) = remote("endpoints", "get", "cli-cached")
    assert(code2 == 0, out2)
    assert(out2.contains("/cli-cached"))
  }

  test("schema lists live catalog tables with columns") {
    val (code, out, _) = remote("schema")
    assert(code == 0, out)
    assert(out.contains("cli_src") && out.contains("\"name\":\"id\""))
  }

  test("validate runs the server-side rule set") {
    val (code, out, _) = remote("validate", "cli-cached")
    assert(code == 0, out)
    assert(out.contains("\"valid\":true"))
  }

  test("cache refresh materializes a snapshot through the wired manager") {
    val (code, out, _) = remote("cache", "refresh", "cli-cached")
    assert(code == 0, out)
    assert(out.contains("\"refreshed\":true") && out.contains("\"snapshot_id\":1"))
    // the snapshot is really there: a second refresh advances the id
    val (_, out2, _) = remote("cache", "refresh", "cli-cached")
    assert(out2.contains("\"snapshot_id\":2"))
  }

  test("endpoints create installs from a local file, delete removes") {
    val f = Files.createTempFile("cli_create", ".yaml")
    Files.writeString(f,
      """url-path: /cli-created
        |template: SELECT id, name FROM cli_src WHERE id = {{params.id}}
        |request:
        |  - field-name: id
        |    required: true
        |    validators:
        |      - type: int
        |""".stripMargin)
    val (code, out, _) = remote("endpoints", "create", f.toString)
    assert(code == 0, out)
    assert(out.contains("/cli-created"))
    val (_, listed, _) = remote("endpoints", "list")
    assert(listed.contains("cli-created"))
    val (code2, out2, _) = remote("endpoints", "delete", "cli-created")
    assert(code2 == 0 && out2.contains("\"deleted\":true"), out2)
    val (_, listed2, _) = remote("endpoints", "list")
    assert(!listed2.contains("cli-created"))
  }

  test("expand renders the final engine SQL; test runs a capped peek") {
    val (code, out, _) = remote("expand", "cli-cached")
    assert(code == 0, out)
    assert(out.contains("\"sql\"") && out.toLowerCase.contains("select"))
    val (code2, out2, _) = remote("test", "cli-cached")
    assert(code2 == 0, out2)
    assert(out2.contains("\"row_count\":2") && out2.contains("alice"))
  }

  test("audit and log-level round-trip") {
    val (code, out, _) = remote("audit")
    assert(code == 0 && out.contains("warning_count"), out)
    val (code2, out2, _) = remote("log-level", "WARN")
    assert(code2 == 0, out2)
  }

  test("metrics and monitors read the operator surfaces") {
    // metrics is always served (arrow counters + scan-budget gauge)
    val (code, out, _) = remote("metrics")
    assert(code == 0, out)
    assert(out.contains("\"arrow\"") && out.contains("\"scan_budget\""))
    // this server has no monitors block: the route does not exist and
    // the CLI reports the HTTP failure instead of fabricating a result
    val (mc, _, me) = remote("monitors")
    assert(mc == 1 && me.contains("HTTP 404"), me)
    // a monitor-bearing server serves the registry (placeholder row
    // for a monitor that has not committed a batch yet)
    val src = Files.createTempDirectory("cli_mon_src")
    val mm = new graft.server.MonitorManager(spark, Seq(
      graft.server.MonitorConfig("m1", "cusum",
        src.toString, Files.createTempDirectory("cli_mon_ck").toString)))
    val srv2 = new GraftServer(spark, Seq(cachedEndpoint),
      monitors = Some(mm)).start()
    try {
      val (c2, o2, _) = cli("--server",
        s"http://127.0.0.1:${srv2.boundPort}", "monitors")
      assert(c2 == 0, o2)
      assert(o2.contains("\"name\":\"m1\"") && o2.contains("\"batch_id\":-1"))
    } finally srv2.stop()
  }

  test("auth failures and unknown commands are directed, not silent") {
    val (code, _, errTxt) =
      cli("--server", base, "--token", "wrong", "ping")
    assert(code == 1 && errTxt.contains("401"), errTxt)
    val (code2, _, err2) = remote("frobnicate")
    assert(code2 == 2 && err2.contains("usage"), err2)
  }

  test("body-bearing requests carry an explicit Content-Type (ADVICE r7)") {
    // GraftServer doesn't validate the header, but proxies in front of
    // one do — capture what the CLI actually sends with a raw listener
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val probe = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    probe.createContext("/", { ex =>
      seen.add((ex.getRequestURI.getPath,
        Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")))
      ex.getRequestBody.readAllBytes()
      val resp = "{}".getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    probe.start()
    try {
      val pbase = s"http://127.0.0.1:${probe.getAddress.getPort}"
      cli("--server", pbase, "log-level", "WARN")
      cli("--server", pbase, "expand", "cli-cached", "id=1")
      val yaml = Files.createTempFile("cli_ct", ".yaml")
      Files.writeString(yaml, "url-path: /x\ntemplate: SELECT 1\n")
      cli("--server", pbase, "endpoints", "create", yaml.toString)
      val json = Files.createTempFile("cli_ct", ".json")
      Files.writeString(json, "{\"url-path\": \"/x\"}")
      cli("--server", pbase, "endpoints", "create", json.toString)
      val got = seen.toArray(Array.empty[(String, String)]).toSeq
      assert(got.contains(("/api/v1/_config/log-level", "application/json")), got)
      assert(got.contains(
        ("/api/v1/_config/endpoints/cli-cached/template/expand",
          "application/json")), got)
      // create is pass-through: typed by sniffing the file content
      assert(got.contains(("/api/v1/_config/endpoints", "application/yaml")), got)
      assert(got.contains(("/api/v1/_config/endpoints", "application/json")), got)
    } finally probe.stop(0)
  }
}
