package graft.cli

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The offline authoring CLI: validate, expand-template, bundle — all
  * in-process, no server, no SparkSession. */
class CliSpec extends AnyFunSuite {

  private def run(args: String*): (Int, String, String) = {
    val o = new ByteArrayOutputStream()
    val e = new ByteArrayOutputStream()
    val code = Cli.run(args.toIndexedSeq,
      new PrintStream(o, true, "UTF-8"), new PrintStream(e, true, "UTF-8"))
    (code, o.toString("UTF-8"), e.toString("UTF-8"))
  }

  private def writeEndpoint(dir: java.nio.file.Path): Unit = {
    Files.writeString(dir.resolve("customers.yaml"),
      """url-path: /cli-customers
        |template-source: customers.sql
        |request:
        |  - field-name: segment
        |    validators:
        |      - type: string
        |        min: 1
        |        max: 20
        |""".stripMargin)
    // top-level {{params.segment}} binds as '?' (section-scoped params
    // stay on the text path by design — a falsy section would shift
    // every later bind position)
    Files.writeString(dir.resolve("customers.sql"),
      "SELECT * FROM customers WHERE c_mktsegment = {{params.segment}} ORDER BY c_custkey")
  }

  test("validate passes a good config dir and fails a broken one, by exit code") {
    val dir = Files.createTempDirectory("cli_good")
    writeEndpoint(dir)
    val (code, outTxt, _) = run("validate", dir.toString)
    assert(code == 0, outTxt)
    assert(outTxt.contains("OK") && outTxt.contains("1 ok, 0 failed"))

    Files.writeString(dir.resolve("broken.yaml"),
      """url-path: no-leading-slash
        |template-source: missing.sql
        |""".stripMargin)
    val (code2, out2, _) = run("validate", dir.toString)
    assert(code2 == 1)
    assert(out2.contains("FAIL") && out2.contains("url-path"))
    assert(out2.contains("template-source not found"))
  }

  test("expand-template prints the final SQL with bound params as placeholders") {
    val dir = Files.createTempDirectory("cli_expand")
    writeEndpoint(dir)
    val (code, outTxt, _) =
      run("expand-template", dir.resolve("customers.yaml").toString, "segment=BUILDING")
    assert(code == 0, outTxt)
    // the bindable param must appear as '?', never spliced as text
    assert(outTxt.contains("WHERE c_mktsegment = ?"), outTxt)
    assert(!outTxt.linesIterator.next().contains("BUILDING"))
    assert(outTxt.contains("bind[1] = BUILDING"))
    // absent param still binds positionally (as SQL NULL), never shifts
    val (code2, out2, _) =
      run("expand-template", dir.resolve("customers.yaml").toString)
    assert(code2 == 0 && out2.contains("= ?") && out2.contains("bind[1] = null"), out2)
  }

  test("expand-template surfaces validation failures with a nonzero exit") {
    val dir = Files.createTempDirectory("cli_expand_bad")
    writeEndpoint(dir)
    val (code, _, errTxt) = run("expand-template",
      dir.resolve("customers.yaml").toString,
      "segment=" + "X" * 50) // exceeds max:20
    assert(code == 1 && errTxt.contains("segment"), errTxt)
  }

  test("bundle pack refuses secrets, packs clean trees, and unpacks round-trip") {
    val dir = Files.createTempDirectory("cli_bundle")
    writeEndpoint(dir)
    Files.writeString(dir.resolve("prod.env"), "TOKEN=hunter2")
    val out = Files.createTempDirectory("cli_bundle_out")
    val (codeSecret, _, errTxt) =
      run("bundle", "pack", dir.toString, out.resolve("b.zip").toString)
    assert(codeSecret == 1 && errTxt.contains("secret"), errTxt)

    Files.delete(dir.resolve("prod.env"))
    val (codePack, outTxt, _) =
      run("bundle", "pack", dir.toString, out.resolve("b.zip").toString, "--epoch", "0")
    assert(codePack == 0 && outTxt.contains("packed 2 entries"), outTxt)

    val dest = Files.createTempDirectory("cli_bundle_unpack")
    val (codeUn, _, _) =
      run("bundle", "unpack", out.resolve("b.zip").toString, dest.toString)
    assert(codeUn == 0)
    assert(Files.readString(dest.resolve("customers.sql")).contains("c_mktsegment"))
  }

  test("validate passes the reference's real example configs") {
    val (code, outTxt, _) = run("validate", "/root/reference/examples/sqls")
    assert(code == 0, outTxt)
    assert(outTxt.contains("0 failed"), outTxt)
  }

  test("init scaffolds a validating project tree and refuses to clobber") {
    val dir = Files.createTempDirectory("cli_init")
    val (code, outTxt, _) = run("init", dir.toString, "--name", "demo")
    assert(code == 0, outTxt)
    assert(Files.readString(dir.resolve("flapi.yaml")).contains("project-name: demo"))
    assert(Files.exists(dir.resolve("sqls/customers.sql")))
    assert(outTxt.contains("1 ok, 0 failed"), outTxt) // generated config validates
    // second init must not silently overwrite
    val (code2, _, err2) = run("init", dir.toString)
    assert(code2 == 1 && err2.contains("--force"), err2)
    assert(run("init", dir.toString, "--force")._1 == 0)
  }

  test("remote template-sources validate structurally instead of failing offline") {
    val dir = Files.createTempDirectory("cli_remote")
    Files.writeString(dir.resolve("remote.yaml"),
      """url-path: /remote
        |template-source: s3a://bucket/templates/r.sql
        |""".stripMargin)
    val (code, outTxt, _) = run("validate", dir.toString)
    assert(code == 0, outTxt) // a working production config must not FAIL here
    // but expanding needs the template text — directed error, not a crash
    val (code2, _, err2) =
      run("expand-template", dir.resolve("remote.yaml").toString)
    assert(code2 == 1 && err2.contains("remote template-source"), err2)
  }

  test("bundle pack flag errors are directed (bad/missing --epoch values)") {
    val dir = Files.createTempDirectory("cli_flags")
    writeEndpoint(dir)
    val out = Files.createTempDirectory("cli_flags_out").resolve("b.zip").toString
    val (c1, _, e1) = run("bundle", "pack", dir.toString, out, "--epoch", "soon")
    assert(c1 == 2 && e1.contains("--epoch requires a number"), e1)
    val (c2, _, e2) = run("bundle", "pack", dir.toString, out, "--epoch")
    assert(c2 == 2 && e2.contains("--epoch requires a value"), e2)
    val (c3, _, e3) = run("bundle", "pack", dir.toString, out, "--frob")
    assert(c3 == 2 && e3.contains("unknown flag"), e3)
    // a leading-zero epoch is a number, not an unknown flag
    assert(run("bundle", "pack", dir.toString, out, "--epoch", "0123")._1 == 0)
  }

  test("serve --validate-config honors the 12-factor tiers without a SparkSession") {
    val root = Files.createTempDirectory("cli_serve")
    val sqls = Files.createDirectory(root.resolve("sqls"))
    writeEndpoint(sqls)
    Files.writeString(root.resolve("flapi.yaml"),
      "project-name: cli-env\ntemplate:\n  path: './sqls'\nhttp-port: 7123\n")
    def serveV(env: Map[String, String], extra: String*): (Int, String, String) = {
      val o = new ByteArrayOutputStream(); val e = new ByteArrayOutputStream()
      val code = Cli.serve(
        List("--validate-config") ++ extra.toList,
        new PrintStream(o, true, "UTF-8"), new PrintStream(e, true, "UTF-8"),
        env = env.get)
      (code, o.toString("UTF-8"), e.toString("UTF-8"))
    }
    // GRAFT_CONFIG locates the project when no -c flag is given
    val (c1, o1, _) = serveV(Map("GRAFT_CONFIG" -> root.resolve("flapi.yaml").toString))
    assert(c1 == 0, o1)
    assert(o1.contains("config OK") && o1.contains("port=7123"), o1)
    // -c wins over a deliberately broken GRAFT_CONFIG target
    val (c2, o2, _) = serveV(
      Map("GRAFT_CONFIG" -> "/no/such/file.yaml"),
      "-c", root.resolve("flapi.yaml").toString)
    assert(c2 == 0 && o2.contains("config OK"), o2)
    // GRAFT_PORT overrides the config port; --port overrides both
    val (_, o3, _) = serveV(Map(
      "GRAFT_CONFIG" -> root.resolve("flapi.yaml").toString,
      "GRAFT_PORT" -> "7456"))
    assert(o3.contains("port=7456"), o3)
    val (_, o4, _) = serveV(Map(
      "GRAFT_CONFIG" -> root.resolve("flapi.yaml").toString,
      "GRAFT_PORT" -> "7456"), "--port", "7789")
    assert(o4.contains("port=7789"), o4)
    // invalid env values are directed single-line errors (exit 1 via
    // the runLocal catch when called through run())
    val (cBad, _, eBad) = run("serve", "--validate-config",
      "--port", "99999", "-c", root.resolve("flapi.yaml").toString)
    assert(cBad == 1 && eBad.contains("invalid --port"), eBad)
    // a broken enforce-https block fails validation with the directed
    // text (run() routes through runLocal's catch → exit 1)
    Files.writeString(root.resolve("bad.yaml"),
      "project-name: x\ntemplate:\n  path: './sqls'\nenforce-https:\n  enabled: true\n")
    val (cTls, _, eTls) = run("serve", "--validate-config",
      "-c", root.resolve("bad.yaml").toString)
    assert(cTls == 1 && eTls.contains("ssl-cert-file"), eTls)
  }

  test("unknown commands print usage and exit 2") {
    val (code, _, errTxt) = run("frobnicate")
    assert(code == 2 && errTxt.contains("usage:"))
  }
}
