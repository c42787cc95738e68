package graft.config

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** YAML endpoint loading: env substitution (allowlist), include
  * composition (section + conditional), model binding, discovery. */
class YamlConfigSpec extends AnyFunSuite {

  test("env substitution honors allowlist and leaves denied verbatim") {
    val env = Map("DB_HOST" -> "h1", "SECRET" -> "s")
    val in = "host: {{env.DB_HOST}}\nsecret: {{env.SECRET}}"
    val out = YamlConfig.substituteEnv(in, _ == "DB_HOST", env)
    assert(out == "host: h1\nsecret: {{env.SECRET}}")
  }

  test("condition evaluation") {
    val env = Map("ON" -> "1", "EMPTY" -> "")
    assert(YamlConfig.evalCondition("true", env))
    assert(!YamlConfig.evalCondition("false", env))
    assert(YamlConfig.evalCondition("env.ON", env))
    assert(!YamlConfig.evalCondition("env.EMPTY", env))
    assert(!YamlConfig.evalCondition("env.MISSING", env))
    assert(YamlConfig.evalCondition("!env.MISSING", env))
  }

  test("endpoint parses full shape") {
    val ep = YamlConfig.parseEndpoint(
      """url-path: /customers/:id
        |method: GET
        |template-source: customers.sql
        |connection: [main]
        |request-fields-validation: true
        |request:
        |  - field-name: id
        |    field-in: path
        |    required: true
        |    validators:
        |      - type: int
        |        min: 1
        |        max: 100
        |  - field-name: segment
        |    default: BUILDING
        |    validators:
        |      - type: enum
        |        allowed-values: [BUILDING, MACHINERY]
        |cache:
        |  table: customers_cache
        |  schedule: 5m
        |  primary-keys: [id]
        |  cursor:
        |    column: updated_at
        |    type: timestamp
        |  retention:
        |    keep-last-snapshots: 3
        |""".stripMargin)
    assert(ep.urlPath == "/customers/:id")
    assert(ep.requestFieldsValidation)
    assert(ep.requestFields.map(_.fieldName) == Seq("id", "segment"))
    assert(ep.requestFields.head.validators.head.min == 1)
    assert(ep.requestFields(1).defaultValue.contains("BUILDING"))
    assert(ep.requestFields(1).validators.head.allowedValues == Seq("BUILDING", "MACHINERY"))
    assert(ep.cache.table == "customers_cache")
    assert(ep.cache.cursor.map(_.column).contains("updated_at"))
    assert(ep.cache.primaryKeys == Seq("id"))
    assert(ep.cache.retention.keepLastSnapshots.contains(3))
    // cursor + PK → merge mode downstream
  }

  test("includes compose sections with indentation and conditions") {
    // reference usage shape (customers-rest.yaml:11): a top-level
    // section include re-emits under its own section key
    val dir = Files.createTempDirectory("graft_yaml")
    Files.write(dir.resolve("common.yaml"),
      """request:
        |  - field-name: id
        |    validators:
        |      - type: int
        |extras:
        |  unused: true
        |""".stripMargin.getBytes("UTF-8"))
    Files.write(dir.resolve("ep.yaml"),
      """url-path: /x
        |{{include:request from common.yaml}}
        |description-skipped: {{include:extras from common.yaml if env.MISSING_FLAG}}
        |""".stripMargin.getBytes("UTF-8"))
    val ep = YamlConfig.loadEndpoint(dir.resolve("ep.yaml"), env = Map.empty)
    assert(ep.requestFields.map(_.fieldName) == Seq("id"))
  }

  test("endpoint discovery finds url-path yamls only") {
    val dir = Files.createTempDirectory("graft_disc")
    Files.write(dir.resolve("a.yaml"), "url-path: /a\n".getBytes("UTF-8"))
    Files.write(dir.resolve("b.yaml"), "url-path: /b\nmethod: POST\n".getBytes("UTF-8"))
    Files.write(dir.resolve("notes.yaml"), "just: notes\n".getBytes("UTF-8"))
    val eps = YamlConfig.discoverEndpoints(dir.toString)
    assert(eps.map(_.urlPath) == Seq("/a", "/b"))
    assert(eps(1).isWrite)
  }
}
