package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Response shaping, route translation, param assembly (O3/T8/T10). */
class FrontendSpec extends AnyFunSuite {

  // ---- ResponseShaper ----

  test("no-op shape passes payload through") {
    val p = """[{"a":1}]"""
    assert(ResponseShaper.shape(p, ResponseShape()) == p)
  }

  test("max-rows caps the array") {
    val p = """[{"a":1},{"a":2},{"a":3}]"""
    assert(ResponseShaper.shape(p, ResponseShape(maxRows = Some(2))) ==
      """[{"a":1},{"a":2}]""")
  }

  test("redaction replaces values with the sentinel") {
    val p = """[{"id":1,"secret":"x"},{"id":2,"secret":"y"}]"""
    assert(ResponseShaper.shape(p, ResponseShape(redactColumns = Set("secret"))) ==
      """[{"id":1,"secret":"<redacted>"},{"id":2,"secret":"<redacted>"}]""")
  }

  test("sample mode returns summary not data") {
    val p = """[{"id":1,"v":"a"},{"id":2,"v":"b"}]"""
    assert(ResponseShaper.shape(p, ResponseShape(sample = true)) ==
      """{"sampled":true,"row_count":2,"columns":["id","v"]}""")
  }

  test("non-array payloads pass through unchanged") {
    val p = """{"not":"an array"}"""
    assert(ResponseShaper.shape(p, ResponseShape(maxRows = Some(1))) == p)
    assert(ResponseShaper.shape("not json", ResponseShape(sample = true)) == "not json")
  }

  // ---- RouteTranslator ----

  test("route translation builds capture groups") {
    val (pattern, names) = RouteTranslator.translate("/users/:id/orders/:oid")
    assert(pattern == "^/users/([^/]+)/orders/([^/]+)$")
    assert(names == Seq("id", "oid"))
  }

  test("match extracts path params") {
    assert(RouteTranslator.matchAndExtract("/users/:id", "/users/42")
      .contains(Map("id" -> "42")))
    assert(RouteTranslator.matchAndExtract("/users/:id", "/users/42/extra").isEmpty)
    assert(RouteTranslator.matchAndExtract("/plain", "/plain").contains(Map.empty))
  }

  // ---- ParamAssembly ----

  test("read precedence: defaults < path < field-defaults < query") {
    val out = ParamAssembly.combineRead(
      defaults = Map("a" -> "d", "b" -> "d"),
      pathParams = Map("a" -> "p"),
      fieldDefaults = Map("a" -> "f", "c" -> "f"),
      queryParams = Map("a" -> "q"))
    // path overrode default; field-default only fills absent c; query wins
    assert(out == Map("a" -> "q", "b" -> "d", "c" -> "f"))
  }

  test("write precedence: body wins over query; nested re-serialized; null empty") {
    val body = """{"name":"x","n":7,"ok":true,"gone":null,
                  "obj":{"k":1},"arr":[1,"two"]}"""
    val out = ParamAssembly.combineWrite(
      defaults = Map.empty,
      pathParams = Map("id" -> "9"),
      jsonBody = Some(body),
      fieldDefaults = Map("name" -> "default-name", "extra" -> "fd"),
      queryParams = Map("name" -> "query-name", "qonly" -> "qv"))
    assert(out("id") == "9")
    assert(out("name") == "x")       // body beats query for writes
    assert(out("n") == "7")
    assert(out("ok") == "true")
    assert(out("gone") == "")
    assert(out("obj") == """{"k":1}""")
    assert(out("arr") == """[1,"two"]""")
    assert(out("extra") == "fd")
    assert(out("qonly") == "qv")     // query only fills absent keys
  }

  test("malformed body falls back to other sources") {
    val out = ParamAssembly.combineWrite(
      Map.empty, Map.empty, Some("{oops"), Map.empty, Map("q" -> "1"))
    assert(out == Map("q" -> "1"))
  }
}
