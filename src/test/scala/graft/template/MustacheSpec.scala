package graft.template

import org.scalatest.funsuite.AnyFunSuite

class MustacheSpec extends AnyFunSuite {
  private def ctx(params: (String, String)*): TemplateContext =
    TemplateContext.forRequest(params.toMap)

  test("plain text passes through") {
    assert(Mustache.render("SELECT 1", ctx()) == "SELECT 1")
  }

  test("double-brace variable substitutes with HTML escape") {
    assert(Mustache.render("v={{params.x}}", ctx("x" -> "a<b&'c'")) ==
      "v=a&lt;b&amp;&#39;c&#39;")
  }

  test("triple-brace variable substitutes raw") {
    assert(Mustache.render("v={{{params.x}}}", ctx("x" -> "a<b&'c'")) == "v=a<b&'c'")
  }

  test("inner whitespace in tags is trimmed") {
    assert(Mustache.render("{{ params.x }}/{{{  params.x  }}}", ctx("x" -> "7")) == "7/7")
  }

  test("missing variable renders empty") {
    assert(Mustache.render("[{{params.nope}}]", ctx()) == "[]")
  }

  test("section renders when param present, skipped when absent") {
    val t = "WHERE 1=1{{#params.id}} AND id={{{params.id}}}{{/params.id}}"
    assert(Mustache.render(t, ctx("id" -> "5")) == "WHERE 1=1 AND id=5")
    assert(Mustache.render(t, ctx()) == "WHERE 1=1")
  }

  test("inverted section renders only when absent") {
    val t = "{{^params.id}}DEFAULT{{/params.id}}{{#params.id}}{{{params.id}}}{{/params.id}}"
    assert(Mustache.render(t, ctx()) == "DEFAULT")
    assert(Mustache.render(t, ctx("id" -> "9")) == "9")
  }

  test("nested sections") {
    val t = "{{#params.a}}A{{#params.b}}B{{/params.b}}{{/params.a}}"
    assert(Mustache.render(t, ctx("a" -> "1", "b" -> "2")) == "AB")
    assert(Mustache.render(t, ctx("a" -> "1")) == "A")
    assert(Mustache.render(t, ctx("b" -> "2")) == "")
  }

  test("namespaces: conn, env, cache, auth routed from params") {
    val c = TemplateContext.forRequest(
      Map("x" -> "1", "cacheTable" -> "tbl", "__auth_username" -> "alice"),
      connProps = Map("path" -> "/data"),
      envAllow = _ == "ALLOWED",
      env = Map("ALLOWED" -> "yes", "SECRET" -> "no"))
    assert(Mustache.render("{{conn.path}}", c) == "/data")
    assert(Mustache.render("{{cache.table}}", c) == "tbl")
    assert(Mustache.render("{{auth.username}}", c) == "alice")
    assert(Mustache.render("{{env.ALLOWED}}", c) == "yes")
    assert(Mustache.render("{{env.SECRET}}", c) == "") // not whitelisted
    // cache/auth params do not leak into the params namespace
    assert(Mustache.render("[{{params.cacheTable}}][{{params.__auth_username}}]", c) == "[][]")
  }

  test("unterminated tag is plain text") {
    assert(Mustache.render("a {{params.x", ctx("x" -> "1")) == "a {{params.x")
  }

  test("mismatched section close raises ParseError") {
    intercept[Mustache.ParseError] {
      Mustache.render("{{#params.a}}x{{/params.b}}", ctx("a" -> "1"))
    }
    intercept[Mustache.ParseError] {
      Mustache.render("{{#params.a}}x", ctx("a" -> "1"))
    }
  }

  test("empty-string param is present (truthy section, rendered empty)") {
    val t = "[{{#params.x}}Y{{/params.x}}{{^params.x}}N{{/params.x}}]={{params.x}}!"
    assert(Mustache.render(t, ctx("x" -> "")) == "[Y]=!")
  }

  test("customers.sql-shaped template renders both sections") {
    val t =
      """WHERE 1=1
        |{{#params.id}}
        |  AND c_custkey = {{{ params.id }}}
        |{{/params.id}}
        |{{#params.segment}}
        |  AND c_mktsegment LIKE '%{{{ params.segment }}}%'
        |{{/params.segment}}""".stripMargin
    val out = Mustache.render(t, ctx("id" -> "42", "segment" -> "BUILDING"))
    assert(out.contains("AND c_custkey = 42"))
    assert(out.contains("AND c_mktsegment LIKE '%BUILDING%'"))
    val none = Mustache.render(t, ctx())
    assert(!none.contains("AND"))
  }

  test("handlebars #if/#unless blocks (reference cache-template dialect)") {
    val t = "A{{#if params.x}}[{{params.x}}]{{/if}}{{#unless params.x}}[none]{{/unless}}Z"
    assert(Mustache.render(t, ctx("x" -> "7")) == "A[7]Z")
    assert(Mustache.render(t, ctx()) == "A[none]Z")
    // plain sections with spaces in no keyword position stay strict
    intercept[Mustache.ParseError](
      Mustache.render("{{#params.a}}x{{/params.b}}", ctx()))
  }
}
