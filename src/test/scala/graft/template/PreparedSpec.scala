package graft.template

import org.scalatest.funsuite.AnyFunSuite
import graft.config.{RequestFieldConfig, ValidatorConfig}

/** Mirrors the reference's prepared_template_rewriter_test.cpp /
  * sql_parameter_classifier_test.cpp / prepared_value_converter_test.cpp
  * Catch2 suites (same cases, Scala idiom). */
class PreparedSpec extends AnyFunSuite {

  private def typed(name: String, t: String) =
    RequestFieldConfig(fieldName = name, validators = Seq(ValidatorConfig(tpe = t)))
  private def bare(name: String) = RequestFieldConfig(fieldName = name)

  // ---- rewriter ----------------------------------------------------------

  test("empty template yields empty result with no bindings") {
    val r = PreparedRewriter.rewrite("", Nil)
    assert(r.sql.isEmpty && r.bindings.isEmpty)
  }

  test("template with no params is left alone") {
    val r = PreparedRewriter.rewrite("SELECT 1", Nil)
    assert(r.sql == "SELECT 1" && r.bindings.isEmpty)
  }

  test("simple {{ params.X }} with int field is rewritten to ?") {
    val r = PreparedRewriter.rewrite(
      "SELECT * FROM t WHERE id = {{ params.id }}", Seq(typed("id", "int")))
    assert(r.sql == "SELECT * FROM t WHERE id = ?")
    assert(r.bindings == Vector(BindingSpec("id", SqlParamType.IntegerT, 0)))
  }

  test("triple-brace {{{ params.X }}} is never rewritten") {
    val in = "SELECT '{{{ params.name }}}'"
    val r = PreparedRewriter.rewrite(in, Seq(typed("name", "string")))
    assert(r.sql == in && r.bindings.isEmpty)
  }

  test("param with no validator stays on the Mustache path") {
    val in = "SELECT * FROM t WHERE id = {{ params.id }}"
    val r = PreparedRewriter.rewrite(in, Seq(bare("id")))
    assert(r.sql == in && r.bindings.isEmpty)
  }

  test("param missing from request fields is left alone") {
    val in = "SELECT {{ params.mystery }}"
    val r = PreparedRewriter.rewrite(in, Seq(typed("known", "int")))
    assert(r.sql == in && r.bindings.isEmpty)
  }

  test("param inside a section is left alone (position safety)") {
    val in = "SELECT * FROM t WHERE 1=1 " +
      "{{#params.id}}AND id = {{ params.id }}{{/params.id}}"
    val r = PreparedRewriter.rewrite(in, Seq(typed("id", "int")))
    assert(r.sql == in && r.bindings.isEmpty)
  }

  test("multiple bindable params are positionally ordered") {
    val r = PreparedRewriter.rewrite(
      "WHERE a = {{ params.a }} AND b = {{ params.b }} AND a2 = {{ params.a }}",
      Seq(typed("a", "int"), typed("b", "date")))
    assert(r.sql == "WHERE a = ? AND b = ? AND a2 = ?")
    assert(r.bindings.map(_.fieldName) == Vector("a", "b", "a"))
    assert(r.bindings.map(_.position) == Vector(0, 1, 2))
    assert(r.bindings.map(_.tpe) == Vector(
      SqlParamType.IntegerT, SqlParamType.DateT, SqlParamType.IntegerT))
  }

  test("non-params namespaces (conn/env/cache) are never rewritten") {
    val in = "SELECT * FROM {{conn.path}} WHERE x = {{ params.x }}"
    val r = PreparedRewriter.rewrite(in, Seq(typed("x", "int")))
    assert(r.sql == "SELECT * FROM {{conn.path}} WHERE x = ?")
  }

  // ---- classifier --------------------------------------------------------

  test("classifier maps validator types per the reference table") {
    import SqlParamType._
    val cases = Seq(
      "int" -> IntegerT, "integer" -> IntegerT,
      "number" -> DoubleT, "float" -> DoubleT, "double" -> DoubleT,
      "boolean" -> BooleanT, "bool" -> BooleanT,
      "date" -> DateT, "time" -> TimeT,
      "uuid" -> VarcharT, "string" -> VarcharT, "email" -> VarcharT,
      "enum" -> VarcharT)
    cases.foreach { case (name, expect) =>
      assert(ParamClassifier.classify(typed("f", name)).contains(expect), name)
    }
    // case-sensitive on purpose; unknown type is unbindable
    assert(ParamClassifier.classify(typed("f", "INT")).isEmpty)
    assert(ParamClassifier.classify(typed("f", "custom")).isEmpty)
    assert(ParamClassifier.classify(bare("f")).isEmpty)
  }

  test("classifier: first recognized validator wins") {
    val f = RequestFieldConfig(fieldName = "f", validators =
      Seq(ValidatorConfig(tpe = "unknown"), ValidatorConfig(tpe = "date"),
        ValidatorConfig(tpe = "int")))
    assert(ParamClassifier.classify(f).contains(SqlParamType.DateT))
  }

  // ---- converter ---------------------------------------------------------

  import ValueConverter._

  test("absent param binds NULL for every type") {
    SqlParamType.values.foreach { t =>
      assert(convert(t, None) == Ok(None), t)
    }
  }

  test("integer: strict full-consume parse") {
    assert(convert(SqlParamType.IntegerT, Some("42")) == Ok(Some(42L)))
    assert(convert(SqlParamType.IntegerT, Some("-7")) == Ok(Some(-7L)))
    assert(convert(SqlParamType.IntegerT, Some("42  ")) == Ok(Some(42L))) // trailing ws ok
    Seq("1; DROP TABLE t", "1 OR 1=1", "abc", "", "1.5", "0xdeadbeef",
      "99999999999999999999999").foreach { bad =>
      assert(convert(SqlParamType.IntegerT, Some(bad)) == Err(intErr), bad)
    }
  }

  test("double: strict parse") {
    assert(convert(SqlParamType.DoubleT, Some("1.5")) == Ok(Some(1.5d)))
    assert(convert(SqlParamType.DoubleT, Some("-2e3")) == Ok(Some(-2000.0d)))
    Seq("1.5 OR 1=1", "abc", "", "1.5/*", "  1.5 garbage").foreach { bad =>
      assert(convert(SqlParamType.DoubleT, Some(bad)) == Err(dblErr), bad)
    }
  }

  test("boolean: true/false/1/0 case-insensitive") {
    assert(convert(SqlParamType.BooleanT, Some("true")) == Ok(Some(true)))
    assert(convert(SqlParamType.BooleanT, Some("FALSE")) == Ok(Some(false)))
    assert(convert(SqlParamType.BooleanT, Some("1")) == Ok(Some(true)))
    assert(convert(SqlParamType.BooleanT, Some("0")) == Ok(Some(false)))
    Seq("yes", "2", "", "true OR 1=1").foreach { bad =>
      assert(convert(SqlParamType.BooleanT, Some(bad)) == Err(boolErr), bad)
    }
  }

  test("date: YYYY-MM-DD with real calendar check; empty -> NULL") {
    assert(convert(SqlParamType.DateT, Some("2024-03-15")) ==
      Ok(Some(java.time.LocalDate.of(2024, 3, 15))))
    assert(convert(SqlParamType.DateT, Some("2024-02-29")) ==
      Ok(Some(java.time.LocalDate.of(2024, 2, 29)))) // leap year
    assert(convert(SqlParamType.DateT, Some("")) == Ok(None))
    Seq("2023-02-29", "2024-13-01", "2024-00-10", "2024/03/15", "15-03-2024",
      "2024-3-15", "2024-03-15' OR '1'='1", "2024-03-15 UNION").foreach { bad =>
      assert(convert(SqlParamType.DateT, Some(bad)) == Err(dateErr), bad)
    }
  }

  test("time: HH:MM:SS[.ffffff]; empty -> NULL") {
    assert(convert(SqlParamType.TimeT, Some("13:45:07")) ==
      Ok(Some(java.time.LocalTime.of(13, 45, 7))))
    assert(convert(SqlParamType.TimeT, Some("13:45:07.25")) ==
      Ok(Some(java.time.LocalTime.of(13, 45, 7, 250000000))))
    assert(convert(SqlParamType.TimeT, Some("")) == Ok(None))
    Seq("24:00:00", "12:00:60", "12:00", "12-00-00", "abc",
      "12:00:00' OR '1'='1", "12:00:00.1234567").foreach { bad =>
      assert(convert(SqlParamType.TimeT, Some(bad)) == Err(timeErr), bad)
    }
  }

  test("varchar passes any string through unchanged") {
    val evil = "alice'; DROP TABLE t--"
    assert(convert(SqlParamType.VarcharT, Some(evil)) == Ok(Some(evil)))
  }
}
