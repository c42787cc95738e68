package graft.validate

import org.scalatest.funsuite.AnyFunSuite
import graft.config.{RequestFieldConfig, ValidatorConfig}

class RequestValidatorSpec extends AnyFunSuite {
  import RequestValidator._

  private def field(name: String, v: ValidatorConfig, required: Boolean = false) =
    RequestFieldConfig(fieldName = name, required = required, validators = Seq(v))

  test("required field missing") {
    val f = field("id", ValidatorConfig(tpe = "int"), required = true)
    assert(validate(Seq(f), Map.empty).exists(_.message.contains("Required")))
    assert(validate(Seq(f), Map("id" -> "1")).isEmpty)
  }

  test("optional field missing is fine") {
    val f = field("id", ValidatorConfig(tpe = "int"))
    assert(validate(Seq(f), Map.empty).isEmpty)
  }

  test("string min/max/regex") {
    val v = ValidatorConfig(tpe = "string", min = 2, max = 4, regex = "[a-z]+")
    assert(validateString("f", "ab", v).isEmpty)
    assert(validateString("f", "a", v).exists(_.message.contains("shorter")))
    assert(validateString("f", "abcde", v).exists(_.message.contains("longer")))
    assert(validateString("f", "AB", v).exists(_.message.contains("Invalid string format")))
  }

  test("int strict full-consume + bounds") {
    val v = ValidatorConfig(tpe = "int", min = 1, max = 100)
    assert(validateInt("f", "50", v).isEmpty)
    assert(validateInt("f", "0", v).nonEmpty)
    assert(validateInt("f", "101", v).nonEmpty)
    assert(validateInt("f", "1; DROP TABLE t", v).exists(_.message.contains("Invalid integer")))
    assert(validateInt("f", "1 OR 1=1", v).nonEmpty)
    assert(validateInt("f", "", v).nonEmpty)
  }

  test("email") {
    assert(validateEmail("f", "alice@example.com").isEmpty)
    Seq("not-an-email", "", "<script>@x.com", "alice@example.com' OR '1'='1")
      .foreach(b => assert(validateEmail("f", b).nonEmpty, b))
  }

  test("uuid") {
    assert(validateUuid("f", "11111111-1111-1111-1111-111111111111").isEmpty)
    Seq("not-a-uuid", "", "11111111-1111-1111-1111-11111111111Z",
      "11111111-1111-1111-1111-111111111111' OR '1'='1")
      .foreach(b => assert(validateUuid("f", b).nonEmpty, b))
  }

  test("date strict + min/max window") {
    val v = ValidatorConfig(tpe = "date", minDate = "2024-01-01", maxDate = "2024-12-31")
    assert(validateDate("f", "2024-03-15", v).isEmpty)
    assert(validateDate("f", "2023-12-31", v).exists(_.message.contains("before")))
    assert(validateDate("f", "2025-01-01", v).exists(_.message.contains("after")))
    Seq("2024-13-99", "9999-99-99", "abc", "", "2024/03/15", "15-03-2024",
      "2024-03-15' OR '1'='1").foreach { b =>
      assert(validateDate("f", b, v).exists(_.message.contains("Invalid date")), b)
    }
  }

  test("time strict + min/max window") {
    val v = ValidatorConfig(tpe = "time", minTime = "09:00:00", maxTime = "17:00:00")
    assert(validateTime("f", "13:45:07", v).isEmpty)
    assert(validateTime("f", "08:59:59", v).exists(_.message.contains("before")))
    assert(validateTime("f", "17:00:01", v).exists(_.message.contains("after")))
    Seq("24:00:00", "12:00:60", "abc", "", "12:00", "12-00-00").foreach { b =>
      assert(validateTime("f", b, v).exists(_.message.contains("Invalid time")), b)
    }
  }

  test("enum exact-match, case-sensitive") {
    val v = ValidatorConfig(tpe = "enum", allowedValues = Seq("active", "inactive", "pending"))
    assert(validateEnum("f", "active", v).isEmpty)
    Seq("ACTIVE", "deleted", "", "active OR pending", "active' OR '1'='1")
      .foreach(b => assert(validateEnum("f", b, v).nonEmpty, b))
  }

  test("unknown-param rejection allows offset/limit and __auth_*") {
    val fields = Seq(field("id", ValidatorConfig(tpe = "int")))
    val errs = validateUnknownParams(fields,
      Map("id" -> "1", "offset" -> "0", "limit" -> "10",
        "__auth_username" -> "alice", "evil" -> "x"))
    assert(errs.map(_.field) == Seq("evil"))
  }

  test("injection heuristic bypassed for numeric-bindable fields") {
    // int-typed field: the typed bind is the hard defense; heuristic demoted
    val f = field("id", ValidatorConfig(tpe = "int"))
    val errs = validate(Seq(f), Map("id" -> "1 UNION SELECT"))
    // still fails the int parse, but no injection error
    assert(errs.nonEmpty && !errs.exists(_.message.contains("injection")))
  }

  test("injection heuristic active for string fields, opt-out honored") {
    val on = field("q", ValidatorConfig(tpe = "string"))
    assert(validate(Seq(on), Map("q" -> "x' OR '1'='1"))
      .exists(_.message.contains("injection")))
    val off = field("q", ValidatorConfig(tpe = "string", preventSqlInjection = false))
    assert(validate(Seq(off), Map("q" -> "x' OR '1'='1")).isEmpty)
  }
}

/** Data-driven run of the reference's SQL-injection corpus
  * (test/integration/test_sql_injection_corpus.py): every payload must be
  * rejected by its validator (the "4xx" path) OR convert to a harmless
  * typed literal (the bind path) — never survive as SQL text. */
class InjectionCorpusSpec extends AnyFunSuite {
  import graft.template.{ParamClassifier, SqlParamType, ValueConverter}

  private def fld(name: String, v: ValidatorConfig) =
    RequestFieldConfig(fieldName = name, required = true, validators = Seq(v))

  /** A payload is "defused" when validation rejects it, or when it
    * converts into a typed non-string literal (can't carry SQL), or —
    * for varchar — when it binds as a pure literal string (prepared
    * path: always true by construction). */
  private def defused(f: RequestFieldConfig, payload: String): Boolean = {
    val vErrs = RequestValidator.validate(Seq(f), Map(f.fieldName -> payload))
    if (vErrs.nonEmpty) return true
    ParamClassifier.classify(f) match {
      case Some(SqlParamType.VarcharT) => true // binds as literal string
      case Some(t) =>
        ValueConverter.convert(t, Some(payload)) match {
          case ValueConverter.Err(_) => true // bind-layer rejection
          case ValueConverter.Ok(_) => true // typed primitive: no SQL text
        }
      case None => false // would be string-spliced: NOT defused
    }
  }

  private val numeric = Seq(
    "1 OR 1=1", "1; DROP TABLE t", "1 UNION SELECT 1, 'evil'", "1/**/OR/**/1=1",
    "1' OR '1'='1", "'1' OR '1'='1'--", "0xdeadbeef", "abc", "", "   ",
    "1 AND SLEEP(5)", "1) UNION SELECT NULL--", " ;", "/*comment*/1")

  test("int corpus: every payload defused, legit value still binds") {
    val f = fld("id", ValidatorConfig(tpe = "int", min = 1, max = 100000,
      preventSqlInjection = false))
    numeric.foreach(p => assert(defused(f, p), s"leak: $p"))
    assert(RequestValidator.validate(Seq(f), Map("id" -> "2")).isEmpty)
    assert(ValueConverter.convert(SqlParamType.IntegerT, Some("2")) ==
      ValueConverter.Ok(Some(2L)))
  }

  test("double corpus") {
    val f = fld("x", ValidatorConfig(tpe = "number", preventSqlInjection = false))
    Seq("1.5 OR 1=1", "1.5; DROP TABLE t", "1.5' OR '1'='1",
      "1.5 UNION SELECT 1.0", "abc", "", "1.5/*", "  1.5 garbage")
      .foreach(p => assert(defused(f, p), s"leak: $p"))
  }

  test("boolean corpus") {
    val f = fld("flag", ValidatorConfig(tpe = "boolean", preventSqlInjection = false))
    Seq("true OR 1=1", "true; DROP TABLE", "yes", "TRUE; DROP TABLE",
      "1 OR 1=1", "false' --", "2", "")
      .foreach(p => assert(defused(f, p), s"leak: $p"))
  }

  test("date corpus") {
    val f = fld("d", ValidatorConfig(tpe = "date", preventSqlInjection = false))
    Seq("2024-03-15' OR '1'='1", "2024-03-15; DROP TABLE t", "2024-13-99",
      "9999-99-99", "abc", "2024/03/15", "15-03-2024", "2024-03-15 UNION")
      .foreach(p => assert(defused(f, p), s"leak: $p"))
  }

  test("time corpus") {
    val f = fld("t", ValidatorConfig(tpe = "time", preventSqlInjection = false))
    Seq("12:00:00' OR '1'='1", "12:00:00; DROP TABLE", "24:00:00", "12:00:60",
      "abc", "12:00", "12-00-00")
      .foreach(p => assert(defused(f, p), s"leak: $p"))
  }

  test("uuid corpus") {
    val f = fld("u", ValidatorConfig(tpe = "uuid", preventSqlInjection = false))
    Seq("11111111-1111-1111-1111-111111111111' OR '1'='1",
      "11111111-1111-1111-1111-111111111111; DROP TABLE", "abc' OR 1=1",
      "not-a-uuid", "", "' UNION SELECT password--",
      "11111111-1111-1111-1111-11111111111Z")
      .foreach(p => assert(
        RequestValidator.validate(Seq(f), Map("u" -> p)).nonEmpty, s"leak: $p"))
  }

  test("enum corpus") {
    val f = fld("status", ValidatorConfig(tpe = "enum",
      allowedValues = Seq("active", "inactive", "pending"),
      preventSqlInjection = false))
    Seq("active' OR '1'='1", "active; DROP TABLE", "ACTIVE", "deleted", "",
      "active OR pending", "' UNION SELECT 'x'--")
      .foreach(p => assert(
        RequestValidator.validate(Seq(f), Map("status" -> p)).nonEmpty, s"leak: $p"))
  }

  test("email corpus") {
    val f = fld("e", ValidatorConfig(tpe = "email", preventSqlInjection = false))
    Seq("not-an-email", "", "'; DROP TABLE t; --@x.com", "<script>@x.com")
      .foreach(p => assert(
        RequestValidator.validate(Seq(f), Map("e" -> p)).nonEmpty, s"leak: $p"))
  }

  test("string corpus: prepared bind is the defense (all bindable varchar)") {
    val f = fld("name", ValidatorConfig(tpe = "string", min = 1, max = 200,
      preventSqlInjection = false))
    val payloads = Seq(
      "alice' OR '1'='1", "alice'; DROP TABLE t--",
      "alice' UNION SELECT 1,'evil'--", "'; DROP TABLE t; --", "alice'--",
      "alice'/*", "%' OR 1=1 --", "alice' OR ''='", "\\' OR 1=1",
      "\";DROP TABLE t;", "'" * 50, "ALICE", "alice\\",
      "carol' UNION SELECT password FROM users--",
      "x' OR 'a'='a' OR 'x'='", "Robert');DROP TABLE Students;--",
      "1' OR id<>0--", "alice' OR length(name)>0--")
    payloads.foreach { p =>
      // validator passes (loose string), classifier says Varchar-bindable:
      // the value reaches Spark as a bound literal, never as SQL text.
      assert(ParamClassifier.classify(f).contains(SqlParamType.VarcharT))
      assert(defused(f, p), s"leak: $p")
    }
  }
}
