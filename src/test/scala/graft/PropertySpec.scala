package graft

import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.scalatest.funsuite.AnyFunSuite

import graft.serialize.CsvWire
import graft.template._
import graft.write.SqlSplitter

/** Property-based coverage of the pure string/value layers (the
  * reference backs these with hand-enumerated Catch2 cases; generators
  * sweep the space instead). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // ---- ValueConverter ---------------------------------------------------

  test("every long round-trips through the int converter") {
    check("int-roundtrip", forAll { (n: Long) =>
      ValueConverter.convert(SqlParamType.IntegerT, Some(n.toString)) ==
        ValueConverter.Ok(Some(n))
    })
  }

  test("garbage suffixes never parse as ints") {
    check("int-junk", forAll(Gen.long, Gen.alphaStr.suchThat(_.nonEmpty)) { (n, junk) =>
      ValueConverter.convert(SqlParamType.IntegerT, Some(s"$n $junk"))
        .isInstanceOf[ValueConverter.Err]
    })
  }

  test("finite doubles round-trip") {
    check("double-roundtrip", forAll { (d: Double) =>
      (!d.isNaN && !d.isInfinite) ==> {
        ValueConverter.convert(SqlParamType.DoubleT, Some(d.toString)) ==
          ValueConverter.Ok(Some(d))
      }
    })
  }

  test("valid calendar dates parse; impossible ones do not") {
    val dates = for {
      y <- Gen.chooseNum(1, 9999); m <- Gen.chooseNum(1, 12); d <- Gen.chooseNum(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d"
    check("date-valid", forAll(dates) { s =>
      ValueConverter.convert(SqlParamType.DateT, Some(s))
        .isInstanceOf[ValueConverter.Ok]
    })
    assert(ValueConverter.convert(SqlParamType.DateT, Some("2024-02-30"))
      .isInstanceOf[ValueConverter.Err])
  }

  // ---- SqlSplitter ------------------------------------------------------

  private val plainStmt: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '=', '(', ')', ',')))
      .map(_.mkString.trim).suchThat(_.nonEmpty)

  test("splitting statements joined by ';' recovers them") {
    check("split-join", forAll(Gen.nonEmptyListOf(plainStmt)) { stmts =>
      SqlSplitter.split(stmts.mkString(";")) == stmts.toVector
    })
  }

  test("semicolons inside single-quoted strings never split") {
    check("split-quoted", forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val sql = s"SELECT '$a;$b' AS s"
      SqlSplitter.split(sql) == Vector(sql)
    })
  }

  test("placeholder count ignores quoted question marks") {
    check("placeholders", forAll(Gen.chooseNum(0, 5), Gen.chooseNum(0, 5)) { (real, quoted) =>
      val sql = "SELECT " +
        (Seq.fill(real)("?") ++ Seq.fill(quoted)("'?'")).mkString(", ")
      SqlSplitter.countPlaceholders(sql) == real
    })
  }

  // ---- Mustache ---------------------------------------------------------

  private val tagFree: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\n', '(', ')', '<', '>')))
      .map(_.mkString).suchThat(s => !s.contains("{{") && !s.contains("}}"))

  test("templates without tags render as identity") {
    check("mustache-identity", forAll(tagFree) { s =>
      Mustache.render(s, TemplateContext.empty) == s
    })
  }

  test("section bodies render iff the param is present") {
    check("mustache-sections",
      forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty), Gen.alphaNumStr) { (k, v) =>
        val t = s"A{{#params.$k}}[{{params.$k}}]{{/params.$k}}B"
        val withIt = TemplateContext.forRequest(Map(k -> v))
        val without = TemplateContext.forRequest(Map.empty)
        Mustache.render(t, withIt) == s"A[${Mustache.htmlEscape(v)}]B" &&
          Mustache.render(t, without) == "AB"
      })
  }

  // ---- CSV escape -------------------------------------------------------

  test("dialect translation is idempotent over every gated oracle text") {
    // translate() must be a FIXPOINT on its own output: a second pass
    // over already-translated SQL rewrites nothing. If a rule fired
    // twice (double-escaping a separator, re-hoisting a WITHIN GROUP,
    // re-wrapping a QUALIFY subquery) the product would corrupt SQL
    // that happens to flow through the translator more than once
    // (template expand → cache refresh re-render is exactly that
    // path). The corpus is every oracle text in the suite — the
    // broadest stock of realistic DuckDB-dialect SQL we have.
    var checked = 0
    graft.SparkEntry.oracleSql.foreach { case (name, sql) =>
      val once =
        try graft.dialect.DuckDialect.translate(sql)
        catch { case _: IllegalArgumentException => null } // directed errors are fine
      if (once != null) {
        val twice = graft.dialect.DuckDialect.translate(once)
        assert(twice == once, s"$name: translate is not idempotent")
        checked += 1
      }
    }
    assert(checked > 150, s"only $checked oracle texts checked")
  }

  test("escapeCSV output never breaks a CSV row structure") {
    check("csv-escape", forAll { (s: String) =>
      val cell = CsvWire.escapeCSV(s)
      if (s.exists(c => c == ',' || c == '"' || c == '\n')) {
        cell.head == '"' && cell.last == '"' &&
          cell.substring(1, cell.length - 1).replace("\"\"", "").forall(_ != '"')
      } else cell == s
    })
  }

  // ---- native expression kernels (evaluated via Catalyst Literals, no
  // session needed; differential against plain-Scala references) -------

  private def strArrayLit(xs: Seq[String]) =
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      xs, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

  test("tokens_in_set equals multiplicity-preserving filter-IN for any input") {
    val token = Gen.oneOf(Gen.oneOf("the", "a", "der", "le", "el"), Gen.alphaStr)
    check("tokens-in-set", forAll(
      Gen.listOf(token), Gen.listOf(token)) { (tokens, markers) =>
      val got = graft.functions.TokensInSet(
        strArrayLit(tokens), strArrayLit(markers)).eval(null)
      val set = markers.toSet
      got == tokens.count(set.contains)
    })
  }

  test("minhash_sig expression equals the plain-JVM loop for any shingle set") {
    check("minhash-sig", forAll(Gen.listOf(Gen.alphaNumStr)) { shingles =>
      val got = graft.functions.MinHashSignature(strArrayLit(shingles), 8)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      got == graft.functions.GraftFunctions.minhashPlain(shingles, 8).toSeq
    })
  }
}
