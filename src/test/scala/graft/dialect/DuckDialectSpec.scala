package graft.dialect

import org.scalatest.funsuite.AnyFunSuite

class DuckDialectSpec extends AnyFunSuite {
  import DuckDialect.translate

  test("plain SQL untouched") {
    val sql = "SELECT a, b FROM t WHERE x = ? ORDER BY 1"
    assert(translate(sql) == sql)
  }

  test("struct literal to named_struct") {
    assert(translate("SELECT { 'k': c1 } AS s") ==
      "SELECT named_struct('k', c1) AS s")
  }

  test("nested struct literal (customers.sql shape)") {
    val in = "SELECT { 'street': c_address, 'address': {'nation': c_nationkey, 'phone': c_phone }} AS contact"
    val out = translate(in)
    assert(out.contains("named_struct('street', c_address"))
    assert(out.contains("named_struct('nation', c_nationkey"))
    assert(!out.contains("{") && !out.contains("}"))
  }

  test("braces that are not struct literals are left alone") {
    val sql = "SELECT '{not a struct}' FROM t"
    assert(translate(sql) == sql)
  }

  test("json arrow operators") {
    assert(translate("SELECT j ->> 'auth' FROM t") ==
      "SELECT get_json_object(j, '$.auth') FROM t")
    assert(translate("SELECT a.j -> 'k' FROM t") ==
      "SELECT get_json_object(a.j, '$.k') FROM t")
  }

  test("::JSON cast dropped, other casts kept") {
    assert(translate("SELECT '[1]'::JSON") == "SELECT '[1]'")
    assert(translate("SELECT x::INT FROM t") == "SELECT x::INT FROM t")
  }

  test("LIST agg renamed to collect_list") {
    assert(translate("SELECT LIST(x) FILTER (WHERE y > 0) FROM t GROUP BY g") ==
      "SELECT collect_list(x) FILTER (WHERE y > 0) FROM t GROUP BY g")
  }

  test("JSON_OBJECT to to_json(named_struct(...))") {
    assert(translate("SELECT JSON_OBJECT('a', x, 'b', y) FROM t") ==
      "SELECT to_json(named_struct('a', x, 'b', y)) FROM t")
  }

  test("sqlite-ish DATE forms") {
    assert(translate("WHERE DATE(o_date) = DATE('now', '-90 days')") ==
      "WHERE to_date(o_date) = date_add(current_date(), -90)")
    assert(translate("SELECT DATE('now')") == "SELECT current_date()")
  }

  test("quoted path table refs") {
    assert(translate("SELECT * FROM '/data/c.parquet' WHERE x=1") ==
      "SELECT * FROM parquet.`/data/c.parquet` WHERE x=1")
    assert(translate("SELECT * FROM read_parquet('/d/t.parquet')") ==
      "SELECT * FROM parquet.`/d/t.parquet`")
  }

  test("read_parquet filename=true becomes an input_file_name subquery (taxi.sql)") {
    val out = translate("SELECT filename, count(*) FROM read_parquet('/d/*.parquet', filename=true) GROUP BY 1")
    assert(out ==
      "SELECT filename, count(*) FROM (SELECT *, input_file_name() AS filename FROM parquet.`/d/*.parquet`) GROUP BY 1")
  }

  test("interval unit spellings") {
    assert(translate("now() - INTERVAL '30d'") == "now() - INTERVAL '30' DAY")
    assert(translate("INTERVAL '5m'") == "INTERVAL '5' MINUTE")
    assert(translate("INTERVAL '2 days'") == "INTERVAL '2 days'") // already fine
  }

  test("strings and comments are opaque") {
    val sql = "SELECT '->> not an op { x: 1 }' AS s -- DATE('now')\nFROM t"
    assert(translate(sql) == sql)
  }

  test("DuckDB function names map to Spark equivalents") {
    assert(translate("SELECT epoch_us(ts), strpos(s, 'x'), quantile_cont(v, 0.5) FROM t") ==
      "SELECT unix_micros(ts), instr(s, 'x'), percentile(v, 0.5) FROM t")
    assert(translate("SELECT list_transform(l, x -> x + 1), list_filter(l, x -> x > 0) FROM t") ==
      "SELECT transform(l, x -> x + 1), filter(l, x -> x > 0) FROM t")
    assert(translate("SELECT array_to_string(list_distinct(l), ','), list_contains(l, 3) FROM t") ==
      "SELECT array_join(array_distinct(l), ','), array_contains(l, 3) FROM t")
    // bare identifiers that merely share a mapped name are untouched
    val bare = "SELECT strpos FROM t"
    assert(translate(bare) == bare)
  }

  test("string_split escapes regex metachars in a literal separator") {
    assert(translate("SELECT string_split(s, ' ') FROM t") ==
      "SELECT split(s, ' ') FROM t")
    assert(translate("SELECT string_split(s, '.') FROM t") ==
      "SELECT split(s, '\\\\.') FROM t")
    assert(translate("SELECT string_split(s, '|') FROM t") ==
      "SELECT split(s, '\\\\|') FROM t")
  }

  test("string_agg hoists an in-call ORDER BY into WITHIN GROUP") {
    assert(translate("SELECT string_agg(x, '|' ORDER BY k) FROM t") ==
      "SELECT listagg(x, '|') WITHIN GROUP (ORDER BY k) FROM t")
    // multi-key ordering with direction survives the hoist
    assert(translate("SELECT string_agg(x, ',' ORDER BY a DESC, b) FROM t") ==
      "SELECT listagg(x, ',') WITHIN GROUP (ORDER BY a DESC, b) FROM t")
    // no in-call ordering → plain rename (unordered in both engines)
    assert(translate("SELECT string_agg(x, ';') FROM t") ==
      "SELECT listagg(x, ';') FROM t")
    // ORDER BY inside a NESTED call is not the aggregate's ordering
    assert(translate("SELECT string_agg(f(x ORDER BY k), '|') FROM t") ==
      "SELECT listagg(f(x ORDER BY k), '|') FROM t")
  }

  test("VARCHAR/TEXT type spellings become STRING only in type position") {
    assert(translate("SELECT CAST(x AS VARCHAR) FROM t") ==
      "SELECT CAST(x AS STRING) FROM t")
    assert(translate("SELECT CAST(x AS VARCHAR(12)) FROM t") ==
      "SELECT CAST(x AS STRING) FROM t")
    assert(translate("SELECT x::VARCHAR FROM t") == "SELECT x::STRING FROM t")
    assert(translate("SELECT CAST(x AS TEXT) FROM t") ==
      "SELECT CAST(x AS STRING) FROM t")
    // `text` as an alias or column name is NOT a type spelling
    assert(translate("SELECT x AS text FROM t") == "SELECT x AS text FROM t")
    assert(translate("SELECT text FROM documents") == "SELECT text FROM documents")
  }

  test("non-portable DuckDB surface raises directed errors naming the fix") {
    def fails(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](translate(sql))
      assert(e.getMessage.contains(needle), s"$sql → ${e.getMessage}")
    }
    fails("SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.ts >= b.ts",
      "graft.operators.AsOfJoin")
    fails("SELECT * FROM t USING SAMPLE 10%", "md5-threshold")
    fails("PIVOT t ON col USING sum(v)", "standard SQL PIVOT")
    // near-misses stay untouched: standard PIVOT, a USING join column
    // list, and a column named pivot
    assert(translate("SELECT * FROM t PIVOT (sum(v) FOR c IN ('a'))")
      .contains("PIVOT"))
    assert(translate("SELECT * FROM a JOIN b USING (sample)")
      .contains("USING (sample)"))
    assert(translate("SELECT pivot FROM t") == "SELECT pivot FROM t")
  }

  test("DISTINCT ON rewrites to the first-row-per-group window form") {
    val got = translate(
      "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v DESC LIMIT 5")
      .replaceAll("\\s+", " ").trim
    assert(got ==
      "SELECT k, v FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY k ORDER BY k, v DESC ) AS __graft_don " +
        "FROM t ) __graft_don_sub WHERE __graft_don = 1 ORDER BY k, v DESC LIMIT 5", got)
    // no ORDER BY: the window orders by the keys (stable arbitrary pick
    // inside DuckDB's any-row semantics)
    val un = translate("SELECT DISTINCT ON (a, b) a, b, c FROM t")
    assert(un.contains("PARTITION BY a, b ORDER BY a, b"), un)
    // plain DISTINCT untouched
    assert(translate("SELECT DISTINCT k FROM t") == "SELECT DISTINCT k FROM t")
  }

  test("star-EXCLUDE becomes star-EXCEPT; frame-position EXCLUDE untouched") {
    assert(translate("SELECT * EXCLUDE (a, b) FROM t") ==
      "SELECT * EXCEPT (a, b) FROM t")
    assert(translate("SELECT t.* EXCLUDE (a) FROM t") ==
      "SELECT t.* EXCEPT (a) FROM t")
    // not in star position: left alone (a column named exclude, or a
    // window-frame exclusion) — surfaces downstream, never corrupted
    assert(translate("SELECT exclude FROM t") == "SELECT exclude FROM t")
  }

  test("QUALIFY rewrites to the subquery form it abbreviates") {
    val got = translate(
      "SELECT g, row_number() OVER (PARTITION BY g ORDER BY v) AS rn " +
        "FROM t QUALIFY rn <= 3 ORDER BY g, rn LIMIT 10")
      .replaceAll("\\s+", " ")
    assert(got.startsWith("SELECT * FROM ("), got)
    assert(got.contains(") __graft_q WHERE rn <= 3 ORDER BY g, rn LIMIT 10"), got)
    assert(!got.toLowerCase.contains("qualify"), got)
  }

  test("QUALIFY inside a subquery rewrites only its own block") {
    val got = translate(
      "SELECT * FROM (SELECT g, rank() OVER (ORDER BY v) AS r " +
        "FROM t QUALIFY r = 1) s JOIN u ON s.g = u.g")
      .replaceAll("\\s+", " ")
    assert(got.contains("(SELECT * FROM (SELECT g,"), got)
    assert(got.contains("WHERE r = 1) s JOIN u"), got)
    assert(!got.toLowerCase.contains("qualify"), got)
  }

  test("QUALIFY with an inline window raises the directed error") {
    val e = intercept[IllegalArgumentException](translate(
      "SELECT g FROM t QUALIFY row_number() OVER (ORDER BY v) = 1"))
    assert(e.getMessage.contains("alias the window function"))
  }

  test("empty OVER () gains a synthetic order key (W1)") {
    assert(translate("SELECT ROW_NUMBER() OVER () AS id FROM t") ==
      "SELECT ROW_NUMBER() OVER (ORDER BY monotonically_increasing_id()) AS id FROM t")
    // windows with content are untouched
    val w = "SELECT rank() OVER (PARTITION BY a ORDER BY b) FROM t"
    assert(translate(w) == w)
  }

  test("full reference customers.sql translates to parseable Spark SQL") {
    val t =
      """SELECT
        |  c_custkey as key,
        |  c_name as name,
        |  { 'street': c_address, 'address': {'nation': c_nationkey, 'phone': c_phone }} AS contact,
        |  { 'segment': c_mktsegment } AS segment
        |FROM '/root/testdata/sf0.001/customer.parquet'
        |WHERE 1=1
        |  AND c_custkey = 42
        |""".stripMargin
    val out = translate(t)
    assert(out.contains("named_struct('street', c_address"))
    assert(out.contains("FROM parquet.`/root/testdata/sf0.001/customer.parquet`"))
  }
}
