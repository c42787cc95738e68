package graft.write

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference splitter's Catch2 suite
  * (/root/reference/test/cpp/sql_utils_test.cpp). */
class SqlSplitterSpec extends AnyFunSuite {
  import SqlSplitter._

  test("basic splitting") {
    assert(split("SELECT * FROM t") == Vector("SELECT * FROM t"))
    assert(split("SELECT * FROM t;") == Vector("SELECT * FROM t"))
    assert(split("INSERT INTO t VALUES (1); SELECT * FROM t") ==
      Vector("INSERT INTO t VALUES (1)", "SELECT * FROM t"))
    assert(split("SELECT 1; SELECT 2; SELECT 3") ==
      Vector("SELECT 1", "SELECT 2", "SELECT 3"))
    assert(split("  SELECT 1 ;\n  SELECT 2 ;\t SELECT 3  ") ==
      Vector("SELECT 1", "SELECT 2", "SELECT 3"))
    assert(split("") == Vector())
    assert(split("   \n\t  ") == Vector())
    assert(split(";;;") == Vector())
    assert(split(" ; ; ; ") == Vector())
  }

  test("single-quoted strings") {
    assert(split("SELECT 'a;b' FROM t") == Vector("SELECT 'a;b' FROM t"))
    assert(split("SELECT 'a;b;c;d' FROM t") == Vector("SELECT 'a;b;c;d' FROM t"))
    assert(split("SELECT 'it''s fine; really' FROM t") ==
      Vector("SELECT 'it''s fine; really' FROM t"))
    assert(split("SELECT ''; SELECT 2") == Vector("SELECT ''", "SELECT 2"))
    assert(split("SELECT 'test;test'; SELECT 2") ==
      Vector("SELECT 'test;test'", "SELECT 2"))
  }

  test("double-quoted identifiers") {
    assert(split("""SELECT "a;b" FROM t""") == Vector("""SELECT "a;b" FROM t"""))
    assert(split("""SELECT "x""y;z" FROM t""") == Vector("""SELECT "x""y;z" FROM t"""))
    assert(split("""SELECT "q"; SELECT 2""") == Vector("""SELECT "q"""", "SELECT 2"))
  }

  test("dollar-quoted bodies") {
    assert(split("SELECT $$a;b$$") == Vector("SELECT $$a;b$$"))
    assert(split("SELECT $tag$x;y$tag$; SELECT 2") ==
      Vector("SELECT $tag$x;y$tag$", "SELECT 2"))
    // nested different tag stays inside the outer body
    assert(split("SELECT $a$ x $b$ ; $a$") == Vector("SELECT $a$ x $b$ ; $a$"))
    // invalid tag (space) is just a '$' character
    assert(split("SELECT 1 $ 2; SELECT 3") == Vector("SELECT 1 $ 2", "SELECT 3"))
  }

  test("quotes spanning statement-like content") {
    assert(split("SELECT 'DROP TABLE x; DELETE FROM y'") ==
      Vector("SELECT 'DROP TABLE x; DELETE FROM y'"))
  }

  test("placeholder counting honors quote contexts") {
    assert(countPlaceholders("SELECT ? + ?") == 2)
    assert(countPlaceholders("SELECT '?' , ?") == 1)
    assert(countPlaceholders("SELECT \"?\" , ?") == 1)
    assert(countPlaceholders("SELECT $$?$$ , ?") == 1)
    assert(countPlaceholders("SELECT 'it''s ?', ?, ?") == 2)
    assert(countPlaceholders("no placeholders") == 0)
  }

  test("binding-plan slicing across statements") {
    val stmts = Vector("INSERT INTO t VALUES (?, ?)", "SELECT 1", "DELETE FROM t WHERE k = ?")
    assert(sliceBindings(stmts, Seq("a", "b", "c")) ==
      Seq(Seq("a", "b"), Seq(), Seq("c")))
    intercept[IllegalArgumentException](sliceBindings(stmts, Seq("a", "b")))
    intercept[IllegalArgumentException](sliceBindings(stmts, Seq("a", "b", "c", "d")))
  }
}
