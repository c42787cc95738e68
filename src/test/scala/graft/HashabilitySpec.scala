package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Static driver-hashability convention gate (r9 verdict #3, carried
  * from r8 #6): the driver's comparator sorts columns by name, sorts
  * ROWS by every column's value through pandas, and hashes — two
  * defect classes broke the round gate reactively in two separate
  * rounds and are pinned here statically, BEFORE a driver run:
  *
  *  1. NESTED OUTPUT — a top-level array/struct/map column is
  *     unsortable in the comparator (pandas cannot order nested
  *     cells). Convention: route nested values through to_json(...)
  *     or explode to scalar rows (the t1_types_roundtrip /
  *     jl_projection precedent). Checked against the analyzed schema
  *     of every registered query. (Building a frame is NOT free for
  *     queries whose memoized builds run eager driver-side jobs —
  *     codebook training, prefix scans — so this suite pays a short
  *     execution pass; the ORACLE check below is genuinely static.)
  *
  *  2. HUGEINT WIDENING — DuckDB's sum() over any integer type (and
  *     list_aggregate(..., 'sum') over integer lists) returns
  *     HUGEINT, which lands in pandas as object dtype and
  *     hash-mismatches Spark's int64 even on identical values.
  *     Convention: every sum-family aggregate in an oracle's FINAL
  *     projection must sit inside a CAST(...) (or round(...), which
  *     emits DOUBLE). Checked by parsing each oracle's final
  *     projection with a paren-depth scanner — no DuckDB needed.
  *
  * Both checks are proven against deliberately-bad fixtures first, so
  * the gate itself is known to fire.
  */
class HashabilitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("hashability-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- check 1: no nested top-level output columns ----------------------

  private def nestedColumns(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[StructType] ||
        f.dataType.isInstanceOf[MapType] => s"${f.name}: ${f.dataType.simpleString}"
    }

  test("nested-output detector fires on array/struct/map fixtures, passes scalars") {
    val sess = spark; import sess.implicits._
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
      .withColumn("s", org.apache.spark.sql.functions.struct($"id"))
    assert(nestedColumns(bad.schema).size == 2, nestedColumns(bad.schema))
    val good = Seq((1L, "a", 2.5)).toDF("id", "name", "x")
    assert(nestedColumns(good.schema).isEmpty)
  }

  test("every registered query's schema is driver-hashable (no nested top-level column)") {
    val violations = SparkEntry.allDefs.flatMap { d =>
      nestedColumns(d.build(spark, sf).schema).map(c => s"${d.name} -> $c")
    }
    assert(violations.isEmpty,
      s"nested top-level columns (route through to_json/explode):\n" +
        violations.mkString("\n"))
  }

  // ---- check 2: oracle final projections CAST their sums ----------------

  /** The final projection of `sql`: text between the last depth-0
    * SELECT and the following depth-0 FROM. Every gated oracle ends in
    * a top-level `SELECT ... FROM ... [ORDER BY ...]`. */
  private[graft] def finalProjection(sql: String): String = {
    val s = sql
    var depth = 0
    var lastSelect = -1
    var i = 0
    def wordAt(idx: Int, w: String): Boolean =
      s.regionMatches(true, idx, w, 0, w.length) &&
        (idx == 0 || !s(idx - 1).isLetterOrDigit) &&
        (idx + w.length >= s.length || !s(idx + w.length).isLetterOrDigit)
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && wordAt(i, "select") => lastSelect = i
        case _ =>
      }
      i += 1
    }
    require(lastSelect >= 0, "no top-level SELECT found")
    depth = 0
    i = lastSelect + 6
    val start = i
    while (i < s.length &&
      !(depth == 0 && wordAt(i, "from"))) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    s.substring(start, i)
  }

  /** Sum-family aggregate occurrences in the final projection that are
    * NOT enclosed by a cast(...) or round(...) call — each returned as
    * a short context snippet. Uses a stack of enclosing call names
    * maintained by the same depth scanner, so `CAST(sum(x) AS BIGINT)`
    * and `CAST(sum(x) OVER (...) AS BIGINT)` both pass while a bare
    * `sum(x)` (HUGEINT in DuckDB) is flagged. */
  private[graft] def uncastSums(sql: String): Seq[String] = {
    val proj = finalProjection(sql)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val stack = scala.collection.mutable.Stack.empty[String]
    var i = 0
    def identEndingAt(idx: Int): String = {
      var b = idx
      while (b > 0 && (proj(b - 1).isLetterOrDigit || proj(b - 1) == '_')) b -= 1
      proj.substring(b, idx).toLowerCase
    }
    while (i < proj.length) {
      proj(i) match {
        case '(' =>
          val fn = identEndingAt(i)
          if ((fn == "sum" || fn == "list_aggregate") &&
            !stack.exists(f => f == "cast" || f == "round")) {
            // list_aggregate only widens for the 'sum' reducer
            val isSumAgg = fn == "sum" ||
              proj.substring(i, math.min(proj.length, i + 200)).contains("'sum'")
            if (isSumAgg)
              out += proj.substring(math.max(0, i - 10),
                math.min(proj.length, i + 30)).trim
          }
          stack.push(fn)
        case ')' => if (stack.nonEmpty) stack.pop()
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  test("uncast-sum detector fires on bad fixtures, passes the conventions") {
    // bare sum in the final projection: the exact r8 gate-break shape
    assert(uncastSums("SELECT k, sum(x) AS s FROM t GROUP BY k").nonEmpty)
    // bare list_aggregate 'sum' over an integer list: the r9 shape
    assert(uncastSums(
      "WITH b AS (SELECT 1) SELECT list_aggregate(v, 'sum') AS s FROM t").nonEmpty)
    // CAST-wrapped forms pass — plain, windowed, and expression-nested
    assert(uncastSums("SELECT CAST(sum(x) AS BIGINT) AS s FROM t").isEmpty)
    assert(uncastSums(
      "SELECT CAST(sum(x) OVER (PARTITION BY k) AS BIGINT) AS s FROM t").isEmpty)
    assert(uncastSums(
      "SELECT CAST(round(list_aggregate(v, 'sum') * 2, 0) AS BIGINT) AS s FROM t").isEmpty)
    // round alone emits DOUBLE — also hash-stable
    assert(uncastSums("SELECT round(sum(x), 2) AS s FROM t").isEmpty)
    // sums INSIDE a CTE don't count — only the final projection ships
    assert(uncastSums(
      "WITH a AS (SELECT sum(x) AS s FROM t) SELECT CAST(s AS BIGINT) AS s FROM a").isEmpty)
    // list_aggregate with a non-widening reducer passes
    assert(uncastSums("SELECT list_aggregate(v, 'max') AS m FROM t").isEmpty)
  }

  test("every oracle's final projection CASTs its sum-family aggregates") {
    val violations = SparkEntry.allDefs.flatMap(d => d.oracle.toSeq.flatMap(o =>
      uncastSums(o).map(v => s"${d.name}: ...$v...")))
    assert(violations.isEmpty,
      "un-CAST sum-family aggregates in oracle final projections " +
        s"(DuckDB widens to HUGEINT -> pandas object -> hash break):\n" +
        violations.mkString("\n"))
  }
}
