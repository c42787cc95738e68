package graft.dialect

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.scalatest.funsuite.AnyFunSuite

import graft.template.{Mustache, TemplateContext}

/** The portability gate: the reference's REAL example templates —
  * rendered with our Mustache engine under both section states, then
  * dialect-translated — must parse as Spark SQL. (Execution parity for
  * the constructs they use is covered by the oracle entries; this
  * proves verbatim template PORTING works, which is the shim's job.)
  */
class ReferenceTemplateSpec extends AnyFunSuite {

  private def load(rel: String): String =
    new String(Files.readAllBytes(
      Paths.get("/root/reference/examples/sqls", rel)), "UTF-8")

  private def renderTranslateParse(template: String,
                                   params: Map[String, String],
                                   conn: Map[String, String] = Map.empty): String = {
    val ctx = TemplateContext.forRequest(params, conn)
    val sql0 = Mustache.render(template, ctx)
    // the reference terminates some templates with ';' — statement
    // framing is the splitter's job, not the parser's
    val sql = DuckDialect.translate(sql0).trim.stripSuffix(";")
    CatalystSqlParser.parsePlan(sql) // throws ParseException on failure
    sql
  }

  test("customers.sql ports verbatim (both section states)") {
    val t = load("customers/customers.sql")
    val both = renderTranslateParse(t,
      Map("id" -> "42", "segment" -> "MOBILE"),
      conn = Map("path" -> "/root/testdata/sf0.001/customer.parquet"))
    assert(both.contains("named_struct"))
    assert(both.contains("c_custkey = 42"))
    renderTranslateParse(t, Map.empty,
      conn = Map("path" -> "/root/testdata/sf0.001/customer.parquet"))
  }

  test("northwind orders.sql ports verbatim (LIST of struct + FILTER + DATE())") {
    val t = load("northwind/orders.sql")
    val sql = renderTranslateParse(t,
      Map("order_id" -> "10248", "order_date" -> "1996-07-04"))
    assert(sql.contains("collect_list"))
    assert(sql.contains("named_struct"))
    assert(!sql.contains("{")) // no struct-literal braces survive
    renderTranslateParse(t, Map.empty)
  }

  test("mcp_customer_lookup.sql ports verbatim (JSON_OBJECT + relative DATE)") {
    val t = load("customers/mcp_customer_lookup.sql")
    val withOrders = renderTranslateParse(t,
      Map("customer_id" -> "C001", "include_orders" -> "true"))
    assert(withOrders.contains("to_json(named_struct("))
    assert(withOrders.contains("date_add(current_date(), -90)"),
      s"relative DATE not shimmed:\n$withOrders")
    val without = renderTranslateParse(t, Map("customer_id" -> "C001"))
    assert(without.contains("NULL as recent_orders"))
  }

  private def renderTranslateSplitParse(template: String,
                                        params: Map[String, String],
                                        conn: Map[String, String] = Map.empty): Seq[String] = {
    val ctx = TemplateContext.forRequest(params, conn)
    val sql = DuckDialect.translate(Mustache.render(template, ctx))
    val stmts = graft.write.SqlSplitter.split(sql).filter(_.trim.nonEmpty)
    stmts.foreach(st => CatalystSqlParser.parsePlan(st))
    stmts
  }

  test("northwind products-create.sql ports verbatim (multi-statement write)") {
    val t = load("northwind/products-create.sql")
    // all optional fields present
    val full = renderTranslateSplitParse(t, Map(
      "product_name" -> "Chai", "supplier_id" -> "1", "category_id" -> "2",
      "quantity_per_unit" -> "10 boxes", "unit_price" -> "18.0",
      "units_in_stock" -> "39", "units_on_order" -> "0",
      "reorder_level" -> "10", "discontinued" -> "0"))
    assert(full.size == 2) // INSERT + trailing RETURNING-convention SELECT
    assert(full.head.toUpperCase.contains("INSERT INTO"))
    assert(full.last.contains("MAX(ProductID)"))
    // optional fields absent → inverted sections supply defaults
    val defaults = renderTranslateSplitParse(t, Map(
      "product_name" -> "Chai", "supplier_id" -> "1", "category_id" -> "2"))
    assert(defaults.head.contains("NULL"))
    assert(defaults.head.contains("0.0"))
  }

  test("northwind products-update.sql ports verbatim (conditional SET list)") {
    val t = load("northwind/products-update.sql")
    val stmts = renderTranslateSplitParse(t, Map(
      "product_id" -> "7", "product_name" -> "NewName"))
    assert(stmts.size == 2) // UPDATE + read-back SELECT
    assert(stmts.head.toUpperCase.contains("UPDATE NW.PRODUCTS"))
    assert(stmts.head.contains("ProductName = 'NewName'"))
    // no optional field at all → trailing-comma guard section renders
    val minimal = renderTranslateSplitParse(t, Map("product_id" -> "7"))
    assert(minimal.head.contains("Discontinued = Discontinued"))
  }

  test("northwind products-delete.sql ports verbatim") {
    val t = load("northwind/products-delete.sql")
    val stmts = renderTranslateSplitParse(t, Map("product_id" -> "9"))
    assert(stmts.size == 1)
    assert(stmts.head.toUpperCase.contains("DELETE FROM"))
  }

  test("customers_cache.sql ports verbatim (cache.* vars + CTAS)") {
    val t = load("customers/customers_cache.sql")
    val ctx = TemplateContext.forRequest(
      Map("cacheCatalog" -> "spark_catalog", "cacheSchema" -> "cache",
        "cacheTable" -> "customers_cache", "cacheSnapshotId" -> "7"),
      connProps = Map("path" -> "/data/customers.parquet"))
    val sql = DuckDialect.translate(Mustache.render(t, ctx)).trim.stripSuffix(";")
    assert(sql.contains("spark_catalog.cache.customers_cache"))
    assert(sql.contains("'7' as cache_snapshot_id"))
    // handlebars-style {{#if request.x}} blocks: no request params bound
    // here → falsy → dropped
    assert(!sql.contains("request.id"))
    CatalystSqlParser.parsePlan(sql)
    // and with a request param present the block renders
    val withId = Mustache.render(t,
      ctx.withNamespace("request", Map("id" -> "5")))
    assert(withId.contains("AND id = 5"))
  }

  test("taxi.sql ports verbatim (positional GROUP BY + filename virtual column)") {
    val t = load("taxi/taxi.sql")
    val sql = renderTranslateParse(t, Map.empty,
      conn = Map("path" -> "/root/testdata/sf0.001"))
    assert(sql.toLowerCase.contains("group by"))
    assert(sql.contains("input_file_name() AS filename"),
      s"filename=true not shimmed:\n$sql")
    // and the ported shape EXECUTES: same scan+filename+positional
    // group-by over real testdata (taxi's VendorID column swapped for
    // one the corpus carries)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("ref-template-exec")
      .config("spark.ui.enabled", "false").getOrCreate()
    val runnable = DuckDialect.translate(
      """select filename, o_orderstatus, count(*)
        |from read_parquet('/root/testdata/sf0.001/orders.parquet', filename=true)
        |group by 1, 2""".stripMargin)
    val rows = spark.sql(runnable).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0).endsWith("orders.parquet")))
  }
}
