package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QuerySet, Tables}
import graft.api.{Paginator, TemplatePipeline}
import graft.config._

/** End-to-end endpoint queries driven through the full template pipeline
  * (SURVEY §3.1 steps 3-9): validation → prepared rewrite → Mustache
  * render → DuckDB-dialect translation → `spark.sql(sql, args)`.
  *
  * The template below is the reference's canonical customers endpoint
  * (/root/reference/examples/sqls/customers/customers.sql) adapted to the
  * columns the driver's testdata customer table carries. It exercises:
  *   - struct-literal projection `{...}` (P2) incl. nesting,
  *   - conditional Mustache sections + inverted sections (P3),
  *   - `LIKE '%x%'` contains filter built in-section from a raw
  *     triple-brace param (P4) — text path, validated upstream,
  *   - a top-level typed `{{params.min_balance}}` that the prepared
  *     rewriter turns into a positional `?` bound as a Double (T3-T5).
  *
  * Scale: the rendered SQL is a single-table scan; Catalyst pushes both
  * predicates and the 5-column projection into the parquet scan, so at
  * 100 TB only matching row groups are read. No shuffle except the
  * output sort.
  */
object EndpointQueries extends QuerySet {

  val customersTemplate: String =
    """SELECT
      |  c_custkey AS key,
      |  c_name AS name,
      |  round(c_acctbal, 2) AS balance,
      |  {'segment': c_mktsegment, 'nation': {'nationkey': c_nationkey}} AS contact
      |FROM customer
      |WHERE c_acctbal >= {{params.min_balance}}
      |{{#params.segment}}
      |  AND c_mktsegment LIKE '%{{{params.segment}}}%'
      |{{/params.segment}}
      |{{#params.id}}
      |  AND c_custkey = {{params.id}}
      |{{/params.id}}
      |{{^params.id}}
      |  AND c_custkey > 0
      |{{/params.id}}
      |ORDER BY c_custkey""".stripMargin

  val customersEndpoint: EndpointConfig = EndpointConfig(
    urlPath = "/customers",
    templateSource = "customers.sql",
    requestFields = Seq(
      RequestFieldConfig("id", validators = Seq(ValidatorConfig("int"))),
      RequestFieldConfig("segment",
        validators = Seq(ValidatorConfig("string", regex = "[A-Z]+"))),
      RequestFieldConfig("min_balance",
        defaultValue = Some("0"),
        validators = Seq(ValidatorConfig("number")))),
    requestFieldsValidation = true)

  private def runCustomers(s: SparkSession, dir: String,
                           params: Map[String, String]): DataFrame = {
    Tables.register(s, dir)
    TemplatePipeline.run(s, customersEndpoint, customersTemplate, params)
  }

  // Fixed request: segment contains-match + bound min_balance, id absent
  // (inverted section renders). Oracle = the same SQL a correct render
  // must produce, with the bound literal inlined. The nested `contact`
  // struct is serialized to compact JSON on BOTH engines at the
  // correctness boundary only (the endpoint itself returns the struct):
  // the driver's pandas compare cannot sort nested values, and
  // a3_json_object proves both engines hash-match on compact JSON.
  private def jsonContact(df: DataFrame): DataFrame =
    df.withColumn("contact", to_json(col("contact")))

  private val epCustomers = QueryDef(
    "ep_customers",
    Some("""SELECT c_custkey AS key, c_name AS name,
           |  round(c_acctbal, 2) AS balance,
           |  to_json({'segment': c_mktsegment, 'nation': {'nationkey': c_nationkey}}) AS contact
           |FROM customer
           |WHERE c_acctbal >= 1000.5
           |  AND c_mktsegment LIKE '%MOBILE%'
           |  AND c_custkey > 0
           |ORDER BY c_custkey""".stripMargin),
    (s, dir) => jsonContact(runCustomers(s, dir,
      Map("segment" -> "MOBILE", "min_balance" -> "1000.5"))))

  // Same endpoint with the id section active and typed id on the text
  // path (in-section refs render as text per the reference's rewriter —
  // they are validated as int upstream, so the splice is safe).
  private val epCustomersById = QueryDef(
    "ep_customers_by_id",
    Some("""SELECT c_custkey AS key, c_name AS name,
           |  round(c_acctbal, 2) AS balance,
           |  to_json({'segment': c_mktsegment, 'nation': {'nationkey': c_nationkey}}) AS contact
           |FROM customer
           |WHERE c_acctbal >= 0.0 AND c_custkey = 42
           |ORDER BY c_custkey""".stripMargin),
    (s, dir) => jsonContact(runCustomers(s, dir, Map("id" -> "42"))))

  // Pagination envelope page (O2): LIMIT/OFFSET over the endpoint result.
  private val epCustomersPage = QueryDef(
    "ep_customers_page",
    Some("""SELECT * FROM (
           |  SELECT c_custkey AS key, c_name AS name,
           |    round(c_acctbal, 2) AS balance,
           |    to_json({'segment': c_mktsegment, 'nation': {'nationkey': c_nationkey}}) AS contact
           |  FROM customer
           |  WHERE c_acctbal >= 1000.5
           |    AND c_mktsegment LIKE '%MOBILE%'
           |    AND c_custkey > 0
           |  ORDER BY c_custkey) q
           |LIMIT 25 OFFSET 50""".stripMargin),
    (s, dir) => {
      val df = runCustomers(s, dir,
        Map("segment" -> "MOBILE", "min_balance" -> "1000.5"))
      jsonContact(Paginator.paginate(df, offset = 50, limit = 25).data)
    })

  // Companion COUNT (A4): total_count from the UN-limited plan — one
  // render, no LIMIT, Catalyst prunes the count plan to the scan.
  private val epCustomersCount = QueryDef(
    "ep_customers_count",
    Some("""SELECT count(*) AS total_count FROM customer
           |WHERE c_acctbal >= 1000.5
           |  AND c_mktsegment LIKE '%MOBILE%'
           |  AND c_custkey > 0""".stripMargin),
    (s, dir) => {
      val df = runCustomers(s, dir,
        Map("segment" -> "MOBILE", "min_balance" -> "1000.5"))
      val total = Paginator.paginate(df, 0, 25).totalCount
      val spark = s
      import spark.implicits._
      Seq(total).toDF("total_count")
    })

  // S7: JSON secrets-table shape — parse a JSON document, explode a
  // nested array, project fields (reference: database_manager.cpp:726-809
  // uses unnest(cast(j.auth AS JSON[])) + ->> extraction).
  private val secretsJson = """{"auth":[{"user":"alice","roles":["admin","dev"]},{"user":"bob","roles":["dev"]}]}"""
  private val epSecrets = QueryDef(
    "ep_secrets_json",
    Some(s"""SELECT unnest(cast('$secretsJson'::JSON -> '$$.auth[0].roles' AS VARCHAR[])) AS role
            |ORDER BY role""".stripMargin),
    (s, dir) =>
      s.sql(s"""SELECT r AS role FROM (
               |  SELECT explode(from_json(get_json_object('$secretsJson', '$$.auth[0].roles'),
               |                           'ARRAY<STRING>')) AS r)
               |ORDER BY role""".stripMargin))

  // "Latest order per customer" — the canonical DISTINCT ON endpoint
  // shape, driven through the FULL pipeline (validation → prepared
  // rewrite → Mustache → dialect translation → spark.sql): the
  // template is written in DuckDB's vocabulary (DISTINCT ON +
  // star-EXCLUDE) exactly as a reference author would write it, and
  // the translator's window rewrite + EXCEPT rename must survive the
  // prepared-statement parameter binding. Fully tie-broken ordering so
  // both engines keep the identical row per customer.
  val latestOrderTemplate: String =
    """SELECT * EXCLUDE (o_orderpriority, o_orderstatus) FROM (
      |  SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
      |    round(o_totalprice, 2) AS price, o_orderpriority, o_orderstatus
      |  FROM orders
      |  WHERE o_totalprice >= {{params.min_total}}
      |  ORDER BY o_custkey, o_orderdate DESC, o_orderkey)
      |ORDER BY o_custkey""".stripMargin

  val latestOrderEndpoint: EndpointConfig = EndpointConfig(
    urlPath = "/latest-order",
    templateSource = "latest_order.sql",
    requestFields = Seq(
      RequestFieldConfig("min_total",
        defaultValue = Some("0"),
        validators = Seq(ValidatorConfig("number")))),
    requestFieldsValidation = true)

  private val epLatestOrder = QueryDef(
    "ep_latest_order",
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
           |FROM (
           |  SELECT o_custkey, o_orderkey, o_totalprice,
           |    row_number() OVER (PARTITION BY o_custkey
           |                       ORDER BY o_orderdate DESC, o_orderkey) AS rn
           |  FROM orders WHERE o_totalprice >= 100000)
           |WHERE rn = 1 ORDER BY o_custkey""".stripMargin),
    (s, dir) => {
      Tables.register(s, dir)
      TemplatePipeline.run(s, latestOrderEndpoint, latestOrderTemplate,
        Map("min_total" -> "100000"))
    })

  override val defs: Seq[QueryDef] =
    Seq(epCustomers, epCustomersById, epCustomersPage, epCustomersCount,
      epSecrets, epLatestOrder)
}
