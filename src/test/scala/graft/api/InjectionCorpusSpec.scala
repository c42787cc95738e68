package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.template.Mustache

/** End-to-end SQL-injection corpus, mirroring the reference's 99-payload
  * read suite (/root/reference/test/integration/test_sql_injection_corpus.py):
  * one endpoint per validator type over a small seeded VALUES table, every
  * payload fired through validate → prepared-rewrite → render →
  * `spark.sql(sql, args)`.
  *
  * Contract under test (same as the reference):
  *  1. strict validators (int/double/boolean/date/time/uuid/enum/email)
  *     reject malformed input before SQL is ever built;
  *  2. the loose string validator accepts anything — the prepared bind is
  *     the hard boundary: the payload reaches Spark as a typed literal,
  *     never as SQL text, so it matches at most one seed row;
  *  3. legitimate values still match exactly their row (no over-defanging).
  */
class InjectionCorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("injection-corpus")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- endpoint fixtures (slug, param, field config, template, seed rows)

  private def field(name: String, v: ValidatorConfig): RequestFieldConfig =
    RequestFieldConfig(name, required = true, validators = Seq(v),
      defaultValue = None)

  private case class Fixture(
      slug: String,
      param: String,
      fieldCfg: RequestFieldConfig,
      template: String,
      seedCount: Int)

  private val fixtures = Map(
    "int" -> Fixture("int", "id",
      field("id", ValidatorConfig("int", min = 1, max = 100000, preventSqlInjection = false)),
      "SELECT id, label FROM (VALUES (1,'one'),(2,'two'),(3,'three')) AS t(id,label) WHERE id = {{ params.id }}",
      3),
    "double" -> Fixture("double", "x",
      field("x", ValidatorConfig("number", preventSqlInjection = false)),
      "SELECT * FROM (VALUES (1.5,'a'),(2.5,'b'),(3.5,'c')) AS t(x,label) WHERE x = {{ params.x }}",
      3),
    "boolean" -> Fixture("boolean", "flag",
      field("flag", ValidatorConfig("boolean", preventSqlInjection = false)),
      "SELECT * FROM (VALUES (true,'yes'),(false,'no')) AS t(flag,label) WHERE flag = {{ params.flag }}",
      2),
    "date" -> Fixture("date", "d",
      field("d", ValidatorConfig("date", preventSqlInjection = false)),
      "SELECT * FROM (VALUES (DATE '2024-03-15','spring'),(DATE '2024-06-21','summer')) AS t(d,label) WHERE d = {{ params.d }}",
      2),
    "time" -> Fixture("time", "t",
      field("t", ValidatorConfig("time", preventSqlInjection = false)),
      // Spark has no TIME type (SURVEY §1.2): times bind/compare as
      // HH:MM:SS strings — same wire format the serializer emits.
      "SELECT * FROM (VALUES ('13:45:07','noon'),('00:00:00','midnight')) AS u(t,label) WHERE t = {{ params.t }}",
      2),
    "uuid" -> Fixture("uuid", "u",
      field("u", ValidatorConfig("uuid", preventSqlInjection = false)),
      "SELECT * FROM (VALUES ('11111111-1111-1111-1111-111111111111','first'),('22222222-2222-2222-2222-222222222222','second')) AS t(u,label) WHERE u = {{ params.u }}",
      2),
    "enum" -> Fixture("enum", "status",
      field("status", ValidatorConfig("enum",
        allowedValues = Seq("active", "inactive", "pending"), preventSqlInjection = false)),
      "SELECT * FROM (VALUES ('active','A'),('inactive','I'),('pending','P')) AS t(status,label) WHERE status = {{ params.status }}",
      3),
    "email" -> Fixture("email", "e",
      field("e", ValidatorConfig("email", preventSqlInjection = false)),
      "SELECT * FROM (VALUES ('alice@example.com','A'),('bob@example.com','B')) AS t(e,label) WHERE e = {{ params.e }}",
      2),
    "string" -> Fixture("string", "name",
      field("name", ValidatorConfig("string", min = 1, max = 200, preventSqlInjection = false)),
      "SELECT * FROM (VALUES (1,'alice'),(2,'bob'),(3,'carol')) AS t(id,name) WHERE name = {{ params.name }}",
      3))

  private def endpoint(f: Fixture): EndpointConfig = EndpointConfig(
    urlPath = s"/lookup-${f.slug}",
    templateSource = s"lookup_${f.slug}.sql",
    requestFields = Seq(f.fieldCfg),
    requestFieldsValidation = true)

  /** Fire a payload; assert either a validation rejection or < seedCount
    * rows — never the full seed table (an OR-injection leak). Time-typed
    * binds become LocalTime which Spark can't compare to VARCHAR seeds;
    * an execution error on a hostile payload is also a safe rejection. */
  private def expectNoLeak(f: Fixture, payload: String): Unit =
    TemplatePipeline.prepare(endpoint(f), f.template, Map(f.param -> payload)) match {
      case Left(_) => () // rejected at the validation boundary — safe
      case Right((sql, args)) =>
        val n =
          try {
            val bound = args.map {
              case t: java.time.LocalTime => t.toString // no Spark TIME type
              case v => v
            }
            (if (bound.isEmpty) spark.sql(sql) else spark.sql(sql, bound)).count()
          } catch {
            // a bind/analysis error is a rejection, not a leak
            case _: org.apache.spark.sql.AnalysisException => 0L
          }
        assert(n < f.seedCount,
          s"INJECTION LEAK on /lookup-${f.slug}: payload '$payload' returned $n of ${f.seedCount} seed rows")
    }

  private def runLegit(f: Fixture, value: String): Long =
    TemplatePipeline.prepare(endpoint(f), f.template, Map(f.param -> value)) match {
      case Left(errs) => fail(s"legit value '$value' rejected: $errs")
      case Right((sql, args)) =>
        val bound = args.map {
          case t: java.time.LocalTime =>
            t.toString // VARCHAR comparison; HH:MM:SS canonical form
          case v => v
        }
        (if (bound.isEmpty) spark.sql(sql) else spark.sql(sql, bound)).count()
    }

  // ---- payload corpora (verbatim from the reference suite) --------------

  private val numeric = Seq(
    "1 OR 1=1", "1; DROP TABLE t", "1 UNION SELECT 1, 'evil'",
    "1/**/OR/**/1=1", "1' OR '1'='1", "'1' OR '1'='1'--", "1e3", "1.5",
    "0xdeadbeef", "abc", "", "   ", "1 AND SLEEP(5)",
    "1) UNION SELECT NULL--", " ;", "/*comment*/1")

  private val doubles = Seq(
    "1.5 OR 1=1", "1.5; DROP TABLE t", "1.5' OR '1'='1",
    "1.5 UNION SELECT 1.0", "abc", "", "1.5/*", "  1.5 garbage")

  private val booleans = Seq(
    "true OR 1=1", "true; DROP TABLE", "yes", "TRUE; DROP TABLE",
    "1 OR 1=1", "false' --", "2", "")

  private val dates = Seq(
    "2024-03-15' OR '1'='1", "2024-03-15; DROP TABLE t", "2024-13-99",
    "9999-99-99", "abc", "", "2024/03/15", "15-03-2024", "2024-03-15 UNION")

  private val times = Seq(
    "12:00:00' OR '1'='1", "12:00:00; DROP TABLE", "24:00:00", "12:00:60",
    "abc", "", "12:00", "12-00-00")

  private val uuids = Seq(
    "11111111-1111-1111-1111-111111111111' OR '1'='1",
    "11111111-1111-1111-1111-111111111111; DROP TABLE",
    "abc' OR 1=1", "not-a-uuid", "", "' UNION SELECT password--",
    "11111111-1111-1111-1111-11111111111Z")

  private val enums = Seq(
    "active' OR '1'='1", "active; DROP TABLE", "ACTIVE", "deleted", "",
    "active OR pending", "' UNION SELECT 'x'--")

  private val emails = Seq(
    "alice@example.com' OR '1'='1", "alice@example.com; DROP TABLE",
    "alice@example.com OR 1=1", "not-an-email", "",
    "'; DROP TABLE t; --@x.com", "<script>@x.com")

  private val strings = Seq(
    "alice' OR '1'='1", "alice'; DROP TABLE t--",
    "alice' UNION SELECT 1,'evil'--", "'; DROP TABLE t; --", "alice'--",
    "alice'/*", "%' OR 1=1 --", "alice' OR ''='", "\\' OR 1=1",
    "\";DROP TABLE t;", "'" * 50, "ALICE", "alice\\",
    "carol' UNION SELECT password FROM users--",
    "x' OR 'a'='a' OR 'x'='", "Robert');DROP TABLE Students;--",
    "1' OR id<>0--", "alice' OR length(name)>0--")

  private val corpora: Seq[(String, Seq[String])] = Seq(
    "int" -> numeric, "double" -> doubles, "boolean" -> booleans,
    "date" -> dates, "time" -> times, "uuid" -> uuids, "enum" -> enums,
    "email" -> emails, "string" -> strings)

  corpora.foreach { case (slug, payloads) =>
    test(s"$slug endpoint: ${payloads.size} injection payloads never leak") {
      payloads.foreach(p => expectNoLeak(fixtures(slug), p))
    }
  }

  test("legitimate values still match exactly one row (no over-defanging)") {
    val legit = Seq(
      "int" -> "2", "double" -> "1.5", "boolean" -> "true",
      "date" -> "2024-03-15", "time" -> "13:45:07",
      "uuid" -> "11111111-1111-1111-1111-111111111111",
      "enum" -> "active", "email" -> "alice@example.com",
      "string" -> "alice")
    legit.foreach { case (slug, v) =>
      assert(runLegit(fixtures(slug), v) == 1L, s"$slug with '$v'")
    }
  }

  test("pagination wrap with bound param returns the correct page") {
    // Seed 1..20; min_id=5 narrows to 16 rows; offset 10 limit 5 → 15..19.
    val ep = EndpointConfig(
      urlPath = "/lookup-int-paged",
      templateSource = "lookup_int_paged.sql",
      requestFields = Seq(field("min_id",
        ValidatorConfig("int", min = 0, max = 100000, preventSqlInjection = false))),
      requestFieldsValidation = false) // offset/limit arrive alongside
    val template =
      "SELECT id, 'x' AS label FROM range(1, 21) AS r(id) WHERE id >= {{ params.min_id }} ORDER BY id"
    val params = Map("min_id" -> "5", "limit" -> "5", "offset" -> "10")
    val df = TemplatePipeline.run(spark, ep, template, params)
    val (off, lim) = Paginator.params(params)
    val page = Paginator.paginate(df, off, lim, basePath = "/lookup-int-paged")
    assert(page.totalCount == 16)
    val ids = page.data.collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(15L, 16L, 17L, 18L, 19L))
    assert(page.next.contains("/lookup-int-paged?offset=15&limit=5")) // one more row remains
  }

  test("pagination injection attempt cannot leak the table") {
    val ep = EndpointConfig(
      urlPath = "/lookup-int-paged",
      templateSource = "lookup_int_paged.sql",
      requestFields = Seq(field("min_id",
        ValidatorConfig("int", min = 0, max = 100000, preventSqlInjection = false))))
    val template =
      "SELECT id, 'x' AS label FROM range(1, 21) AS r(id) WHERE id >= {{ params.min_id }} ORDER BY id"
    TemplatePipeline.prepare(ep, template, Map("min_id" -> "0 OR 1=1")) match {
      case Left(_) => () // strict int parse rejects — expected
      case Right((sql, args)) =>
        val n = spark.sql(sql, args).count()
        assert(n < 20, s"INJECTION LEAK: $n rows")
    }
  }

  test("prepared rewrite keeps sections and triple-brace on the text path") {
    // Sanity on the corpus premise: only the top-level double-brace param
    // became a '?'; the section body text is untouched.
    val ep = endpoint(fixtures("int"))
    val t = "SELECT 1 WHERE a = {{params.id}} {{#params.id}}AND b = {{params.id}}{{/params.id}}"
    val r = graft.template.PreparedRewriter.rewrite(t, ep.requestFields)
    assert(r.bindings.map(_.fieldName) == Vector("id"))
    assert(r.sql.contains("AND b = {{params.id}}"))
    // and the rendered section splices text (validated upstream)
    val rendered = Mustache.render(r.sql,
      graft.template.TemplateContext.forRequest(Map("id" -> "7")))
    assert(rendered.contains("AND b = 7"))
  }
}
