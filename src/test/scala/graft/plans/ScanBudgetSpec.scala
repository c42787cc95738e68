package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Both directions of the scan-budget guard: a CTE-inlined SQL
  * spelling that re-executes a shared corpus subtree blows the budget
  * with the directed error (naming the relation and the checkpoint
  * fix), while the library's memoized/checkpointed builds — and the
  * same query with the guard off — pass untouched. The fixture query
  * is the r8 KL-defect shape itself: one CTE referenced by several
  * downstream aggregates.
  */
class ScanBudgetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("scan-budget-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // the KL-defect shape: `tok` is written once, referenced four times —
  // Spark inlines it, so the optimized plan scans documents 4x
  private val inliningSql =
    """WITH tok AS (
      |  SELECT source, term FROM documents
      |  LATERAL VIEW explode(split(text, ' ')) t AS term),
      |st AS (SELECT source, term, count(*) AS c FROM tok GROUP BY source, term),
      |ns AS (SELECT source, count(*) AS n_s FROM tok GROUP BY source),
      |g AS (SELECT term, count(*) AS c_t FROM tok GROUP BY term),
      |n AS (SELECT count(*) AS total FROM tok)
      |SELECT st.source, st.term, st.c, ns.n_s, g.c_t, n.total
      |FROM st JOIN ns USING (source) JOIN g USING (term) CROSS JOIN n
      |LIMIT 5""".stripMargin

  test("a CTE-inlined multi-scan query fails the budget with the directed error") {
    spark.conf.set(ScanBudgetRule.ConfKey, "3")
    try {
      val e = intercept[Throwable] {
        graft.Tables.sql(spark, sf, inliningSql).collect()
      }
      // Spark may wrap the rule's exception; the directed text survives
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("scan budget exceeded") &&
        msg.contains("localCheckpoint"),
        s"wrong error: $e")
    } finally spark.conf.set(ScanBudgetRule.ConfKey, "0")
  }

  test("re-scans hiding inside subquery expressions count against the budget") {
    // the endpoint-SQL shape: the corpus appears once in the FROM and
    // twice more inside EXISTS / NOT EXISTS — three scans, budget two
    val sql =
      """SELECT d.doc_id FROM documents d
        |WHERE EXISTS (SELECT 1 FROM documents x WHERE x.doc_id = d.doc_id + 1)
        |  AND NOT EXISTS (SELECT 1 FROM documents y WHERE y.doc_id = d.doc_id + 2)
        |LIMIT 3""".stripMargin
    spark.conf.set(ScanBudgetRule.ConfKey, "2")
    try {
      val e = intercept[Throwable] { graft.Tables.sql(spark, sf, sql).collect() }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("scan budget exceeded"), s"wrong error: $e")
    } finally spark.conf.set(ScanBudgetRule.ConfKey, "0")
    assert(graft.Tables.sql(spark, sf, sql).collect().nonEmpty)
  }

  test("the same query passes with the guard off (default)") {
    assert(graft.Tables.sql(spark, sf, inliningSql).collect().length == 5)
  }

  test("the memoized library build passes under the same budget") {
    spark.conf.set(ScanBudgetRule.ConfKey, "3")
    try {
      // kl_divergence_sources is the query whose SQL form the fixture
      // mimics — its Spark build checkpoints the shared (source, term)
      // frame, so every downstream aggregate reads the standing RDD
      val rows = graft.SparkEntry.queries("kl_divergence_sources")(spark, sf)
        .collect()
      assert(rows.nonEmpty)
    } finally spark.conf.set(ScanBudgetRule.ConfKey, "0")
  }
}
