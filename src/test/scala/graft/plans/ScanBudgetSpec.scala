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
    } finally spark.conf.unset(ScanBudgetRule.ConfKey)
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
    } finally spark.conf.unset(ScanBudgetRule.ConfKey)
    assert(graft.Tables.sql(spark, sf, sql).collect().nonEmpty)
  }

  test("the same query passes with the guard off (key unset = inert rule)") {
    // NOTE: since r12 the guard is DEFAULT-ON for library-built
    // sessions (GraftSession sets the key to 4; GraftBootstrap.serve
    // sets it on budget-less serving sessions) — but the rule itself
    // stays inert when the key is absent, so embedding the extensions
    // into a foreign session never changes that session's behavior
    // uninvited. This spec's session is such a foreign session.
    assert(spark.conf.getOption(ScanBudgetRule.ConfKey).isEmpty)
    assert(graft.Tables.sql(spark, sf, inliningSql).collect().length == 5)
  }

  test("partition-pruned slices are distinct scans; identical slices still accumulate") {
    // the served-ANN shape: one cell-partitioned relation read by many
    // branches, each pruned to its own `cell IN (…)` slice — sanctioned
    // at any branch count. The same slice repeated must still count.
    val ss = spark
    import ss.implicits._
    val root = java.nio.file.Files.createTempDirectory("budget_part").toString
    (0 until 100).map(i => (i.toLong, i % 8, s"p$i")).toDF("id", "cell", "payload")
      .write.partitionBy("cell").parquet(s"$root/t")
    def slice(c: Int) = spark.read.parquet(s"$root/t").filter($"cell" === c)
    spark.conf.set(ScanBudgetRule.ConfKey, "3")
    try {
      // six DISTINCT slices union — passes under budget 3
      val six = (0 until 6).map(slice).reduce(_ unionByName _)
      assert(six.count() > 0)
      // the SAME slice four times — identical partition predicate, so
      // the occurrences accumulate and the budget fires
      val same = (0 until 4).map(_ => slice(5)).reduce(_ unionByName _)
      val e = intercept[Throwable] { same.count() }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("scan budget exceeded"), s"wrong error: $e")
      // mixed-conjunct bypass (review catch): per-consumer DATA
      // predicates merged into the slice predicate's And must NOT
      // differentiate the key — four re-scans of slice 5, each with
      // its own data filter, still accumulate
      val mixed = (0 until 4)
        .map(c => slice(5).filter($"id" > c))
        .reduce(_ unionByName _)
      val e3 = intercept[Throwable] { mixed.count() }
      val msg3 = Option(e3.getMessage).getOrElse("") +
        Option(e3.getCause).map(_.getMessage).getOrElse("")
      assert(msg3.contains("scan budget exceeded"),
        s"per-consumer data conjuncts bypassed the slice budget: $e3")
      // an UNPARTITIONED relation gets no slice exemption from its
      // data filters: four differently-filtered scans still accumulate
      (0 until 100).map(i => (i.toLong, s"q$i")).toDF("id", "payload")
        .write.parquet(s"$root/flat")
      val flat = (0 until 4)
        .map(c => spark.read.parquet(s"$root/flat").filter($"id" % 8 === c))
        .reduce(_ unionByName _)
      val e2 = intercept[Throwable] { flat.count() }
      val msg2 = Option(e2.getMessage).getOrElse("") +
        Option(e2.getCause).map(_.getMessage).getOrElse("")
      assert(msg2.contains("scan budget exceeded"), s"wrong error: $e2")
    } finally spark.conf.unset(ScanBudgetRule.ConfKey)
  }

  test("an alias that shadows a partition column's NAME is not a slice (ExprId keying)") {
    // r12 ADVICE: slice classification by column NAME could be
    // shadowed — a Project aliasing a DATA expression to the partition
    // column's name would hand every re-scan its own slice key and
    // silently bypass the budget. Classification now resolves the
    // conjunct's references by ExprId against the relation's actual
    // partition attributes, remapping through Project alias lists.
    val ss = spark
    import ss.implicits._
    val root = java.nio.file.Files.createTempDirectory("budget_alias").toString
    (0 until 100).map(i => (i.toLong, i % 8, s"p$i")).toDF("id", "cell", "payload")
      .write.partitionBy("cell").parquet(s"$root/t")
    spark.conf.set(ScanBudgetRule.ConfKey, "3")
    try {
      // four re-scans, each filtered on an alias NAMED like the
      // partition column but computed from a data column — these are
      // data predicates and must accumulate on the bare path key
      def shadowed(c: Int) = spark.read.parquet(s"$root/t")
        .select($"id", ($"id" % 8).cast("int").as("cell"), $"payload")
        .filter($"cell" === c)
      val e = intercept[Throwable] {
        (0 until 4).map(shadowed).reduce(_ unionByName _).count()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("scan budget exceeded"),
        s"alias shadowing bypassed the budget: $e")
      // the remap's positive direction: a RENAMED real partition
      // attribute still classifies as a slice — six distinct slices
      // through the alias pass under budget 3
      def renamed(c: Int) = spark.read.parquet(s"$root/t")
        .select($"cell".as("c2"), $"id").filter($"c2" === c)
      assert((0 until 6).map(renamed).reduce(_ unionByName _).count() > 0)
    } finally spark.conf.unset(ScanBudgetRule.ConfKey)
  }

  test("violations feed the metrics counter and last-violation gauge in both modes") {
    val before = ScanBudgetRule.Metrics.violations
    spark.conf.set(ScanBudgetRule.ConfKey, "3")
    try {
      spark.conf.set(ScanBudgetRule.ModeKey, "warn")
      assert(graft.Tables.sql(spark, sf, inliningSql).collect().length == 5)
      // the optimizer's fixed-point driver may evaluate a plan more
      // than once in warn mode, so the counter is a monotone signal,
      // not a per-query count — assert direction, not arity
      assert(ScanBudgetRule.Metrics.violations > before)
      val v = ScanBudgetRule.Metrics.lastViolation.get
      assert(v.mode == "warn" && v.scans > 3 && v.budget == 3)
      assert(v.relation.contains("documents"))
      // fail mode records too (the 422 an operator correlates with)
      spark.conf.set(ScanBudgetRule.ModeKey, "fail")
      val mid = ScanBudgetRule.Metrics.violations
      intercept[Throwable] { graft.Tables.sql(spark, sf, inliningSql).collect() }
      assert(ScanBudgetRule.Metrics.violations > mid)
      assert(ScanBudgetRule.Metrics.lastViolation.get.mode == "fail")
      // the metrics JSON the server serves is well-formed
      val json = ScanBudgetRule.Metrics.toJson
      assert(json.contains("\"violations\":") && json.contains("\"relation\":"))
    } finally {
      spark.conf.unset(ScanBudgetRule.ConfKey)
      spark.conf.unset(ScanBudgetRule.ModeKey)
    }
  }

  test("warn mode logs instead of failing; a typo'd mode still fails closed") {
    spark.conf.set(ScanBudgetRule.ConfKey, "3")
    try {
      spark.conf.set(ScanBudgetRule.ModeKey, "warn")
      // same over-budget plan as the fail-direction test: runs through
      assert(graft.Tables.sql(spark, sf, inliningSql).collect().length == 5)
      // an unrecognized mode must NOT silently disable the guard
      spark.conf.set(ScanBudgetRule.ModeKey, "observe")
      val e = intercept[Throwable] {
        graft.Tables.sql(spark, sf, inliningSql).collect()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("scan budget exceeded"), s"wrong error: $e")
    } finally {
      spark.conf.unset(ScanBudgetRule.ConfKey)
      spark.conf.unset(ScanBudgetRule.ModeKey)
    }
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
    } finally spark.conf.unset(ScanBudgetRule.ConfKey)
  }
}
