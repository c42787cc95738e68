package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin (union + keyed window, no join node) and RangeJoin (bin
  * bucketing, no nested-loop node) — semantics on hand-built edges and
  * the plan-shape properties that make them scale.
  */
class AsOfRangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("asof-range-join-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("asof backward: latest right <= left per key, null when none") {
    val ss = spark
    import ss.implicits._
    val trades = Seq(
      (1L, 100L, "t-a"), // quote at 90 matches (not 110)
      (1L, 110L, "t-b"), // quote at exactly 110 matches (<= semantics)
      (1L, 50L, "t-c"),  // before every quote -> null
      (2L, 500L, "t-d"), // other key: its own quotes only
      (3L, 10L, "t-e")   // key with no quotes at all -> null
    ).toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, 90L, 1.5, 11L),
      (1L, 110L, 2.5, 12L),
      (1L, 200L, 9.9, 13L), // after every trade: never matched
      (2L, 400L, 7.0, 14L)
    ).toDF("k", "t", "px", "qid")

    val out = AsOfJoin.backward(trades, quotes, "k", "t", "t",
      payload = Seq("px" -> "px", "qid" -> "qid"), tieBreak = Some("qid"))
      .select("trade", "px", "qid").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out("t-a") == ((Some(1.5), Some(11L))))
    assert(out("t-b") == ((Some(2.5), Some(12L))))
    assert(out("t-c") == ((None, None)))
    assert(out("t-d") == ((Some(7.0), Some(14L))))
    assert(out("t-e") == ((None, None)))
  }

  test("asof: equal-time right rows resolve by tieBreak; payload columns stay row-consistent") {
    val ss = spark
    import ss.implicits._
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "l")
    // two right rows at the same time; the later one carries a NULL px —
    // per-column last(ignoreNulls) would stitch px=1.0 with qid=22
    val right = Seq(
      (1L, 100L, Some(1.0), 21L),
      (1L, 100L, None: Option[Double], 22L)
    ).toDF("k", "t", "px", "qid")
    val r = AsOfJoin.backward(left, right, "k", "t", "t",
      payload = Seq("px" -> "px", "qid" -> "qid"), tieBreak = Some("qid"))
      .select("px", "qid").collect().head
    assert(r.isNullAt(0) && r.getLong(1) == 22L,
      s"expected the single greatest-tie row (null px, qid 22), got $r")
  }

  test("asof: numeric tieBreak orders numerically across digit-count boundaries") {
    val ss = spark
    import ss.implicits._
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "l")
    // "9" > "10" lexicographically — a string-cast tie column would
    // pick qid 9; numeric ordering must pick qid 10
    val right = Seq((1L, 100L, 9.0, 9L), (1L, 100L, 10.0, 10L))
      .toDF("k", "t", "px", "qid")
    val r = AsOfJoin.backward(left, right, "k", "t", "t",
      payload = Seq("px" -> "px", "qid" -> "qid"), tieBreak = Some("qid"))
      .select("qid").collect().head
    assert(r.getLong(0) == 10L, s"expected numeric-greatest qid 10, got $r")
  }

  test("range join: negative axis values bin exactly (floor, not truncate)") {
    val ss = spark
    import ss.implicits._
    val points = Seq((-9L, "pn9"), (-1L, "pn1"), (0L, "p0")).toDF("p", "name")
    val intervals = Seq((-10L, 0L, "w-neg"), (0L, 5L, "w-pos")).toDF("s", "e", "w")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", binWidth = 8L)
      .select("w", "name").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("w-neg", "pn9"), ("w-neg", "pn1"), ("w-pos", "p0")))
  }

  test("asof backward equals the naive per-left greatest-right reference on random data") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val leftRows = Seq.tabulate(120)(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong))
      val rightRows = Seq.tabulate(150)(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong))
      val got = AsOfJoin.backward(
        leftRows.toDF("k", "t", "lid"), rightRows.toDF("k", "t", "rid"),
        "k", "t", "t", payload = Seq("rid" -> "rid"), tieBreak = Some("rid"))
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // independent reference: greatest (t, rid) right row per left
      val expected = leftRows.map { case (k, lt, lid) =>
        val m = rightRows.filter(r => r._1 == k && r._2 <= lt)
        lid -> (if (m.isEmpty) -1L else m.maxBy(r => (r._2, r._3))._3)
      }.toMap
      assert(got == expected)
    }
  }

  test("asof plan has no join node: one shuffle on the key, then a window") {
    val ss = spark
    import ss.implicits._
    val left = (1 to 100).map(i => (i.toLong % 10, i.toLong, s"l$i")).toDF("k", "t", "l")
    val right = (1 to 100).map(i => (i.toLong % 10, i.toLong, i * 1.0)).toDF("k", "t", "px")
    val plan = AsOfJoin.backward(left, right, "k", "t", "t", Seq("px" -> "px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected a window node:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 key shuffle, got $exchanges:\n$plan")
  }

  test("range join: half-open bounds, multi-bin intervals, empty/degenerate intervals") {
    val ss = spark
    import ss.implicits._
    val points = Seq((0L, "p0"), (9L, "p9"), (10L, "p10"), (25L, "p25"), (99L, "p99"))
      .toDF("p", "name")
    val intervals = Seq(
      (0L, 10L, "w-a"),   // [0,10): p0, p9 — NOT p10 (exclusive end)
      (9L, 26L, "w-b"),   // spans 3 bins at width 8: p9, p10, p25
      (50L, 50L, "w-c"),  // degenerate: dropped
      (200L, 210L, "w-d") // matches nothing
    ).toDF("s", "e", "w")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", binWidth = 8L)
      .select("w", "name").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("w-a", "p0"), ("w-a", "p9"),
      ("w-b", "p9"), ("w-b", "p10"), ("w-b", "p25")))
  }

  test("range join equals the naive theta join, with no nested-loop in the plan") {
    val ss = spark
    import ss.implicits._
    val points = (0L until 2000L).map(i => (i * 7 % 1000, i)).toDF("p", "pid")
    val intervals = (0L until 40L).map(i => (i * 25, i * 25 + 60, i)).toDF("s", "e", "iid")
    val binned = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", binWidth = 64L)
    val expected = points.crossJoin(intervals)
      .filter("p >= s AND p < e").select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = binned.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"binned=${got.size} naive=${expected.size}")
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi join:\n$plan")
  }
}
