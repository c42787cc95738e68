package graft.functions

import scala.util.chaining._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Theorem gates for the q-digest aggregate (the MgTopKSpec
  * discipline, quantile edition): (1) RANK ERROR BOUND — any reported
  * quantile value's true rank is within b·⌊n/k⌋ of the target, no
  * matter how the input is partitioned; (2) WINDOW CONTAINMENT — the
  * value window the gated two-pass consumer scans provably contains
  * the true quantile value (the property qdigest_verified_deciles'
  * exactness rests on); (3) below k items the digest is EXACT; (4)
  * the summary stays ≤ 3k nodes and its total equals the exact row
  * count. Partitioning is adversarial: digests may DIFFER across
  * layouts (compression order differs) — only the theorems are
  * stable. */
class QDigestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val K = 256
  private val B = 16

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]").appName("qdigest-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // adversarial value stream: heavy repetition at a few points, a
  // quadratic sweep, and a uniform band — 30k rows in [0, 65536)
  private def values: Seq[Long] =
    Seq.fill(4000)(100L) ++ Seq.fill(3000)(40000L) ++
      (0 until 15000).map(i => ((i.toLong * i) % 60000)) ++
      (0 until 8000).map(i => 20000L + (i % 5000))

  private def digestOf(parts: Int, sorted: Boolean): Map[Long, Long] = {
    val s2 = spark
    import s2.implicits._
    val base = (if (sorted) values.sorted else values).toDF("v")
    base.repartition(parts)
      .agg(expr(s"qdigest(v, $K, $B)")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .pipe(QDigest.entriesOfRows)
  }

  private lazy val exactSorted: Array[Long] = values.sorted.toArray

  /** True rank displacement of `v` from `target`: 0 when target falls
    * inside v's occupied rank interval. */
  private def rankErr(v: Long, target: Long): Long = {
    val lo = exactSorted.count(_ < v) + 1L
    val hi = exactSorted.count(_ <= v)
    if (target < lo) lo - target else if (target > hi) target - hi else 0L
  }

  test("rank error bound b*floor(n/k) holds under adversarial partitioning") {
    val n = values.size.toLong
    val bound = B.toLong * (n / K)
    for (parts <- Seq(1, 3, 16); sorted <- Seq(true, false)) {
      val d = digestOf(parts, sorted)
      assert(QDigest.totalOf(d) == n, s"digest total lost rows ($parts/$sorted)")
      assert(d.size <= 3 * K, s"digest size ${d.size} exceeds 3k ($parts/$sorted)")
      for (p <- 1 to 9) {
        val target = (p * n + 9) / 10
        val est = QDigest.valueAtRank(d, B, target)
        val err = rankErr(est, target)
        assert(err <= bound,
          s"decile $p rank error $err > bound $bound (parts=$parts sorted=$sorted)")
      }
    }
  }

  test("the two-pass value window contains the true quantile (containment theorem)") {
    val n = values.size.toLong
    for (parts <- Seq(1, 3, 16); sorted <- Seq(true, false)) {
      val d = digestOf(parts, sorted)
      for (p <- 1 to 9) {
        val target = (p * n + 9) / 10
        val trueV = exactSorted((target - 1).toInt)
        val (lo, hi) = QDigest.valueWindow(d, B, K, target)
        assert(trueV >= lo && trueV <= hi,
          s"decile $p true value $trueV escapes window [$lo,$hi] " +
            s"(parts=$parts sorted=$sorted)")
      }
    }
  }

  test("driver-side partial merge upholds the same bound (mergeable-summaries)") {
    val s2 = spark
    import s2.implicits._
    val n = values.size.toLong
    val bound = B.toLong * (n / K)
    // three partial digests over disjoint slices, merged on the driver
    // — the streaming quantileMonitorStream absorb path
    val slices = Seq(values.take(9000), values.slice(9000, 21000), values.drop(21000))
    val standing = scala.collection.mutable.HashMap.empty[Long, Long]
    slices.foreach { sl =>
      val part = sl.toDF("v").agg(expr(s"qdigest(v, $K, $B)")).collect()(0)
        .getSeq[org.apache.spark.sql.Row](0)
        .pipe(QDigest.entriesOfRows)
      QDigest.mergeInto(standing, part, K, B)
    }
    assert(QDigest.totalOf(standing) == n)
    assert(standing.size <= 3 * K)
    for (p <- 1 to 9) {
      val target = (p * n + 9) / 10
      val err = rankErr(QDigest.valueAtRank(standing.toMap, B, target), target)
      assert(err <= bound, s"merged decile $p error $err > $bound")
    }
    // rankLowerBound brackets the true rank from below within the bound
    for (v <- Seq(100L, 20000L, 40000L)) {
      val est = QDigest.rankLowerBound(standing.toMap, B, v)
      val trueRank = exactSorted.count(_ <= v).toLong
      assert(est <= trueRank && trueRank - est <= bound,
        s"rankLowerBound($v)=$est vs true $trueRank (bound $bound)")
    }
  }

  test("below k items the digest is exact; out-of-universe values clamp") {
    val s2 = spark
    import s2.implicits._
    val small = Seq(5L, 1L, 9L, 9L, 3L, 7L, 2L, 2L, 2L, 8L)
    val d = small.toDF("v").repartition(3)
      .agg(expr(s"qdigest(v, $K, $B)")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .pipe(QDigest.entriesOfRows)
    val sorted = small.sorted
    for (p <- 1 to 9) {
      val target = (p * small.size + 9) / 10
      assert(QDigest.valueAtRank(d, B, target) == sorted(target.toInt - 1),
        s"sub-k digest must be exact at decile $p")
    }
    // clamping: negatives land at 0, values past 2^b at the max leaf
    val c = Seq(-5L, -1L, (1L << B) + 100L).toDF("v")
      .agg(expr(s"qdigest(v, $K, $B)")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .pipe(QDigest.entriesOfRows)
    assert(QDigest.totalOf(c) == 3L)
    assert(QDigest.valueAtRank(c, B, 1) == 0L)
    assert(QDigest.valueAtRank(c, B, 3) == (1L << B) - 1L)
    // nulls are skipped like every aggregate
    val withNulls = Seq[java.lang.Long](1L, null, 3L).toDF("v")
      .agg(expr(s"qdigest(v, $K, $B)")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .pipe(QDigest.entriesOfRows)
    assert(QDigest.totalOf(withNulls) == 2L)
  }

  test("qdigest_merge re-aggregates stored summaries within the same rank bound") {
    // the stored-artifact path: per-group digests (the persisted layer)
    // re-aggregated through the SQL merge aggregate must satisfy the
    // same rank-error and window-containment guarantees as a direct
    // whole-corpus sketch — and never touch the raw rows again
    val s2 = spark
    import s2.implicits._
    val n = values.size.toLong
    val bound = B.toLong * (n / K)
    val df = values.zipWithIndex.map { case (v, i) => (v, i % 7) }.toDF("v", "g")
    val merged = df.groupBy("g")
      .agg(expr(s"qdigest(v, $K, $B)").as("qd"))
      .agg(expr(s"qdigest_merge(qd, $K, $B)")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .pipe(QDigest.entriesOfRows)
    assert(QDigest.totalOf(merged) == n, "merge lost rows")
    assert(merged.size <= 3 * K)
    for (p <- 1 to 9) {
      val target = (p * n + 9) / 10
      val err = rankErr(QDigest.valueAtRank(merged, B, target), target)
      assert(err <= bound, s"rollup decile $p error $err > $bound")
      val trueV = exactSorted((target - 1).toInt)
      val (lo, hi) = QDigest.valueWindow(merged, B, K, target)
      assert(trueV >= lo && trueV <= hi,
        s"rollup decile $p true value $trueV escapes [$lo,$hi]")
    }
    // null digests are skipped like every aggregate input
    val withNull = Seq((Some(Seq((QDigest.leafOf(5L, B), 1L))), 0), (None, 1))
    val nd = withNull.toDF("qd", "g")
      .selectExpr("CAST(qd AS array<struct<node: bigint, cnt: bigint>>) AS qd")
      .agg(expr(s"qdigest_merge(qd, $K, $B)")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(QDigest.totalOf(QDigest.entriesOfRows(nd)) == 1L)
    // a (k, b) mismatch with the stored digests is a DIRECTED error,
    // never silent corruption: a node deeper than this call's b means
    // the summaries were sketched at a larger universe
    val deepId = QDigest.leafOf(5L, B + 4) // depth B+4 > B
    val e = intercept[Throwable] {
      Seq(Seq((deepId, 1L))).toDF("qd")
        .selectExpr("CAST(qd AS array<struct<node: bigint, cnt: bigint>>) AS qd")
        .agg(expr(s"qdigest_merge(qd, $K, $B)")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("different (k, b)")),
      s"expected the directed universe-mismatch error, got: $e")
  }

  test("encode/decode round-trips the digest byte image") {
    val d = digestOf(3, sorted = false)
    val back = QDigest.decode(QDigest.encode(d)).toMap
    assert(back == d)
  }

  test("verified deciles stay EXACT when raw values escape the sketch universe") {
    // r14 advice (medium): the sketch clamps to [0, 2^b) but the exact
    // pass runs on RAW values — a window end pinned at a universe
    // boundary must open to ±infinity or the boundary deciles silently
    // vanish / misplace. Values straddle the universe on both sides.
    val s2 = spark
    import s2.implicits._
    val smallB = 8 // universe [0, 256)
    val vals: Seq[Long] =
      Seq.fill(10)(-7L) ++ (1L to 50L) ++ Seq.fill(30)(1000L) ++ Seq.fill(10)(5000L)
    val docs = vals.toDF("n_chars")
    val entries = QDigest.entriesOfRows(
      docs.agg(expr(s"qdigest(n_chars, 64, $smallB)")).collect()(0)
        .getSeq[org.apache.spark.sql.Row](0))
    val got = graft.queries.TextQueries
      .verifiedDecilesFrom(s2, docs, entries, 64, smallB)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted.toArray
    val n = vals.size
    assert(got.size == 9, s"deciles vanished: only ${got.keys.toSeq.sorted} present")
    for (p <- 1 to 9) {
      val target = (p * n + 9) / 10
      assert(got(p.toLong) == sorted(target - 1),
        s"decile $p: got ${got(p.toLong)}, exact ${sorted(target - 1)}")
    }
  }

  test("emitted image leads with a (k, b) header; merge verifies it BOTH ways") {
    val s2 = spark
    import s2.implicits._
    val img = Seq(1L, 2L, 3L).toDF("v")
      .agg(expr(s"qdigest(v, $K, $B)")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(img.head.getLong(0) == QDigest.HeaderNode)
    assert(QDigest.headerParams(img.head.getLong(1)) == (K, B))
    // entriesOfRows strips it — totals never double-count the header
    assert(QDigest.totalOf(QDigest.entriesOfRows(img)) == 3L)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // the r13 advice direction: a digest sketched at a SMALLER b was
    // undetectable by the depth check alone — the header catches it
    for ((k2, b2) <- Seq((K, B - 4), (K * 2, B))) {
      val persist = Seq(1L, 2L, 3L).toDF("v")
        .agg(expr(s"qdigest(v, $k2, $b2)").as("qd"))
      val e = intercept[Throwable] {
        persist.agg(expr(s"qdigest_merge(qd, $K, $B)")).collect()
      }
      assert(messages(e).exists(_.contains(s"(k=$k2, b=$b2)")),
        s"expected the directed header-mismatch error for ($k2,$b2), got: $e")
    }
    // matching parameters round-trip: merge of the emitted image is
    // itself a valid headered image with the same total
    val rt = Seq(1L, 2L, 3L).toDF("v")
      .agg(expr(s"qdigest(v, $K, $B)").as("qd"))
      .agg(expr(s"qdigest_merge(qd, $K, $B)")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(rt.head.getLong(0) == QDigest.HeaderNode)
    assert(QDigest.totalOf(QDigest.entriesOfRows(rt)) == 3L)
  }
}
