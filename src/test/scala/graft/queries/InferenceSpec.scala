package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Behavioral gates for the round-11 measurement tier, beyond the
  * hash gate's engine parity: the statistics must also satisfy their
  * own theorems — KS's D is zero on identical samples and maximal on
  * disjoint ones, bootstrap resampling is replay-deterministic with
  * the CI bracketing its median, exact quantiles equal a driver sort
  * of the same values, the equi-depth buckets are balanced to ±1 and
  * partition the corpus, and the privacy audit never leaks a
  * sensitive value into its output.
  */
class InferenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("inference-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("KS statistic is exactly 0 on identical samples, maximal on disjoint ones") {
    // drive the same arithmetic the gated query uses through
    // hand-built sample pairs via a brute-force driver ECDF
    def ksD(a: Seq[Double], b: Seq[Double]): Long = {
      val points = (a ++ b).distinct.sorted
      points.map { x =>
        val c1 = a.count(_ <= x).toLong
        val c2 = b.count(_ <= x).toLong
        math.abs(c1 * b.size.toLong - c2 * a.size.toLong)
      }.max
    }
    val s = Seq(1.0, 2.0, 3.0, 4.0)
    assert(ksD(s, s) == 0L)
    val lo = Seq(1.0, 2.0)
    val hi = Seq(10.0, 11.0, 12.0)
    assert(ksD(lo, hi) == lo.size.toLong * hi.size, "disjoint samples: D = n1*n2")

    // and the gated query's D agrees with the same brute force over
    // the real purchase split
    val row = SparkEntry.queries("ev26_ks_two_sample")(spark, sf).collect()(0)
    val p = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase")
      .select(
        (substring(md5(col("user_id").cast("string")), 1, 8) < "80000000")
          .as("c"),
        col("value"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1)))
    val d = ksD(p.filter(_._1).map(_._2).toSeq, p.filterNot(_._1).map(_._2).toSeq)
    assert(row.getAs[Long]("d_num") == d, "gated D diverges from brute force")
    assert(row.getAs[Long]("n1") + row.getAs[Long]("n2") == p.length)
  }

  test("bootstrap CI is replay-deterministic and brackets its own median") {
    val a = SparkEntry.queries("ev25_ab_lift_bootstrap")(spark, sf).collect()(0)
    val b = SparkEntry.queries("ev25_ab_lift_bootstrap")(spark, sf).collect()(0)
    assert(a == b, "resample must be bit-identical across runs")
    // replicates that empty an arm drop (possible at this tiny SF);
    // the CI ranks scale with the valid count
    val nReps = a.getAs[Long]("n_reps")
    assert(nReps > 50L && nReps <= 100L, s"implausible replicate count $nReps")
    val (lo, med, hi) = (a.getAs[Long]("lo95_mc"), a.getAs[Long]("med_mc"),
      a.getAs[Long]("hi95_mc"))
    assert(lo <= med && med <= hi, "order statistics out of order")
    assert(a.getAs[Boolean]("ci_covers_zero") == (lo <= 0 && 0 <= hi))
  }

  test("exact quantiles equal a driver sort; equi-depth buckets balance to ±1") {
    val vals = spark.read.parquet(s"$sf/events.parquet")
      .select("value").collect().map(_.getDouble(0)).sorted
    val n = vals.length.toLong
    def kth(p: Long): Double = vals(((p * n + 99) / 100 - 1).toInt)

    val q = SparkEntry.queries("ev27_exact_quantiles")(spark, sf).collect()(0)
    assert(q.getAs[Long]("n_rows") == n)
    assert(q.getAs[Double]("p50") == kth(50))
    assert(q.getAs[Double]("p90") == kth(90))
    assert(q.getAs[Double]("p99") == kth(99))

    val h = SparkEntry.queries("ev28_equidepth_histogram")(spark, sf).collect()
    assert(h.length == 8)
    assert(h.map(_.getAs[Long]("n_values")).sum == n, "buckets must partition")
    val sizes = h.map(_.getAs[Long]("n_values"))
    assert(sizes.max - sizes.min <= 1, s"buckets unbalanced: ${sizes.mkString(",")}")
    // boundaries are non-decreasing across buckets
    val los = h.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Double]("lo"))
    assert(los.zip(los.tail).forall { case (x, y) => x <= y })
  }

  test("per-source exact quantiles equal a per-group driver sort") {
    // the group-contiguous-rank trick (one global rank, in-group rank
    // = rk − min(rk)+1) must reproduce a literal per-group sort
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").length.toLong))
    val bySource = docs.groupBy(_._1).map { case (src, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      def kth(p: Long): Long = sorted(((p * n + 99) / 100 - 1).toInt)
      src -> ((n, kth(50), kth(95)))
    }
    val rows = SparkEntry.queries("token_quantiles_by_source")(spark, sf).collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val (n, p50, p95) = bySource(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("p50_tokens") == p50,
        s"${r.getAs[String]("source")}: p50 diverges from the driver sort")
      assert(r.getAs[Long]("p95_tokens") == p95,
        s"${r.getAs[String]("source")}: p95 diverges from the driver sort")
    }

    // the equi-depth mate: every source's 4 buckets partition the
    // group to ±1 balance with non-decreasing boundaries
    val buckets = SparkEntry.queries("token_buckets_by_source")(spark, sf)
      .collect().groupBy(_.getAs[String]("source"))
    assert(buckets.keySet == bySource.keySet)
    buckets.foreach { case (src, bs) =>
      val sizes = bs.map(_.getAs[Long]("n_docs"))
      assert(sizes.sum == bySource(src)._1, s"$src buckets must partition")
      assert(sizes.max - sizes.min <= 1, s"$src unbalanced: ${sizes.mkString(",")}")
      val los = bs.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Long]("lo"))
      assert(los.zip(los.tail).forall { case (x, y) => x <= y },
        s"$src boundaries not monotone")
    }
  }

  test("nDCG is bounded by 1 and the ideal ranking dominates the served one") {
    val rows = SparkEntry.queries("retrieval_eval_ndcg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getAs[Long]("dcg_x1e6"),
        r.getAs[Long]("idcg_x1e6"), r.getAs[Long]("ndcg_ppm"))
      assert(dcg <= idcg, s"${r.getAs[String]("term")}: DCG exceeds the ideal")
      assert(ndcg >= 0 && ndcg <= 1000000L)
      assert(ndcg == dcg * 1000000L / idcg)
    }
  }

  test("CUSUM identity equals the max-recursion; planted shift detected, peak matches") {
    // the prefix-minus-running-min identity the query rides vs the
    // textbook recursion S_i = max(0, S_{i-1} + (H·n_i − total)),
    // in the same cross-multiplied integer units
    def direct(ns: Seq[Long]): Seq[Long] = {
      val h = ns.length.toLong
      val total = ns.sum
      ns.scanLeft(0L)((s, n) => math.max(0L, s + h * n - total)).tail
    }
    def viaIdentity(ns: Seq[Long]): Seq[Long] = {
      val h = ns.length.toLong
      val total = ns.sum
      val prefix = ns.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (cum, i) => h * cum - total * (i + 1) }
      prefix.zipWithIndex.map { case (p, i) =>
        p - math.min(0L, prefix.take(i + 1).min) }
    }
    // planted 10× rate shift in the last quarter
    val planted = Seq.fill(75)(10L) ++ Seq.fill(25)(100L)
    assert(direct(planted) == viaIdentity(planted), "identity diverges")
    val s = direct(planted)
    assert(s.max > 24 * planted.sum, "planted shift must trip the detection rule")
    assert(s.indexOf(s.max) >= 75, "peak must land after the shift")
    // steady series: no detection
    val steady = Seq.fill(100)(10L)
    assert(direct(steady).max <= 24 * steady.sum)

    // live replay: the gated query's peak equals the driver recursion
    // (events via Tables.table — the raw parquet ts is TIMESTAMP(NANOS)
    // read as long under nanosAsLong; register normalizes it)
    val hours = graft.Tables.table(spark, sf, "events")
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")).as("hr"))
      .count().orderBy("hr").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    val cus = direct(hours.map(_._2).toSeq)
    val peakIdx = cus.indexOf(cus.max)
    val row = SparkEntry.queries("ev31_cusum_changepoint")(spark, sf).collect()(0)
    assert(row.getAs[Long]("cusum_peak") == cus.max)
    assert(row.getAs[java.sql.Timestamp]("peak_hr") == hours(peakIdx)._1)
  }

  test("per-source KS equals a per-group driver brute force; verdict matches the rule") {
    // the gated ks_by_source pipeline (one count-frame pass, dense
    // source×value grid, cross-multiplied D) vs the naive per-group
    // ECDF computed entirely on the driver in exact BigInt arithmetic
    val docs = graft.Tables.table(spark, sf, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    val points = docs.map(_._2).distinct.sorted
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val mine = rows.map(_._2)
      val ns = mine.length.toLong
      val nr = n - ns
      val dNum = points.map { x =>
        val cs = BigInt(mine.count(_ <= x))
        val cr = BigInt(docs.count(_._2 <= x)) - cs
        (cs * nr - cr * ns).abs
      }.max
      val dPpm = (dNum * 1000000 / (BigInt(ns) * nr)).toLong
      val shifted = BigInt(dPpm) * dPpm * ns * nr >
        BigInt(1844164) * (ns + nr) * 1000000
      src -> ((ns, dPpm, shifted))
    }
    val got = SparkEntry.queries("ks_by_source")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == expected, s"per-source KS diverges:\n got=$got\n exp=$expected")
    // behavioral anchor: a planted disjoint source must max out — run
    // the same Spark pipeline's arithmetic on a synthetic two-source
    // frame where source 'hi' sits entirely above 'lo'
    val synth = (1 to 50).map(i => ("lo", i.toLong)) ++
      (1 to 50).map(i => ("hi", 1000L + i))
    val sNs = 50L; val sNr = 50L
    val dDisjoint = synth.map(_._2).distinct.sorted.map { x =>
      val cs = BigInt(synth.count(p => p._1 == "lo" && p._2 <= x))
      val cr = BigInt(synth.count(p => p._1 != "lo" && p._2 <= x))
      (cs * sNr - cr * sNs).abs
    }.max
    assert((dDisjoint * 1000000 / (BigInt(sNs) * sNr)).toLong == 1000000L,
      "disjoint supports must give D = 1")
  }

  test("privacy audit output carries no sensitive value and partitions the table") {
    val out = SparkEntry.queries("kanon_privacy_audit")(spark, sf)
    // suppression by construction: classes + sizes + flags only
    assert(out.columns.toSet ==
      Set("c_mktsegment", "bal_bucket", "k_size", "l_distinct",
        "k_violation", "l_violation"))
    val rows = out.collect()
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.map(_.getAs[Long]("k_size")).sum == total,
      "QI classes must partition the customer table")
    assert(rows.forall(r => r.getAs[Long]("l_distinct") <= r.getAs[Long]("k_size")))
    assert(rows.forall(r =>
      (r.getAs[Long]("k_size") < 10) == r.getAs[Boolean]("k_violation")))
  }
}
