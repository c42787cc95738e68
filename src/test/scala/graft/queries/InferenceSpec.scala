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
