package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates — the documented 100 TB swaps for the exact
  * gated queries (a7 percentiles, count DISTINCT): HLL++ and t-digest
  * are MERGEABLE partial aggregates, so they combine map-side and
  * shuffle O(sketch) bytes per group instead of per-value state. These
  * tests pin (1) the error actually stays inside the configured bound
  * against the exact answer, and (2) the plan keeps the partial-agg
  * shape that makes the sketch scale.
  */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]").appName("sketch-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("approx_count_distinct stays within the configured rsd of exact") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val exact = o.select(countDistinct("o_custkey")).head.getLong(0)
    val approx = o.select(approx_count_distinct("o_custkey", 0.02)).head.getLong(0)
    val rel = math.abs(approx.toDouble - exact) / exact
    assert(rel < 0.06, s"approx $approx vs exact $exact (rel err $rel)")
  }

  test("approx distinct is a mergeable partial aggregate in the plan") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val p = o.groupBy("o_orderpriority")
      .agg(approx_count_distinct("o_custkey"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_approx_count_distinct"),
      s"no map-side sketch combine:\n$p")
  }

  test("approx_percentile lands within 2% of the exact interpolated quantile") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val exact = o.select(expr("percentile(o_totalprice, 0.9)")).head.getDouble(0)
    val approx = o.select(expr("approx_percentile(o_totalprice, 0.9, 10000)"))
      .head.getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx $approx vs exact $exact")
  }
}
