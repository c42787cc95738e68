package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("vector-ops-spec")
      .withExtensions(GraftFunctions.register)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("dot_f64 matches sequential double arithmetic") {
    val row = spark.sql(
      "SELECT dot_f64(array(1.0D, 2.0D, 3.0D), array(4.0D, 0.5D, -2.0D)) AS d")
      .collect().head
    assert(row.getDouble(0) == (1.0 * 4.0 + 2.0 * 0.5 + 3.0 * (-2.0)))
  }

  test("tokens_in_set native expression: multiplicity, nulls, equivalence to filter-IN") {
    val r = spark.sql(
      "SELECT tokens_in_set(array('the','cat','the','a',NULL), array('the','a')) AS c, " +
        "size(filter(array('the','cat','the','a'), t -> t IN ('the','a'))) AS ref, " +
        "tokens_in_set(cast(NULL AS ARRAY<STRING>), array('x')) AS n").collect().head
    assert(r.getInt(0) == 3) // 'the' ×2 + 'a'; NULL token ignored
    assert(r.getInt(0) == r.getInt(1))
    assert(r.isNullAt(2))
  }

  test("dot_f64 on float-cast arrays equals per-element widening") {
    // the query path casts ARRAY<FLOAT> to ARRAY<DOUBLE>; widening is
    // exact, so dot over the cast equals dot over explicit casts
    val df = spark.sql(
      """SELECT dot_f64(cast(a AS ARRAY<DOUBLE>), cast(a AS ARRAY<DOUBLE>)) AS d,
        |       aggregate(transform(a, x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)),
        |                 0.0D, (acc, x) -> acc + x) AS ref
        |FROM (SELECT array(cast(0.1 AS FLOAT), cast(-2.5 AS FLOAT), cast(3.25 AS FLOAT)) AS a)""".stripMargin)
    val r = df.collect().head
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("dot_f64 null semantics match the zip_with+aggregate HOF spelling") {
    val r = spark.sql(
      "SELECT dot_f64(cast(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS a, " +
        "dot_f64(array(1.0D, 2.0D), array(3.0D)) AS b, " + // length mismatch
        "dot_f64(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS c, " + // null element
        "aggregate(zip_with(array(1.0D, 2.0D), array(3.0D), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS hof_b"
    ).collect().head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
    assert(r.isNullAt(3)) // the HOF reference agrees: mismatch → NULL
  }

  test("Parallelize.ensure widens a small input and is a no-op on a large one") {
    val one = spark.range(4).toDF("x").coalesce(1)
    val widened = graft.operators.Parallelize.ensure(one)
    assert(widened.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // the no-op branch keys on estimated input size vs target×
    // maxPartitionBytes (a big scan already arrives well-split); shrink
    // the threshold so an 8 MB-stats input counts as "large"
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
      val big = spark.range(1000000).toDF("x")
      assert(graft.operators.Parallelize.ensure(big) eq big)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("Parallelize.ensure falls back to partition count for statless inputs") {
    // RDD-backed relations report the defaultSizeInBytes sentinel —
    // exactly the single-partition inputs the guard exists for
    val rdd = spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L)), 1)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType)))
    val statless = spark.createDataFrame(rdd, schema)
    assert(statless.queryExecution.analyzed.stats.sizeInBytes >=
      BigInt(spark.sessionState.conf.defaultSizeInBytes),
      "fixture no longer statless — update the test")
    val widened = graft.operators.Parallelize.ensure(statless)
    assert(widened.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }
}
