package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GlobalRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]").appName("global-rank-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("two-pass rank equals the single-window row_number on a unique key") {
    val sess = spark; import sess.implicits._
    // keys deliberately skewed + duplicated values, unique tie-break id
    val df = (1 to 997).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "v")
      .repartition(7)
    val got = GlobalRank
      .withRank(df, Seq(col("v"), col("id")), "i", numPartitions = 5)
      .select("id", "i").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("i", row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getInt(1).toLong)
      .toMap
    assert(got == want)
  }

  test("descending order and more partitions than rows both rank correctly") {
    val sess = spark; import sess.implicits._
    val df = Seq((1L, 5.0), (2L, 1.0), (3L, 9.0)).toDF("id", "v")
    val got = GlobalRank
      .withRank(df, Seq(col("v").desc, col("id")), "i", numPartitions = 16)
      .select("id", "i").as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 1L, 1L -> 2L, 2L -> 3L))
  }

  test("ntileFromRank matches SQL ntile for every (n, k) in a sweep") {
    val sess = spark; import sess.implicits._
    for (n <- Seq(1, 3, 4, 7, 8, 10, 97); k <- Seq(2, 4, 5)) {
      val df = (1 to n).map(_.toLong).toDF("id")
      val got = df
        .select(col("id"),
          GlobalRank.ntileFromRank(col("id"), lit(n.toLong), k).as("t"))
        .as[(Long, Long)].collect().toMap
      val want = df
        .withColumn("t", ntile(k).over(Window.orderBy("id")))
        .as[(Long, Int)].collect().map { case (i, t) => i -> t.toLong }.toMap
      assert(got == want, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("selfCheck fails loudly on a duplicated order key, passes on a unique one") {
    val sess = spark; import sess.implicits._
    sess.conf.set("spark.graft.globalRank.selfCheck", "true")
    try {
      // duplicate (v) with no tie-break: ranks would be boundary-split
      val dup = (1 to 50).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "v")
      val err = intercept[IllegalArgumentException] {
        GlobalRank.withRank(dup, Seq(col("v")), "i", numPartitions = 4)
      }
      assert(err.getMessage.contains("not unique"), err.getMessage)
      // same data with the tie-break appended passes the check (and the
      // desc modifier is stripped correctly before the distinct count)
      val ok = GlobalRank.withRank(dup,
        Seq(col("v").desc, col("id")), "i", numPartitions = 4)
      assert(ok.select("i").as[Long].collect().sorted.toSeq == (1L to 50L))
    } finally sess.conf.set("spark.graft.globalRank.selfCheck", "false")
  }

  test("broadcast-offset path (numPartitions above literal-map cap) ranks identically") {
    val sess = spark; import sess.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 101).toLong)).toDF("id", "v")
    val got = GlobalRank
      .withRank(df, Seq(col("v"), col("id")), "i", numPartitions = 96)
      .select("id", "i").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("i", row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getInt(1).toLong)
      .toMap
    assert(got == want)
    // and no single-reducer window in the served plan either
    val p = GlobalRank.withRank(df, Seq(col("v"), col("id")), "i",
      numPartitions = 96).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window leaked past the rank build:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"large-partition offset fold should broadcast-join:\n$p")
  }

  test("withPrefixSum equals the single-window running sum on a unique key") {
    val sess = spark; import sess.implicits._
    val df = (1 to 997).map(i => (i.toLong, (i % 13).toLong, (i % 7 + 1).toLong))
      .toDF("id", "v", "w").repartition(7)
    val got = GlobalRank
      .withPrefixSum(df, Seq(col("v"), col("id")), col("w"), "cum", numPartitions = 5)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("cum", sum("w").over(Window.orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
    // the grand total lands on the last row — prefix scan sanity
    val lastId = df.orderBy(col("v").desc, col("id").desc)
      .select("id").as[Long].head()
    assert(got(lastId) == df.agg(sum("w")).as[Long].head())
  }

  test("plan carries no empty-partition window and folds offsets as literals") {
    val sess = spark; import sess.implicits._
    val df = (1 to 100).map(_.toLong).toDF("id")
    val ranked = GlobalRank.withRank(df, Seq(col("id")), "i", numPartitions = 4)
    val p = ranked.queryExecution.executedPlan.toString
    // downstream of the checkpoint: a pure projection over ExistingRDD
    assert(p.contains("Scan ExistingRDD"), s"no materialized rank base:\n$p")
    assert(!p.contains("Window"), s"window leaked past the rank build:\n$p")
    assert(!p.contains("Exchange"), s"offset fold should be map-side:\n$p")
  }
}
