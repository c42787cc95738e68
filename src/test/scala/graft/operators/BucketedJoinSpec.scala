package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the pre-shuffle strategy for the
  * repeated big-big join at 100 TB: both sides written `bucketBy` the
  * join key means every subsequent join on that key reads co-located
  * buckets and the Exchange disappears from the plan entirely (pay the
  * shuffle once at layout time, never per query). Also verifies the
  * salted skew join produces exactly the plain join's rows.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("bucketed-join-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_bucket_wh").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed tables join with zero Exchange in the plan") {
    val ss = spark
    import ss.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"evt$i")).toDF("k", "payload")
    val dim = (0L until 50L).map(i => (i, s"dim$i")).toDF("k2", "attr")
    facts.write.bucketBy(4, "k").sortBy("k").saveAsTable("b_facts")
    dim.write.bucketBy(4, "k2").sortBy("k2").saveAsTable("b_dim")

    val joined = spark.table("b_facts")
      .join(spark.table("b_dim"), $"k" === $"k2")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() == 1000)

    // contrast: the same join from unbucketed sources shuffles both sides
    val unbucketed = facts.join(dim, $"k" === $"k2")
    val p2 = unbucketed.queryExecution.executedPlan.toString
    assert(p2.contains("Exchange"), s"control plan should shuffle:\n$p2")
  }

  test("BucketedTables layout lands under the session's warehouse dir") {
    // cluster correctness: java.io.tmpdir is per-node local disk and a
    // fixed shared /tmp path races between JVMs — the layout must live
    // under the configured warehouse (here a non-default temp dir)
    // with a per-JVM nonce in the path
    val (ordersT, _) = BucketedTables.ensure(spark, "/root/testdata/sf0.001")
    val loc = spark.sql(s"DESCRIBE FORMATTED $ordersT").collect()
      .find(_.getString(0).trim == "Location").map(_.getString(1)).get
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(loc.contains("graft_bucket_wh") && loc.contains("graft_bucketed"),
      s"layout not under warehouse dir $wh: $loc")
    assert(loc.contains(ProcessHandle.current().pid().toString),
      s"layout path missing the per-JVM nonce: $loc")
    assert(spark.table(ordersT).count() > 0)
  }

  test("salted join equals plain join row-for-row") {
    val ss = spark
    import ss.implicits._
    // one pathologically hot key (80% of rows) + a uniform tail
    val skewed = ((1 to 800).map(_ => 7L) ++ (1 to 200).map(i => (i % 40).toLong))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
    val dim = (0L until 50L).map(i => (i, s"attr$i")).toDF("dk", "attr")

    val plain = skewed.join(dim, $"k" === $"dk").select("row_id", "attr")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", "dk", factor = 4)
      .select("row_id", "attr")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 1000)
  }

  test("advisor flips the physical plan both ways, result identical (r11 #2)") {
    val ss = spark
    import ss.implicits._
    val dim = (0L until 50L).map(i => (i, s"attr$i")).toDF("dk", "attr")

    // hot corpus: one key carries 80% of rows (~40× the mean) — the
    // ≥4×-mean trigger fires and the salted path must appear in the plan
    val hot = ((1 to 800).map(_ => 7L) ++ (1 to 200).map(i => (i % 40).toLong))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
    val hotCounts = hot.groupBy("k").agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val hotAdvice = SkewJoin.advise(hotCounts)
    assert(hotAdvice.salt, s"hot corpus must trigger salting: $hotAdvice")
    assert(hotAdvice.xMeanMilli >= 4000, s"ratio should be >=4x: $hotAdvice")
    val hotJoin = SkewJoin.adaptiveJoin(hot, dim, "k", "dk", hotCounts, factor = 4)
    assert(hotJoin.queryExecution.optimizedPlan.toString.contains("__salt"),
      "hot path must be the salted join")

    // uniform corpus: max == mean — plain path, no salt machinery, no
    // factor-times dim replication
    val flat = (1 to 1000).map(i => ((i % 40).toLong, i.toLong)).toDF("k", "row_id")
    val flatCounts = flat.groupBy("k").agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val flatAdvice = SkewJoin.advise(flatCounts)
    assert(!flatAdvice.salt, s"uniform corpus must not salt: $flatAdvice")
    val flatJoin = SkewJoin.adaptiveJoin(flat, dim, "k", "dk", flatCounts, factor = 4)
    assert(!flatJoin.queryExecution.optimizedPlan.toString.contains("__salt"),
      "uniform path must be the plain join")

    // hash-green either way: both routes equal the plain equi-join
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "attr").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows(hotJoin) == rows(hot.join(dim, $"k" === $"dk")))
    assert(rows(flatJoin) == rows(flat.join(dim, $"k" === $"dk")))

    // degenerate: an empty key-count frame advises plain (zero rows to
    // skew), and the advice carries zeroed diagnostics
    val empty = SkewJoin.advise(hotCounts.filter($"cnt" < 0))
    assert(!empty.salt && empty.total == 0L && empty.xMeanMilli == 0L)
  }

  test("key histogram surfaces the heavy hitter") {
    val ss = spark
    import ss.implicits._
    val skewed = ((1 to 800).map(_ => 7L) ++ (1 to 200).map(i => (i % 40).toLong))
      .toDF("k")
    val top = SkewJoin.keyHistogram(skewed, "k", topN = 1).collect().head
    assert(top.getLong(0) == 7L && top.getLong(1) >= 800L)
  }
}
