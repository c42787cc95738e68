package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The z-order WRITE path (operators/ZOrderLayout): the gated
  * zorder_layout_key query proves the code's locality theorems; this
  * spec proves the LAYOUT delivers what the code promises — files
  * whose per-file key ranges are narrow on BOTH axes, so parquet
  * min/max footer stats prune filtered scans — and that placement
  * never changes the row set. */
class ZOrderLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]").appName("zorder-layout-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def src() = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select("l_orderkey", "l_partkey", "l_quantity")

  test("layout moves placement only — the row set is identical") {
    val before = src().collect().map(_.toString).sorted
    val after = ZOrderLayout(src(), "l_orderkey", "l_partkey", buckets = 8)
      .collect().map(_.toString).sorted
    assert(before.sameElements(after), "z-order changed the row set")
  }

  test("z-ordered files cover narrow rectangles; an unordered write does not") {
    def meanFileRange(df: org.apache.spark.sql.DataFrame, colName: String): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
      df.write.mode("overwrite").parquet(dir)
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max(colName) - min(colName)).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    // unordered control: same file count, hash placement
    val plain = meanFileRange(src().repartition(16), "l_orderkey")
    val zed = meanFileRange(
      ZOrderLayout(src(), "l_orderkey", "l_partkey", buckets = 16), "l_orderkey")
    // hash placement makes every file span ~the whole key domain; the
    // z layout clusters each axis by ~sqrt(files) (16 files = 2 split
    // bits per axis = 4x narrower spans); the pruning win is
    // proportional to this ratio
    assert(zed < 0.5 * plain,
      f"z-ordered mean file span $zed%.0f not under half of unordered $plain%.0f")
    // and the second axis must ALSO be clustered (that is the point of
    // interleaving over a plain sort)
    val zedY = meanFileRange(
      ZOrderLayout(src(), "l_orderkey", "l_partkey", buckets = 16), "l_partkey")
    val plainY = meanFileRange(src().repartition(16), "l_partkey")
    assert(zedY < 0.5 * plainY,
      f"second axis not clustered: $zedY%.0f vs unordered $plainY%.0f")
  }

  test("cache config parses zorder-by and the manager validates arity") {
    val c = graft.config.YamlConfig.parseCache(java.util.Map.of(
      "enabled", "true", "table", "t",
      "zorder-by", java.util.List.of("l_orderkey", "l_partkey")))
    assert(c.zorderBy == Seq("l_orderkey", "l_partkey"))
    val none = graft.config.YamlConfig.parseCache(java.util.Map.of(
      "enabled", "true", "table", "t"))
    assert(none.zorderBy.isEmpty)
  }
}
