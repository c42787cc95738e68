package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("cc-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // chain 1-2-3, pair 10-11, triangle 20-21-22, chain joined late 3-4
  private def edges = {
    val rows = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (20L, 22L), (3L, 4L))
    spark.createDataFrame(rows).toDF("a", "b")
  }

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 10L, 11L -> 10L,
    20L -> 20L, 21L -> 20L, 22L -> 20L)

  test("driver union-find path labels components by min id") {
    val got = ConnectedComponents.labels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("distributed star-contraction path produces identical labels") {
    val got = ConnectedComponents.labels(edges, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("star contraction converges in O(log n) rounds on a long chain, not O(diameter)") {
    // a 256-node path: diameter 255. Min-label propagation needed ~255
    // shuffle rounds here (the r7-flagged weakness — crawl near-dup
    // graphs stitched by boilerplate are exactly this shape);
    // large-star/small-star contracts it in logarithmically many.
    val n = 256L
    val chain = spark.createDataFrame(
      (1L until n).map(i => (i, i + 1))).toDF("a", "b")
    val (lbl, rounds) = ConnectedComponents.starContraction(chain)
    assert(rounds <= 16, s"expected O(log 256)=8-ish rounds, got $rounds")
    val got = lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 1L), got.toSeq.sortBy(_._1).take(5))
    // and the driver union-find agrees label-for-label
    val uf = ConnectedComponents.labels(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == uf)
  }

  test("star contraction handles self-loops and singleton components") {
    val e = spark.createDataFrame(Seq((7L, 7L), (1L, 2L))).toDF("a", "b")
    val (lbl, _) = ConnectedComponents.starContraction(e)
    val got = lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }
}
