package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The round gate's scale-slope check: the heavy operators must scale
  * near-linearly from sf0.01 to sf0.1 (10× data). This is the measured
  * counterpart of PlanSpec's shape locks — a regression to an
  * all-pairs join or a single-reducer funnel passes correctness at any
  * SF and keeps its plan superficially similar, but cannot keep a
  * ≤15× wall-time ratio at 10× data. See [[Slope]] for the cold/floor
  * methodology. */
class SlopeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: org.apache.spark.sql.SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.build("slope-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("heavy operators stay near-linear at 10x data (sf0.01 -> sf0.1)") {
    val ms = Slope.measure(spark,
      "/root/testdata/sf0.01", "/root/testdata/sf0.1", "/root/testdata/sf0.001")
    val report = ms.map(m =>
      f"${m.name}%-28s small ${m.tSmall}%6.2fs big ${m.tBig}%6.2fs ratio ${m.effRatio}%5.1f")
      .mkString("\n")
    info("\n" + report)
    val bad = ms.filterNot(_.ok)
    assert(bad.isEmpty,
      s"superlinear scale slope (possible hidden quadratic):\n$report")
  }

  test("synthesized tier preserves content distribution with disjoint ids") {
    // the 100× span's top tier (run by the Slope artifact main) rests
    // on these invariants; lock them cheaply at sf0.001 with factor 3
    val src = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("slope_tier").toString
    Slope.synthesizeTier(spark, src, out, factor = 3)
    import org.apache.spark.sql.functions._
    for ((t, id) <- Seq(("documents", "doc_id"), ("events", "event_id"),
        ("embeddings", "vec_id"))) {
      val s = spark.read.parquet(s"$src/$t.parquet")
      val o = spark.read.parquet(s"$out/$t.parquet")
      assert(o.count() == 3 * s.count(), t)
      // ids stay unique across copies — offsetting produced no collisions
      assert(o.select(id).distinct().count() == o.count(), s"$t.$id")
    }
    // content distribution preserved exactly: every text recurs 3×
    val srcTexts = spark.read.parquet(s"$src/documents.parquet")
      .groupBy("text").count()
    val outTexts = spark.read.parquet(s"$out/documents.parquet")
      .groupBy("text").count().withColumnRenamed("count", "c3")
    assert(srcTexts.join(outTexts, "text")
      .filter(col("c3") =!= col("count") * 3).isEmpty)
    // events: each copy's users are disjoint, so per-user event counts
    // recur as a multiset (sessionize work per key is unchanged)
    val perUserSrc = spark.read.parquet(s"$src/events.parquet")
      .groupBy("user_id").count().groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUserOut = spark.read.parquet(s"$out/events.parquet")
      .groupBy("user_id").count().groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUserOut == perUserSrc.map { case (k, v) => k -> v * 3 })
    // pass-through tables ride along unchanged
    val lSrc = spark.read.parquet(s"$src/lineitem.parquet").count()
    assert(spark.read.parquet(s"$out/lineitem.parquet").count() == lSrc)
  }
}
