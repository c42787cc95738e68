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
}
