package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config._

/** SURVEY §4.2c serving plan cache: repeated identical requests reuse
  * the analyzed DataFrame; different bound values, or any config/cache
  * invalidation, build fresh. */
class PlanCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("plan-cache-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ss = spark
    import ss.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")
      .createOrReplaceTempView("pc_t")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val ep = EndpointConfig(urlPath = "/pc", templateSource = "pc.sql",
    requestFields = Seq(RequestFieldConfig("id",
      validators = Seq(ValidatorConfig("int")))))
  private val template =
    "SELECT id, tag FROM pc_t WHERE 1=1 {{#params.id}} AND id = {{params.id}} {{/params.id}}"

  private def run(params: Map[String, String]) =
    TemplatePipeline.run(spark, ep, template, params)

  test("identical requests reuse the analyzed plan; different binds do not") {
    PlanCache.invalidateAll()
    val a1 = run(Map("id" -> "2"))
    val a2 = run(Map("id" -> "2"))
    assert(a1 eq a2, "identical request did not hit the plan cache")
    assert(a1.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val b = run(Map("id" -> "3"))
    assert(!(b eq a1), "different bound value must not reuse the plan")
    assert(b.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // section-presence changes the rendered SQL → different key
    val c = run(Map.empty)
    assert(!(c eq a1) && c.count() == 3)
  }

  test("invalidateAll drops cached plans (cache refresh / config change hook)") {
    PlanCache.invalidateAll()
    val a = run(Map("id" -> "1"))
    PlanCache.invalidateAll()
    val b = run(Map("id" -> "1"))
    assert(!(a eq b), "invalidation must force a rebuild")
    assert(b.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
