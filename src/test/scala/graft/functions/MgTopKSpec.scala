package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Theorem gates for the Misra–Gries aggregate: (1) NO FALSE
  * NEGATIVES — any item with true frequency > n/(k+1) appears in the
  * summary no matter how the input is partitioned (the property the
  * two-pass heavy-hitters query rests on); (2) the per-item undercount
  * bound n/(k+1); (3) the summary never exceeds k entries and is
  * reachable from plain SQL. Partitioning is adversarial: the same
  * skewed corpus aggregated under several repartitions must uphold
  * the guarantees each time (candidate SETS may differ — only the
  * theorems are stable).
  */
class MgTopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]").appName("mg-topk-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // skewed corpus: two heavies far over n/(k+1), a zipf-ish tail
  private def corpus: Seq[String] =
    Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      (0 until 300).map(i => s"tail_${i % 150}")

  private def summarize(k: Int, parts: Int): Map[String, Long] = {
    val s2 = spark
    import s2.implicits._
    val rows = corpus.toDF("t").repartition(parts)
      .agg(expr(s"mg_topk(t, $k)").as("mg")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("no false negatives under adversarial partitioning; size <= k") {
    val n = corpus.size
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(4, 16); parts <- Seq(1, 3, 7, 32)) {
      val mg = summarize(k, parts)
      assert(mg.size <= k, s"k=$k parts=$parts: summary overflows capacity")
      val mustSurvive = exact.filter { case (_, c) => c > n.toLong / (k + 1) }.keySet
      assert(mustSurvive.subsetOf(mg.keySet),
        s"k=$k parts=$parts: lost heavy ${mustSurvive -- mg.keySet}")
      // undercount bound: reported <= true, true - reported <= n/(k+1)
      mg.foreach { case (t, c) =>
        val e = exact(t)
        assert(c <= e, s"k=$k parts=$parts: $t overcounted ($c > $e)")
        assert(e - c <= n.toLong / (k + 1),
          s"k=$k parts=$parts: $t undercount ${e - c} breaks the bound")
      }
    }
  }

  test("single-partition k >= distinct terms degenerates to exact counts") {
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mg = summarize(512, 1)
    assert(mg == exact, "with capacity >= |vocab| MG is exact counting")
  }

  test("mg_topk is callable from SQL and rejects a non-literal k") {
    val s2 = spark
    import s2.implicits._
    Seq("a", "b", "a").toDF("t").createOrReplaceTempView("mg_in")
    val out = spark.sql("SELECT mg_topk(t, 2) AS mg FROM mg_in").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("a" -> 2L, "b" -> 1L))
    val err = intercept[Exception] {
      spark.sql("SELECT mg_topk(t, length(t)) FROM mg_in").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
