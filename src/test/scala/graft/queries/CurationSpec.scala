package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables}

/** Behavioral invariants of the curation layer, each proved against an
  * independent driver-side re-derivation: blocking COMPLETENESS for the
  * fuzzy linkage (the quadratic brute-force all-pairs scan is the
  * audit, never the operator), Gibbs' inequality plus a from-scratch
  * recount for the KL drift measure, and an exact key-by-key replay of
  * the Efraimidis–Spirakis sample.
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("curation-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("fuzzy linkage blocking is COMPLETE: equals the brute-force all-pairs audit") {
    // The deletion-neighborhood theorem says no distance-1 pair can be
    // missed; this audit is the quadratic scan the operator exists to
    // avoid, runnable here only because the fixture is small.
    val names = Tables.table(spark, sf, "customer")
      .select("c_name").collect().map(_.getString(0)).sorted
    val brute = (for {
      i <- names.indices.iterator
      j <- (i + 1) until names.length
      if lev(names(i), names(j)) == 1
    } yield (names(i), names(j))).toSet
    val got = run("fuzzy_name_linkage")
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "vacuous fixture: no distance-1 pairs")
  }

  test("fuzzy linkage pairs all verify at exactly distance 1") {
    val bad = run("fuzzy_name_linkage").collect()
      .filter(r => lev(r.getString(1), r.getString(3)) != 1)
    assert(bad.isEmpty, s"non-distance-1 pairs reported: ${bad.take(3).mkString}")
  }

  test("KL divergence satisfies Gibbs' inequality and a driver recount") {
    val rows = run("kl_divergence_sources").collect()
    assert(rows.nonEmpty)
    // KL >= 0 always; micro-rounding per term can only move the sum by
    // |terms| half-nanos, so allow that slack below zero.
    rows.foreach { r =>
      assert(r.getLong(2) >= -1000L,
        s"source ${r.getString(0)} has negative KL: ${r.getLong(2)}")
    }
    // independent recount of one source from raw tokens
    val toks = Tables.table(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val src = rows.head.getString(0)
    val nS = toks.count(_._1 == src).toDouble
    val n = toks.length.toDouble
    val cSt = toks.filter(_._1 == src).groupBy(_._2).view.mapValues(_.length)
    val cT = toks.groupBy(_._2).view.mapValues(_.length)
    val klU9 = cSt.map { case (t, c) =>
      math.round((c / nS) * math.log((c * n) / (nS * cT(t))) * 1e9)
    }.sum
    assert(rows.head.getLong(2) == klU9,
      s"driver recount $klU9 != operator ${rows.head.getLong(2)}")
  }

  test("A-ES weighted sample replays key-by-key on the driver") {
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      math.log((h + 1.0) / 4294967296.0) / w
    }
    val expect = docs.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(100)
    val got = run("weighted_sample_aes").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == math.min(100, docs.length))
    expect.zip(got).foreach { case ((eid, ek), (gid, gk9)) =>
      assert(eid == gid, s"rank order diverges at doc $eid vs $gid")
      assert(math.round(ek * 1e9) == gk9,
        s"key mismatch for doc $eid: ${math.round(ek * 1e9)} vs $gk9")
    }
  }

  test("A-ES sample favors weight: kept docs are longer than the corpus on average") {
    // Not a distributional test (the draw is deterministic) — just the
    // sanity direction: weighting by n_chars must pull the kept set's
    // mean length above the corpus mean.
    val corpusMean = Tables.table(spark, sf, "documents")
      .agg(avg("n_chars")).head().getDouble(0)
    val keptMean = run("weighted_sample_aes").agg(avg("weight")).head().getDouble(0)
    assert(keptMean > corpusMean,
      s"weighted sample mean $keptMean <= corpus mean $corpusMean")
  }
}
