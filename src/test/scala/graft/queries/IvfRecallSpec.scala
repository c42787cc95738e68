package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The IVF accuracy knob (r7 verdict #2): recall@3 of the trained
  * quantizer as a function of nprobe. Two facts are theorems of the
  * search construction, so the gate asserts them outright:
  *
  *  - MONOTONE: the probe cells at nprobe=n are a prefix of those at
  *    n+1 (sorted by centroid dot), so the candidate set only grows —
  *    and the only candidates that can displace a global-top-3 member
  *    from a found top-3 are other global-top-3 members. Recall@3 can
  *    never decrease as probes widen.
  *  - CEILING: at nprobe = #cells (8) every disjoint cell is probed,
  *    the candidate set is the whole corpus minus self, and the search
  *    IS brute force — recall 1.0 ≥ the 0.9 a user of an ANN index
  *    expects the knob to reach.
  *
  * The shipped-nprobe numbers (sampled vs trained at nprobe=4) stay
  * ungated: recall at FIXED nprobe is legitimately non-monotone in
  * Lloyd training. Bench emits both quantizers' whole curves per round
  * (BENCH.json `ivf_recall_curve` / `ivf_recall_curve_sampled`).
  */
class IvfRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]").appName("ivf-recall-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("trained-IVF recall@3 is non-decreasing in nprobe and reaches >= 0.9 at nprobe=8") {
    val rep = EmbeddingQueries.ivfRecallReport(spark, sf)
    assert(rep.curve.map(_._1) == Seq(1, 2, 4, 6, 8), rep.curve)
    val recalls = rep.curve.map(_._2)
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0, rep.curve))
    assert(recalls.sliding(2).forall(p => p.head <= p.last),
      s"recall must be monotone in nprobe: ${rep.curve}")
    assert(recalls.last >= 0.9,
      s"nprobe=8 probes every cell (brute-force equivalent): ${rep.curve}")
    // the diagnostic nprobe-4 points sit on their curves; the shipped
    // flat-search number is the seed curve at IvfTopkNProbe (r10
    // verdict #3 — its >= 0.7 property is measured at the bench SFs,
    // not gated at this tiny fixture scale)
    assert(rep.trained == rep.curve.toMap.apply(4), (rep.trained, rep.curve))
    val sampled = rep.sampledCurve.map(_._2)
    assert(sampled.sliding(2).forall(p => p.head <= p.last),
      s"sampled-quantizer recall must be monotone in nprobe: ${rep.sampledCurve}")
    assert(sampled.last >= 0.9, rep.sampledCurve)
    assert(rep.sampled == rep.sampledCurve.toMap.apply(4),
      (rep.sampled, rep.sampledCurve))
    assert(rep.shippedTopk ==
      rep.sampledCurve.toMap.apply(EmbeddingQueries.shippedTopkNProbe),
      (rep.shippedTopk, rep.sampledCurve))
  }
}
