package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables}

/** Behavioral gates for the round-9 embedding operators, each proved
  * against an independent driver-side re-derivation:
  *  - JL projection: the distance-preservation property the transform
  *    exists for (sampled pair distortion inside the k=16 regime's
  *    bounds), plus sign-matrix determinism;
  *  - IVF-PQ ADC: an exact end-to-end replay (cells, codes, integer
  *    ADC scores, final ranking recomputed from raw vectors on the
  *    driver) and a quantization-quality floor against the exact
  *    in-cell distance ranking.
  */
class EmbeddingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("embedding-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Raw vectors as doubles, keyed by vec_id. */
  private def vectors(): Map[Long, Array[Double]] =
    Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap

  test("JL projection preserves sampled pairwise distances within the k=16 regime") {
    val v = vectors()
    // The gated query emits exploded (vec_id, d, x) rows (driver-hashable
    // form); reassemble per-vector arrays here for the distortion check.
    val proj = run("jl_projection").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray }
    assert(proj.keySet == v.keySet)
    assert(proj.values.forall(_.length == 16))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // E‖p(a)−p(b)‖² = ‖a−b‖² for the sign construction scaled by 1/√k;
    // with k = 16 the per-pair ratio has std ≈ √(2/k) ≈ 0.35, so
    // individual ratios live in a wide band but the mean concentrates.
    val ids = v.keys.toSeq.sorted.take(80)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until math.min(i + 5, ids.length)
      a = ids(i); b = ids(j)
      orig = d2(v(a), v(b)) if orig > 0
    } yield d2(proj(a), proj(b)) / orig
    assert(ratios.size > 100, "not enough sampled pairs")
    assert(ratios.forall(r => r > 0.15 && r < 4.0),
      s"pair distortion outside the plausible band: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.75 && mean < 1.3, s"mean distortion $mean drifted from 1")
  }

  test("JL sign matrix re-derives from md5 exactly (engine-portable determinism)") {
    val signs = EmbeddingQueries.jlSigns
    assert(signs.length == 16 && signs.forall(_.length == 64))
    assert(signs.flatten.forall(s => s == 1.0 || s == -1.0))
    // not degenerate: both signs occur in every output dimension
    signs.zipWithIndex.foreach { case (row, d) =>
      assert(row.contains(1.0) && row.contains(-1.0), s"dim $d is constant-sign")
    }
    // spot-check one entry against a hand computation of md5("0_0")
    val md = java.security.MessageDigest.getInstance("MD5")
    val nib = (md.digest("0_0".getBytes("UTF-8"))(0) >> 4) & 0xf
    assert(signs(0)(0) == (if (nib % 2 == 0) 1.0 else -1.0))
  }

  test("IVF-PQ ADC replays exactly from a driver-side re-derivation") {
    val v = vectors()
    val seedIds = Seq(5L, 15L, 25L, 35L, 45L, 55L, 65L, 75L)
    val probeIds = Seq(7L, 42L, 99L)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    // cells: argmax dot with the seed vectors, ties to the lower sid
    def cellsOf(x: Array[Double], n: Int): Seq[Long] =
      seedIds.map(s => (-dot(x, v(s)), s)).sorted.take(n).map(_._2)
    // HALF_UP (away from zero) matches Spark's round() and DuckDB's on
    // negatives, where math.round would round toward +inf
    def u6(x: Double): Long =
      BigDecimal(x * 1000000.0)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    def termU6(sub: Array[Double], cv: Array[Double]): Long = {
      val c2 = cv.foldLeft(0.0)((a, x) => a + x * x)
      u6(c2 - 2.0 * dot(sub, cv))
    }
    // TRAINED codebooks, re-derived independently: two integer-Lloyd
    // rounds from the vec_id<16 seed slices — u6 centroids, BIGINT
    // distance argmin (ties to lower cid), offset integer mean,
    // emptied cells keep their previous centroid. This is scalar
    // driver code sharing nothing with the DataFrame training job.
    var books: IndexedSeq[IndexedSeq[Array[Long]]] =
      (0 until 8).map(j => (0 until 16).map(c =>
        v(c.toLong).slice(j * 8, j * 8 + 8).map(u6)))
    for (_ <- 1 to 2) {
      books = (0 until 8).map { j =>
        val cs = books(j).map(_.map(_ / 1000000.0))
        val assign = v.toSeq.map { case (_, x) =>
          val sub = x.slice(j * 8, j * 8 + 8)
          ((0 until 16).map(c => (termU6(sub, cs(c)), c)).min._2, sub)
        }
        (0 until 16).map { c =>
          val mem = assign.filter(_._1 == c).map(_._2)
          if (mem.isEmpty) books(j)(c)
          else (0 until 8).map { d =>
            val su = mem.map(m => u6(m(d))).sum
            val n = mem.size.toLong
            (su + n * 32000000L) / n - 32000000L
          }.toArray
        }
      }
    }
    val cents = books.map(_.map(_.map(_ / 1000000.0)))
    def codesOf(x: Array[Double]): Seq[Int] =
      (0 until 8).map { j =>
        val sub = x.slice(j * 8, j * 8 + 8)
        (0 until 16).map(c => (termU6(sub, cents(j)(c)), c)).min._2
      }
    val cellOf = v.keys.map(id => id -> cellsOf(v(id), 1).head).toMap
    val expect = probeIds.flatMap { p =>
      val pcells = cellsOf(v(p), 4).toSet
      val cand = v.keys.filter(id => id != p && pcells.contains(cellOf(id)))
      val scored = cand.map { id =>
        val codes = codesOf(v(id))
        val score = (0 until 8).map(j =>
          termU6(v(p).slice(j * 8, j * 8 + 8), cents(j)(codes(j)))).sum
        (id, score)
      }.toSeq.sortBy { case (id, s) => (s, id) }.take(5)
      scored.zipWithIndex.map { case ((id, s), i) => (p, id, s, (i + 1).toLong) }
    }.toSet
    val got = run("ann_ivfpq_adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
      .toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")

    // quantization quality: within the probed cells, the ADC top-5 must
    // recover a reasonable share of the EXACT-distance top-5 (the
    // asymmetric approximation loses precision but not the plot)
    def exactTop5(p: Long): Set[Long] = {
      val pcells = cellsOf(v(p), 4).toSet
      v.keys.filter(id => id != p && pcells.contains(cellOf(id)))
        .map { id =>
          val d = v(p).zip(v(id)).map { case (a, b) => (a - b) * (a - b) }.sum
          (id, d)
        }.toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }
    val overlaps = probeIds.map { p =>
      val adc = expect.filter(_._1 == p).map(_._2)
      exactTop5(p).intersect(adc).size
    }
    assert(overlaps.sum >= probeIds.size,
      s"ADC recovered too little of the exact top-5: $overlaps")
  }

  test("two-stage re-rank recall dominates ADC-only recall (shortlist theorem)") {
    val v = vectors()
    val seedIds = Seq(5L, 15L, 25L, 35L, 45L, 55L, 65L, 75L)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { s0 += a(i) * b(i); i += 1 }; s0
    }
    def cellsOf(x: Array[Double], n: Int): Seq[Long] =
      seedIds.map(s => (-dot(x, v(s)), s)).sorted.take(n).map(_._2)
    val cellOf = v.keys.map(id => id -> cellsOf(v(id), 1).head).toMap
    def exactTop5(p: Long): Set[Long] = {
      val pcells = cellsOf(v(p), 4).toSet
      v.keys.filter(id => id != p && pcells.contains(cellOf(id)))
        .map { id =>
          val d = v(p).zip(v(id)).map { case (a, b) => (a - b) * (a - b) }.sum
          (id, d)
        }.toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }
    val adc = run("ann_ivfpq_adc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    val rr = run("ann_ivfpq_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    assert(adc.keySet == rr.keySet && adc.nonEmpty)
    adc.keys.foreach { p =>
      val truth = exactTop5(p)
      val recallAdc = truth.intersect(adc(p)).size
      val recallRr = truth.intersect(rr(p)).size
      // theorem: every truth member the ADC top-5 finds is in the
      // top-20 shortlist, and the exact re-rank can only promote truth
      // members within it — per-probe dominance, not just on average
      assert(recallRr >= recallAdc,
        s"probe $p: rerank recall $recallRr < adc recall $recallAdc")
    }
  }

  test("PQ8 rerank dominates its ADC-only recall; codebooks have 256 cells") {
    // same shortlist theorem at the 8-bit operating point (K=256,
    // R=20): every truth member the ADC top-5 finds is in the top-20
    // shortlist, and the exact rerank can only promote truth members
    val v = vectors()
    val seedIds = Seq(5L, 15L, 25L, 35L, 45L, 55L, 65L, 75L)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { s0 += a(i) * b(i); i += 1 }; s0
    }
    def cellsOf(x: Array[Double], n: Int): Seq[Long] =
      seedIds.map(s => (-dot(x, v(s)), s)).sorted.take(n).map(_._2)
    val cellOf = v.keys.map(id => id -> cellsOf(v(id), 1).head).toMap
    def exactTop5(p: Long): Set[Long] = {
      val pcells = cellsOf(v(p), 4).toSet
      v.keys.filter(id => id != p && pcells.contains(cellOf(id)))
        .map { id =>
          val d = v(p).zip(v(id)).map { case (a, b) => (a - b) * (a - b) }.sum
          (id, d)
        }.toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }
    val adc = run("ann_ivfpq8_adc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    val rr = run("ann_ivfpq8_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    assert(adc.keySet == rr.keySet && adc.nonEmpty)
    adc.keys.foreach { p =>
      val truth = exactTop5(p)
      assert(truth.intersect(rr(p)).size >= truth.intersect(adc(p)).size,
        s"probe $p: PQ8 rerank recall below its ADC recall")
    }
    // the codebook gate really trains at the 8-bit size (256 cells per
    // subspace when the corpus has >= 256 seed vectors)
    val books = run("pq8_codebooks").collect()
    assert(books.length == 8 * 256 * 8, s"unexpected book size ${books.length}")
  }

  test("binary codes replay bit-by-bit from raw vectors") {
    val v = vectors()
    def code(x: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L; var i = 0
      while (i < 32) { if (x(i) > 0) lo |= (1L << i); i += 1 }
      while (i < 64) { if (x(i) > 0) hi |= (1L << (i - 32)); i += 1 }
      (lo, hi)
    }
    val got = run("embedding_quantize_binary").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got.keySet == v.keySet)
    v.foreach { case (id, x) =>
      val (lo, hi) = code(x)
      assert(got(id) == ((lo, hi,
        java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi))),
        s"vec $id: packed code mismatch")
    }
  }

  test("binary rerank replays exactly and its recall dominates hamming-only (shortlist theorem)") {
    val v = vectors()
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { s0 += a(i) * b(i); i += 1 }; s0
    }
    def code(x: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L; var i = 0
      while (i < 32) { if (x(i) > 0) lo |= (1L << i); i += 1 }
      while (i < 64) { if (x(i) > 0) hi |= (1L << (i - 32)); i += 1 }
      (lo, hi)
    }
    val codes = v.map { case (id, x) => id -> code(x) }
    // full replay of the two-stage query from raw vectors
    val expect = Seq(0L, 1L, 2L).flatMap { p =>
      val (plo, phi) = codes(p)
      val short = v.keys.filter(_ != p).map { id =>
        val (lo, hi) = codes(id)
        (id, java.lang.Long.bitCount(lo ^ plo) + java.lang.Long.bitCount(hi ^ phi))
      }.toSeq.sortBy { case (id, h) => (h, id) }.take(100)
      short.map { case (id, h) =>
        val c = math.rint(dot(v(p), v(id)) /
          (math.sqrt(dot(v(p), v(p))) * math.sqrt(dot(v(id), v(id)))) * 1e6) / 1e6
        (id, h, c)
      }.sortBy { case (id, _, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, h, c), i) => (p, id, h, c, i + 1) }
    }.toSet
    val got = run("ann_binary_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
      .toSet
    assert(got == expect, s"binary rerank replay mismatch:\n got=$got\n exp=$expect")
    // per-probe dominance: a truth member surfaced by the Hamming top-5
    // is in the top-20 shortlist, and the exact re-rank can only
    // promote truth members within it
    graft.queries.EmbeddingQueries.perProbeBinaryRecall(spark, sf)
      .foreach { case (p, ham, rr) =>
        assert(rr >= ham, s"probe $p: rerank recall $rr < hamming recall $ham")
      }
  }

  test("PCA power iteration replays exactly; Rayleigh quotient ascends; loadings unit-norm") {
    val v = vectors()
    val n = v.size.toLong
    // Spark's round() goes through BigDecimal.valueOf (the SHORTEST
    // decimal repr of the double), not the exact binary expansion —
    // with ~300k roundings per iteration the two differ at enough
    // representation boundaries to diverge the iterate, so the replay
    // must mirror valueOf semantics exactly
    def u6(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    // independent scalar replay of the integer-exact power iteration
    val mu = (0 until 64).map { d =>
      val su = v.values.map(x => u6(x(d))).sum
      ((su + n * 32000000L) / n - 32000000L) / 1000000.0
    }
    val xc = v.view.mapValues(x => (0 until 64).map(d => x(d) - mu(d)).toArray).toMap
    var vec = Array.fill(64)(0.125)
    val rayleighs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastU6: Seq[Long] = Nil
    for (_ <- 1 to 3) {
      val s = xc.view.mapValues { x =>
        var acc = 0.0; var i = 0
        while (i < 64) { acc += x(i) * vec(i); i += 1 }; acc
      }.toMap
      rayleighs += s.values.toSeq.map(si => u6(si * si)).sum
      // toSeq: mapping over the KEY SET would collapse duplicate terms
      val w = (0 until 64).map(d =>
        s.keys.toSeq.map(id => u6(s(id) * xc(id)(d))).sum)
      val wr = w.map(_ / 1000000.0)
      val nrm = math.sqrt(wr.foldLeft(0.0)((a, x) => a + x * x))
      // spell the normalization exactly as the engines do: (w/1e6)/nrm*1e6
      lastU6 = wr.map(x => u6(x / nrm))
      vec = lastU6.map(_ / 1000000.0).toArray
    }
    val got = run("embedding_pca_power").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 64L))
    assert(got.map(_._2).toSeq == lastU6,
      s"loadings diverge from the scalar replay: got=${got.take(4).toSeq}")
    assert(got.map(_._3 / 1000000.0).toSeq == mu.toSeq)
    // unit norm within u6 rounding of 64 components
    val norm2 = got.map(_._2 / 1000000.0).map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"component not unit: $norm2")
    // the power-iteration theorem: vᵀCv non-decreasing per step (u6
    // rounding perturbs at ~1e-6 of the scale; same slack family as
    // the pq objective gate)
    val traj = graft.queries.EmbeddingQueries.pcaRayleighTrajectory(spark, sf)
    assert(traj == rayleighs.toSeq, s"trajectory replay mismatch: $traj vs $rayleighs")
    traj.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 100L, s"Rayleigh quotient descended: $traj")
    }
  }

  test("deflated second component is unit-norm and orthogonal to the first") {
    val got = run("embedding_pca_deflate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 64L))
    val v1 = got.map(_._2 / 1000000.0)
    val v2 = got.map(_._3 / 1000000.0)
    val n2 = v2.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-4, s"second component not unit: $n2")
    // deflation theorem: v2 lives in v1's orthogonal complement up to
    // the u6 rounding of the deflation (measured ~4e-7)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-4, s"components not orthogonal: $dot")
    // the first-component loadings agree with the gated pca_power query
    val l1 = run("embedding_pca_power").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    assert(got.map(_._2).toSeq == l1.toSeq)
    // Rayleigh ascent holds on the deflated data too (same theorem)
    val traj2 = graft.queries.EmbeddingQueries.pcaDeflateState(spark, sf)._2
    traj2.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 100L, s"deflated Rayleigh descended: $traj2")
    }
  }

  test("hard negatives: top-5 cross-label cosine, replayed from raw vectors") {
    val labels = Tables.table(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val v = vectors()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def d(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      math.rint(d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b))) * 1e6) / 1e6
    }
    val expect = Seq(0L, 1L, 2L).flatMap { p =>
      v.keys.filter(id => labels(id) != labels(p))
        .map(id => (id, cos(v(p), v(id)))).toSeq
        .sortBy { case (id, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, c), i) => (p, id, c, (i + 1).toLong) }
    }.toSet
    val got = run("hard_negatives_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4), r.getInt(5).toLong))
      .toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    // every reported negative crosses the label boundary
    run("hard_negatives_topk").collect().foreach { r =>
      assert(r.getInt(1) != r.getInt(3),
        s"anchor ${r.getLong(0)} got a same-label 'negative' ${r.getLong(2)}")
    }
  }
}
