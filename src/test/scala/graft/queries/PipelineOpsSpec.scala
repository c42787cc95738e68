package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Behavioral invariants for the round's pipeline operators — the
  * properties the hash gate can't state: SemDeDup survivor semantics
  * against a driver brute-force, the Bloom filter's no-false-negative
  * theorem, DSIR's target/raw separation, the anomaly detector's exact
  * integer z-inequality, and temperature-mixture rebalancing direction.
  */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfTiny = "/root/testdata/sf0.001"
  private val sfMid = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("pipeline-ops-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String, sf: String) = SparkEntry.queries(name)(spark, sf)

  test("semdedup matches a driver brute-force of the same cells and threshold") {
    // Independent re-derivation: collect the tiny corpus, assign each
    // vector to its max-dot seed cell (ties to the smaller seed id),
    // enumerate within-cell pairs, drop the larger id of every pair
    // with cosine >= 0.40 — then the query's survivor summary must
    // agree exactly.
    val vecs = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    val seeds = vecs.filter(v => Seq(5L, 15L, 25L, 35L, 45L, 55L, 65L, 75L)
      .contains(v._1))
    assert(seeds.length == 8, "seed vectors missing from the tiny tier")
    def cell(v: Array[Double]) =
      seeds.map(s => (-dot(v, s._2), s._1)).min._2
    val cells = vecs.map(v => (v._1, cell(v._2))).toMap
    val losers = (for {
      a <- vecs; b <- vecs
      if a._1 < b._1 && cells(a._1) == cells(b._1)
      cos = dot(a._2, b._2) /
        (math.sqrt(dot(a._2, a._2)) * math.sqrt(dot(b._2, b._2)))
      if cos >= 0.40
    } yield b._1).toSet
    val row = run("semdedup_corpus", sfTiny).collect().head
    assert(row.getLong(0) == vecs.length - losers.size,
      s"survivor count ${row.getLong(0)} != ${vecs.length - losers.size}")
    assert(row.getLong(1) == losers.size,
      s"dropped count ${row.getLong(1)} != ${losers.size}")
    val labelSum = vecs.filterNot(v => losers(v._1)).map(_._3.toLong).sum
    assert(row.getLong(2) == labelSum, "survivor label digest mismatch")
  }

  test("bloom decontamination never misses an exact hit (no false negatives)") {
    val out = run("bloom_contamination", sfMid)
      .select("doc_id", "n_grams", "n_bloom", "n_exact").collect()
    assert(out.nonEmpty, "no bloom hits at sf0.01 — probe degenerate")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"doc ${r.getLong(0)}: more bloom hits than grams")
      assert(r.getLong(3) <= r.getLong(2),
        s"doc ${r.getLong(0)}: exact hit missed by the bloom filter " +
          s"(exact=${r.getLong(3)} bloom=${r.getLong(2)})")
    }
    // every document with an exact hit must appear (exact ⊆ bloom ⇒ the
    // n_bloom > 0 output filter cannot hide it)
    assert(out.exists(_.getLong(3) > 0),
      "fixture lost its planted exact contamination")
  }

  test("dsir importance separates target-like documents from the raw pool") {
    val out = run("dsir_importance", sfMid)
      .select("is_target", "logw_micro").collect()
      .map(r => (r.getBoolean(0), r.getLong(1)))
    val (t, r) = out.partition(_._1)
    assert(t.nonEmpty && r.nonEmpty, "target carve degenerate")
    val tMean = t.map(_._2).sum.toDouble / t.length
    val rMean = r.map(_._2).sum.toDouble / r.length
    // the scorer exists to rank target-distribution docs above the raw
    // pool; on the deterministic fixture the separation is material
    assert(tMean > rMean,
      s"target mean $tMean not above raw mean $rMean — scorer inverted")
  }

  test("anomaly hours satisfy the exact integer 3-sigma inequality") {
    // via Tables so the ts physical-shape normalization (nanos-long or
    // NTZ, driver-generator dependent) matches what the operator sees
    val events = graft.Tables.table(spark, sfMid, "events")
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
    val byType = hourly.groupBy(_._1)
    val expected = hourly.filter { case (et, _, cnt) =>
      val hs = byType(et).map(_._3)
      val (n, sm, sq) = (hs.length.toLong, hs.sum, hs.map(c => c * c).sum)
      val dev = n * cnt - sm
      dev * dev > 9 * (n * sq - sm * sm)
    }.map { case (et, h, _) => (et, h) }.toSet
    val got = run("ev6_anomaly_hours", sfMid)
      .select("event_type", "hour").collect()
      .map(r => (r.getString(0), r.get(1).toString)).toSet
    assert(got == expected,
      s"flagged set mismatch: missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty, "no anomalies at sf0.01 — fixture degenerate")
  }

  test("cms estimates never undercount and the collision path is exercised") {
    val rows = run("cms_heavy_hitters", sfMid)
      .select("token", "cnt", "cms_est", "never_undercounts").collect()
    assert(rows.length == 20, "top-20 candidate set wrong size")
    rows.foreach { r =>
      assert(r.getBoolean(3) && r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)} undercounted: est=${r.getLong(2)} true=${r.getLong(1)}")
    }
    // w=16 is far below the vocabulary precisely so collisions happen —
    // a run where no candidate overcounts means the fixture stopped
    // exercising the approximation
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "no collision overcount at w=16 — sketch degenerate")
  }

  test("phrase search agrees with a driver scan for adjacent token pairs") {
    val expected = spark.read.parquet(s"$sfMid/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split(" ")
        val n = w.indices.dropRight(1)
          .count(i => w(i) == "scan" && w(i + 1) == "merge")
        (r.getLong(0), n.toLong)
      }.filter(_._2 > 0).toMap
    val got = run("phrase_search", sfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected,
      s"phrase match sets differ: missing=${expected.keySet -- got.keySet} " +
        s"extra=${got.keySet -- expected.keySet}")
    assert(got.nonEmpty, "no phrase hits at sf0.01 — fixture degenerate")
  }

  test("bigram surprisal counts every adjacency and scores strictly positive") {
    val wordCounts = spark.read.parquet(s"$sfMid/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong))
      .toMap
    val rows = run("bigram_surprisal", sfMid)
      .select("doc_id", "n_bigrams", "surprisal_micro").collect()
    assert(rows.length == wordCounts.size, "docs lost by the bigram scorer")
    rows.foreach { r =>
      assert(r.getLong(1) == wordCounts(r.getLong(0)) - 1,
        s"doc ${r.getLong(0)}: bigram count ${r.getLong(1)} != words-1")
      // every probability is < 1 (interpolation with corpus frequencies),
      // so -ln sums are strictly positive
      assert(r.getLong(2) > 0, s"doc ${r.getLong(0)}: non-positive surprisal")
    }
  }

  /** The operator's boundary rule, reimplemented independently:
    * 1-based position i in [2, L-3] is a boundary iff the md5 of the
    * 4-char window at i ≡ 0 mod 64 (first 8 hex chars as an integer). */
  private def cdcChunksOf(text: String): Seq[(Int, Int, String)] = {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val l = text.length
    val bounds = Seq(1) ++
      (2 to l - 3).filter { i =>
        java.lang.Long.parseLong(md5hex(text.substring(i - 1, i + 3)).take(8), 16) % 64 == 0
      } ++ Seq(l + 1)
    bounds.sliding(2).zipWithIndex.map { case (Seq(a, b), j) =>
      (j + 1, a, md5hex(text.substring(a - 1, b - 1)))
    }.toSeq
  }

  test("cdc chunks match an independent driver re-derivation on every doc") {
    val texts = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = texts.flatMap { case (id, t) =>
      cdcChunksOf(t).map { case (idx, start, md5) => (id, idx.toLong, start.toLong, md5) }
    }.toSet
    val got = run("cdc_chunks", sfTiny)
      .select("doc_id", "chunk_idx", "start_pos", "chunk_md5").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expected,
      s"chunk sets differ: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("cdc boundaries resynchronize after an edit (the chunk-dedup property)") {
    // Prepend a prefix to a real document: a fixed-window chunker shifts
    // every chunk; the content-defined one re-aligns after the first
    // boundary, so all later chunk digests survive — that is what makes
    // chunk-level dedup robust to edits.
    val text = spark.read.parquet(s"$sfTiny/documents.parquet")
      .orderBy("doc_id").select("text").head().getString(0)
    val orig = cdcChunksOf(text).map(_._3)
    val edited = cdcChunksOf("edited prefix inserted " + text).map(_._3)
    val shared = orig.toSet.intersect(edited.toSet)
    assert(orig.size >= 3, "fixture doc too short to chunk")
    assert(shared.size >= orig.size - 2,
      s"only ${shared.size} of ${orig.size} chunk digests survived the edit — no resync")
  }

  test("minhash-lsh banding recall vs brute force matches the geometry's promise") {
    // 72 hashes / 24 bands / 3 rows predicts P[miss] ≤ 4e-5 at J=0.7 —
    // measured recall below 0.9 means the banding or hash regressed
    val (recall, nExact, nLsh, nBoth) =
      TextQueries.lshRecallReport(spark, sfTiny)
    assert(nExact > 0, "no exact near-dup pairs — fixture degenerate")
    assert(nLsh >= nBoth, "pair bookkeeping inconsistent")
    assert(recall >= 0.9,
      s"LSH recall $recall ($nBoth of $nExact ground-truth pairs) — geometry broken")
  }

  test("winsorization clamps ~5% per tail and the sum stays inside the band") {
    val rows = run("ev7_winsorized_stats", sfMid)
      .select("event_type", "n", "n_clamped_low", "n_clamped_high",
        "winsor_sum_micro", "lo_micro", "hi_micro").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(5), r.getLong(6))
      assert(lo <= hi, s"${r.getString(0)}: inverted band")
      // interpolated p05/p95: strictly-outside counts sit at ≈5% of n
      Seq(r.getLong(2), r.getLong(3)).foreach { c =>
        assert(c >= (n * 3) / 100 && c <= (n * 7) / 100,
          s"${r.getString(0)}: clamp count $c of $n outside the 3–7% band")
      }
      val s = r.getLong(4)
      assert(s >= n * lo && s <= n * hi,
        s"${r.getString(0)}: winsorized sum escaped the clamp band")
    }
  }

  test("temperature mixture flattens the head and lifts the tail") {
    val rows = run("lang_temperature_mix", sfMid)
      .select("lang", "n_docs", "weight_ppm", "target_docs", "natural_ppm")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // shares sum to 1e6 within per-row rounding
    assert(math.abs(rows.map(_._3).sum - 1000000L) <= rows.length,
      s"ppm sum ${rows.map(_._3).sum} off by more than rounding")
    assert(math.abs(rows.map(_._4).sum - 1000L) <= rows.length,
      "target_docs budget off by more than rounding")
    val head = rows.maxBy(_._2)
    val tail = rows.minBy(_._2)
    assert(head._3 < head._5,
      s"head lang ${head._1} not downweighted: ppm=${head._3} natural=${head._5}")
    assert(tail._3 > tail._5,
      s"tail lang ${tail._1} not upweighted: ppm=${tail._3} natural=${tail._5}")
  }

  /** Exact epoch microseconds of a Timestamp (getTime carries millis,
    * getNanos the full fractional second — take only its sub-milli part). */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Each user's events in (ts, event_id) order — the ordering every
    * run/transition derivation below shares with the operators. */
  private def orderedEvents(): Map[Long, Seq[(String, java.sql.Timestamp, Long)]] =
    graft.Tables.table(spark, sfMid, "events")
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (u, rs) =>
        u -> rs.sortBy(r => (micros(r._3), r._4))
          .map(r => (r._2, r._3, r._4)).toSeq
      }

  test("SCD2 intervals partition each user's stream into maximal runs") {
    val byUser = orderedEvents()
    val got = run("ev8_scd2_intervals", sfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5),
        r.getBoolean(6)))
    // re-derive runs per user: collapse consecutive equal states
    val expect = byUser.toSeq.flatMap { case (u, evs) =>
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[(String, java.sql.Timestamp, Long)]
      evs.foreach { case (st, ts, _) =>
        if (runs.nonEmpty && runs.last._1 == st) {
          val (s, f, n) = runs.last; runs(runs.length - 1) = (s, f, n + 1)
        } else runs += ((st, ts, 1L))
      }
      runs.zipWithIndex.map { case ((st, from, n), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (u, (i + 1).toLong, st, from, to, n, to.isEmpty)
      }
    }.toSet
    assert(got.toSet == expect,
      s"missing=${(expect -- got.toSet).take(2)} extra=${(got.toSet -- expect).take(2)}")
    // structural invariants: exactly one open interval per user;
    // adjacent versions never share a state (runs are maximal)
    got.groupBy(_._1).foreach { case (u, rows) =>
      assert(rows.count(_._7) == 1, s"user $u open intervals != 1")
      rows.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 != b._3, s"user $u adjacent runs share state ${a._3}")
          assert(a._5.contains(b._4), s"user $u intervals not contiguous")
        case _ => ()
      }
    }
  }

  test("markov transitions recount exactly and rows normalize to ppm") {
    val byUser = orderedEvents()
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    byUser.values.foreach { evs =>
      evs.sliding(2).foreach {
        case Seq((a, ta, _), (b, tb, _)) =>
          val gapUs = micros(tb) - micros(ta)
          if (gapUs <= 1800000000L)
            trans((a, b)) = trans.getOrElse((a, b), 0L) + 1
        case _ => ()
      }
    }
    val rowTotals = trans.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val got = run("ev9_markov_transitions", sfMid).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == trans.keySet.toSet)
    trans.foreach { case (k, n) =>
      val (gn, gt, gp) = got(k)
      assert(gn == n, s"$k count $gn != $n")
      assert(gt == rowTotals(k._1), s"$k row total")
      assert(gp == math.round(n * 1000000.0 / rowTotals(k._1)), s"$k ppm")
    }
    // each from-state's ppm column sums to ~1e6 (per-cell rounding slack)
    got.groupBy(_._1._1).foreach { case (f, m) =>
      val s = m.values.map(_._3).sum
      assert(math.abs(s - 1000000L) <= m.size, s"$f ppm sum $s")
    }
  }

  test("three-step funnel recounts from the ordered event stream") {
    val byUser = orderedEvents()
    val hour = 3600000000L
    var (viewers, clicked, clicked1h, purchased, purchased1h) = (0L, 0L, 0L, 0L, 0L)
    byUser.values.foreach { evs =>
      val t0 = evs.collect { case ("view", t, _) => micros(t) }.minOption
      t0.foreach { v =>
        viewers += 1
        val t1 = evs.collect { case ("click", t, _) => micros(t) }
          .filter(_ > v).minOption
        t1.foreach { c =>
          clicked += 1
          if (c - v <= hour) clicked1h += 1
          val t2 = evs.collect { case ("purchase", t, _) => micros(t) }
            .filter(_ > c).minOption
          t2.foreach { p =>
            purchased += 1
            if (p - c <= hour) purchased1h += 1
          }
        }
      }
    }
    val r = run("ev10_funnel_steps", sfMid).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((viewers, clicked, clicked1h, purchased, purchased1h)),
      s"got $r expect ($viewers,$clicked,$clicked1h,$purchased,$purchased1h)")
    // funnel narrows monotonically
    assert(viewers >= clicked && clicked >= purchased &&
      clicked >= clicked1h && purchased >= purchased1h)
    assert(purchased > 0, "vacuous fixture: nobody completed the funnel")
  }

  test("hopping windows: every event lands in exactly 4 slides and recounts exactly") {
    val evs = graft.Tables.table(spark, sfTiny, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("unix_micros(ts) us").collect().map(_.getLong(0))
    val slide = 15L * 60 * 1000000
    // driver replay: the 4 containing window starts per event
    val expect = evs.flatMap { us =>
      val b = Math.floorDiv(us, slide) * slide
      (0 until 4).map(k => b - k * slide)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = run("ev11_hopping_window", sfTiny).collect()
      .map(r => (r.getTimestamp(0).toInstant.toEpochMilli * 1000, r.getLong(1))).toMap
    assert(got == expect, s"hopping recount mismatch: ${got.size} vs ${expect.size} windows")
    assert(got.values.sum == evs.length * 4L, "each event must land in exactly 4 windows")
  }

  test("gap-fill: dense spine, observed hours exact, fills bounded by their anchors") {
    val rows = run("ev12_gapfill_interpolate", sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byType = rows.groupBy(_._1)
    assert(byType.nonEmpty)
    byType.foreach { case (t, rs) =>
      val hs = rs.map(_._2).sorted
      // dense: every hour between min and max appears exactly once
      assert(hs.length == (hs.last - hs.head + 1).toInt,
        s"$t spine is not dense: ${hs.length} rows over [${hs.head}, ${hs.last}]")
      assert(rs.count(_._3 == "fill") > 0,
        s"vacuous fixture: no gaps to fill for $t at sf0.001")
      // every fill sits between its neighboring observed values
      val obs = rs.filter(_._3 == "obs").map(r => r._2 -> r._4).sortBy(_._1)
      rs.filter(_._3 == "fill").foreach { case (_, h, _, u6) =>
        val (ph, pv) = obs.takeWhile(_._1 < h).last
        val (nh, nv) = obs.dropWhile(_._1 < h).head
        assert(u6 >= math.min(pv, nv) && u6 <= math.max(pv, nv),
          s"$t hour $h fill $u6 outside anchor band [$pv, $nv]")
        // exact linear form replayed
        val exact = math.rint((pv / 1000000.0 * (nh - h) + nv / 1000000.0 * (h - ph))
          * 1000000.0 / (nh - ph)).toLong
        assert(math.abs(u6 - exact) <= 1, s"$t hour $h fill $u6 != replay $exact")
      }
    }
  }

  test("triangle count replays from the pair set and each triangle counts once") {
    val pairs = TextQueries.simhashPairsFrame(spark, sfMid)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.toSet
    val adj = pairs.flatMap(p => Seq(p, (p._2, p._1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // oriented enumeration a < b < c — each triangle exactly once
    val tris = for {
      (a, b) <- pairs
      c <- adj.getOrElse(b, Set.empty)
      if c > b && edges.contains((a, c))
    } yield (a, b, c)
    val row = run("neardup_triangles", sfMid).collect().head
    assert(row.getLong(0) == tris.length,
      s"triangle count ${row.getLong(0)} != replay ${tris.length}")
    assert(row.getLong(1) == tris.map { case (a, b, c) => a + b + c }.sum,
      "vertex digest mismatch")
    assert(tris.nonEmpty, "vacuous fixture: no triangles in the pair graph")
  }

  test("pagerank replays the exact integer iteration sequence from the pair set") {
    val pairs = TextQueries.simhashPairsFrame(spark, sfMid)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val deg = out.view.mapValues(_.length.toLong).toMap
    val n = deg.size
    // engines round() half-up for positives; p/deg hits exact .5 on
    // even degrees, where rint's half-even would diverge
    def halfUp(x: Double): Long = math.floor(x + 0.5).toLong
    var p = deg.keys.map(id => id -> halfUp(1000000.0 / n)).toMap
    for (_ <- 1 to 3) {
      val contrib = deg.keys.map { v =>
        // in-neighbors == out-neighbors (undirected)
        v -> out(v).map(u => halfUp(p(u).toDouble / deg(u))).sum
      }.toMap
      p = deg.keys.map(v =>
        v -> halfUp(0.15 * 1000000.0 / n + 0.85 * contrib(v))).toMap
    }
    val expTop = p.toSeq.sortBy { case (id, pr) => (-pr, id) }.take(20)
      .map { case (id, pr) => (id, deg(id), pr) }
    val got = run("pagerank_neardup", sfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expTop, s"pagerank top-20 mismatch:\n got=$got\n exp=$expTop")
    // a hub must rank above the uniform start — iteration moved mass
    assert(got.head._3 > halfUp(1000000.0 / n),
      "no vertex gained rank over uniform — iteration vacuous")
  }

  test("bpe apply: winner pair and merge stats recount from the vocabulary") {
    val words = spark.read.parquet(s"$sfMid/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val tf = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCounts = tf.toSeq.flatMap { case (w, n) =>
      (0 until w.length - 1).map(i => (w.substring(i, i + 1), w.substring(i + 1, i + 2)) -> n)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val (wa, wb) = pairCounts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head._1
    val pat = wa + wb
    def sites(w: String): Long = (w.length - w.replace(pat, "").length) / 2L
    val row = run("bpe_apply_merge", sfMid).collect().head
    assert(row.getString(0) == wa && row.getString(1) == wb, "winner pair mismatch")
    assert(row.getLong(2) == tf.collect { case (w, n) if sites(w) > 0 => n }.sum,
      "tokens_touched mismatch")
    assert(row.getLong(3) == tf.map { case (w, n) => sites(w) * n }.sum,
      "total_merges mismatch")
    assert(row.getLong(4) - row.getLong(5) == row.getLong(3),
      "symbols saved must equal merges applied")
    assert(row.getLong(3) > 0, "vacuous fixture: winning pair never merges")
  }

  test("point-in-time lookup selects exactly one SCD2 version per (probe, user)") {
    val intervals = run("ev8_scd2_intervals", sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
      .filter(_._1 <= 50)
    val probes = Seq("2024-01-08 00:00:00", "2024-01-15 00:00:00", "2024-01-22 00:00:00")
      .map(java.sql.Timestamp.valueOf)
    val expect = (for {
      p <- probes
      (u, v, st, from, to) <- intervals
      if !from.after(p) && to.forall(_.after(p))
    } yield (p.getTime, u, v, st)).toSet
    val got = run("ev15_scd2_point_in_time", sfTiny).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSet == expect, "point-in-time set mismatch vs interval replay")
    // the uniqueness theorem: contiguous maximal runs admit one version per probe
    assert(got.length == got.map(r => (r._1, r._2)).distinct.length,
      "a (probe, user) matched more than one version")
    assert(got.nonEmpty)
  }

  test("histogram bins clamp into the top bin and partition every row") {
    val prices = spark.read.parquet(s"$sfMid/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val rows = run("i3_histogram", sfMid).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == prices.length, "bins must partition all rows")
    rows.foreach { case (bin, _, lo, hi) =>
      assert(bin >= 0 && bin <= 19 && lo <= hi, s"bin $bin malformed")
      if (bin < 19) assert(hi < (bin + 1) * 30000.0, s"bin $bin leaks upward")
      assert(lo >= bin * 30000.0 || bin == 19, s"bin $bin leaks downward")
    }
    val expected = prices.groupBy(p => math.min(math.floor(p / 30000.0).toLong, 19L))
      .view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == expected, "bin counts mismatch")
  }

  test("regression trend replays from exact integer moment sums") {
    val events = graft.Tables.table(spark, sfMid, "events")
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS h")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val h0 = events.map(_._2).min
    val got = run("f7_regression_trend", sfMid).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    events.groupBy(_._1).foreach { case (t, es) =>
      val pts = es.groupBy(_._2).map { case (h, g) => (h - h0, g.length.toLong) }.toSeq
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n.toDouble * sxy - sx.toDouble * sy) / (n.toDouble * sxx - sx.toDouble * sx)
      val icept = (sy.toDouble - slope * sx) / n
      val (gn, gs, gi) = got(t)
      assert(gn == n, s"$t point count mismatch")
      assert(math.abs(gs - math.floor(slope * 1000000.0 + 0.5)) <= 1, s"$t slope mismatch")
      assert(math.abs(gi - math.floor(icept * 1000000.0 + 0.5)) <= 1, s"$t intercept mismatch")
    }
  }

  test("argmax/median/mode replay from collected rows") {
    val orders = graft.Tables.table(spark, sfTiny, "orders")
      .selectExpr("o_orderstatus", "o_orderkey", "o_orderdate",
        "o_totalprice", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.get(2), r.getDouble(3), r.getString(4)))
    val got = run("f6_argminmax_median_mode", sfTiny).collect()
      .map(r => r.getString(0) ->
        ((r.get(1), r.get(2), r.getDouble(3), r.getString(4), r.getLong(5)))).toMap
    orders.groupBy(_._1).foreach { case (st, rs) =>
      val (fd, ld, med, mode, n) = got(st)
      assert(fd == rs.minBy(_._2)._3 && ld == rs.maxBy(_._2)._3,
        s"$st argmin/argmax dates mismatch")
      val ps = rs.map(_._4).sorted
      val m = if (ps.length % 2 == 1) ps(ps.length / 2)
      else (ps(ps.length / 2 - 1) + ps(ps.length / 2)) / 2.0
      val mr = BigDecimal(m).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(med - mr) < 1e-9, s"$st median $med != replay $mr")
      val freq = rs.groupBy(_._5).view.mapValues(_.size).toMap
      val expMode = freq.toSeq.sortBy { case (v, c) => (-c, v) }.head._1
      assert(mode == expMode && n == rs.length, s"$st mode/count mismatch")
    }
  }
}
