package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables}

/** Behavioral invariants of the corpus-operations layer — properties the
  * hash gate can't state (it only pins outputs to the oracle's): chunk
  * coverage arithmetic, sampling-rate bounds and determinism, surprisal
  * range, incremental-dedup consistency with the full pair set, and
  * retention-grid semantics.
  */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("corpus-ops-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("chunks tile each document exactly: chars = sum(len) - overlaps") {
    // chunk k (k>=1) overlaps its predecessor by min(50, its own length)
    // — window 200 / stride 150, predecessor end = min(start+49, L) —
    // so the doc length must reconstruct exactly from the chunk table.
    val recon = run("doc_chunks")
      .groupBy("doc_id")
      .agg((sum("chunk_len") -
        sum(when(col("chunk_id") >= 1, least(lit(50), col("chunk_len")))
          .otherwise(0L))).as("recon"))
    val docs = Tables.table(spark, sf, "documents").select("doc_id", "n_chars")
    val bad = recon.join(docs, "doc_id")
      .filter(col("recon") =!= col("n_chars")).count()
    assert(bad == 0, s"$bad documents do not reconstruct from their chunks")
    // every document yields at least one chunk
    assert(recon.count() == docs.count())
  }

  test("mixture sampling hits its per-source rate and is replay-deterministic") {
    val rows = run("source_mix_sample").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (src, total, kept) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      val idx = src.stripPrefix("src").toInt % 4
      val rate = Seq(0.25, 0.5, 0.75, 1.0)(idx)
      assert(kept <= total, s"$src kept more than it saw")
      if (rate == 1.0) assert(kept == total, s"$src rate-1.0 must keep all")
      else {
        // 25 docs/source at this SF: binomial 3-sigma is ~0.26 at p=0.5
        val achieved = kept.toDouble / total
        assert(math.abs(achieved - rate) <= 0.3,
          s"$src achieved $achieved vs target $rate")
      }
    }
    // determinism: same kept-set digest on a fresh run (no rand() anywhere)
    val again = run("source_mix_sample").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("surprisal is positive and bounded by the rarest-token ceiling ln(total)") {
    val docs = Tables.table(spark, sf, "documents")
      .filter(length(col("text")) > 0).count()
    val total = Tables.table(spark, sf, "documents")
      .select(explode(split(col("text"), " "))).count()
    val out = run("unigram_surprisal")
    assert(out.count() == docs, "every non-empty document must score")
    val ceiling = math.log(total.toDouble) + 1e-6
    val bad = out.filter(col("mean_nll") < 0 || col("mean_nll") > ceiling).count()
    assert(bad == 0, s"$bad docs outside (0, ln(total)] surprisal range")
  }

  test("incremental dedup agrees with the full near-dup pair set") {
    // every cross-boundary pair the symmetric LSH finds must be an
    // incremental match, and every incremental match must be a real
    // cross-boundary pair — the batch path may not lose or invent pairs.
    val full = run("neardup_minhash_lsh")
      .withColumn("i_id", when(col("id_a") % 5 === 4, col("id_a"))
        .otherwise(col("id_b")))
      .withColumn("e_id", when(col("id_a") % 5 === 4, col("id_b"))
        .otherwise(col("id_a")))
      .filter((col("i_id") % 5 === 4) && (col("e_id") % 5 =!= 4))
      .select("i_id", "e_id")
    val inc = run("incremental_dedup")
    val incTotal = inc.agg(sum("n_matches")).collect()(0).getLong(0)
    assert(incTotal == full.count(),
      "incremental match count != symmetric cross-boundary pair count")
    val firsts = full.groupBy("i_id").agg(min("e_id").as("first_full"))
    val disagree = inc.join(firsts, col("incoming_id") === col("i_id"))
      .filter(col("first_match") =!= col("first_full")).count()
    assert(disagree == 0, "first-match ids disagree with the full pair set")
  }

  test("leakage-safe split keeps every near-dup cluster inside one split") {
    // re-derive each clustered doc's split with the same hash rule the
    // operator uses, keyed on its CLUSTER label — if any cluster spans
    // two splits, near-dups of training docs leak into eval
    val clusters = run("neardup_clusters")
      .withColumn("split", expr(
        """CASE WHEN substr(md5(CAST(cluster_id AS STRING)), 1, 8) < 'cccccccc' THEN 'train'
          |     WHEN substr(md5(CAST(cluster_id AS STRING)), 1, 8) < 'e6666666' THEN 'val'
          |     ELSE 'test' END""".stripMargin))
    assert(clusters.select("cluster_id", "split").distinct().count() ==
      clusters.select("cluster_id").distinct().count(),
      "a near-dup cluster spans multiple splits")
    // the gated summary accounts for every document exactly once, with
    // rates near 80/10/10 (hash-binomial tolerance on 500 docs)
    val docs = Tables.table(spark, sf, "documents").count()
    val rows = run("leakage_safe_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.values.sum == docs)
    assert(math.abs(rows("train").toDouble / docs - 0.8) < 0.1)
    assert(rows.getOrElse("val", 0L) > 0 && rows.getOrElse("test", 0L) > 0)
  }

  test("segment dedup reproduces a full driver re-derivation") {
    // independent re-derivation of the whole operator: segment every
    // document into 3-word windows, count corpus-wide, remove segments
    // occurring >= 4 times, rebuild the text, hash — then compare
    // row-for-row with the operator's output.
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // limit -1 keeps trailing empty fields, matching Spark split() and
    // DuckDB string_split (plain Scala split drops them)
    def segsOf(t: String): Seq[String] =
      t.split(" ", -1).grouped(3).map(_.mkString(" ")).toSeq
    val counts = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach { case (_, t) =>
      segsOf(t).foreach(s => counts(s) = counts.getOrElse(s, 0) + 1) }
    val dup = counts.collect { case (s, n) if n >= 4 => s }.toSet
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = docs.map { case (id, t) =>
      val segs = segsOf(t)
      val kept = segs.filterNot(dup)
      id -> ((segs.length.toLong, (segs.length - kept.length).toLong,
        md5hex(kept.mkString(" "))))
    }.toMap
    val got = run("segment_dedup_clean").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4))))
      .toMap
    assert(got.keySet == expect.keySet, "document set mismatch")
    val bad = expect.collect {
      case (id, e) if got(id) != e => (id, got(id), e) }
    assert(bad.isEmpty, s"mismatched docs: ${bad.take(3)}")
    assert(expect.values.map(_._2).sum > 0,
      "vacuous fixture: no duplicated segments removed")
    assert(expect.values.exists(v => v._1 > v._2),
      "vacuous fixture: everything removed")
  }

  test("source cap keeps exactly the K hash-first docs per source") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map { case (id, _) => (id, md5hex(id.toString)) }
        .sortBy { case (id, h) => (h, id) }.take(15).zipWithIndex
        .map { case ((id, _), i) => (id, src, (i + 1).toLong) }
    }.toSet
    val got = run("source_cap_sample").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    // the cap binds on this fixture (sources hold > K docs)
    assert(got.size < docs.length, "vacuous fixture: cap never binds")
    got.groupBy(_._2).values.foreach(g => assert(g.size <= 15))
  }

  test("retention grid: day-0 retention is 1.0 for every cohort, never above 1") {
    val out = run("ev5_retention_cohorts")
    val day0 = out.filter(col("day_offset") === 0)
    val cohorts = out.select("cohort_day").distinct().count()
    assert(day0.count() == cohorts, "every cohort must have a day-0 row")
    assert(day0.filter(col("retention") =!= 1.0).count() == 0,
      "users are active on their first-seen day by definition")
    assert(out.filter(col("retention") > 1.0).count() == 0)
    assert(out.filter(col("n_active") > col("cohort_size")).count() == 0)
  }
}
