package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables}

/** Behavioral invariants of the retrieval layer and the r8 filtering
  * additions — properties the hash gate can't state: BM25 result-set
  * semantics (every hit really contains a query term, ranks are a
  * strict ordering), posting-list caps and df consistency, duplicated-
  * span coverage arithmetic, and repetition-signal ranges.
  */
class SearchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("search-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("bm25 hits contain a query term; ranks are 1..k strictly score-ordered") {
    val rows = run("bm25_topk").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    // strict (score desc, doc_id asc) ordering — no rank ties possible
    rows.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getLong(2), b.getLong(2))
      assert(sa > sb || (sa == sb && a.getLong(1) < b.getLong(1)),
        s"rank ${b.getLong(0)} not strictly after ${a.getLong(0)}")
    }
    val hitIds = rows.map(_.getLong(1)).toSet
    val matching = Tables.table(spark, sf, "documents")
      .filter(col("doc_id").isin(hitIds.toSeq: _*))
      .filter(not(col("text").rlike("(^| )(scan|merge|vector)( |$)")))
      .count()
    assert(matching == 0, s"$matching bm25 hits contain no query term")
    // positive scores only: idf form ln(1 + …) is strictly positive
    assert(rows.forall(_.getLong(2) > 0L))
  }

  test("posting lists cap at 5, df/total_tf are consistent, top doc has max tf") {
    val rows = run("inverted_index_postings").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (df, totalTf, postings) =
        (r.getLong(1), r.getLong(2), r.getString(3).split(",").toSeq)
      assert(postings.nonEmpty && postings.length <= 5)
      assert(postings.length <= df && df <= totalTf)
      assert(postings.distinct == postings, s"duplicate doc in postings: $postings")
    }
    // cross-check one term end-to-end against a direct tf computation
    val term = rows.head.getString(0)
    val topDoc = rows.head.getString(3).split(",").head.toLong
    val tf = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === term)
      .groupBy("doc_id").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("doc_id")).limit(1).collect().head
    assert(tf.getLong(0) == topDoc,
      s"term '$term': postings head ${topDoc} != max-tf doc ${tf.getLong(0)}")
  }

  test("duplicated-span coverage arithmetic holds per doc") {
    val bad = run("dup_span_stats")
      .filter(col("covered_tokens") > col("n_tokens") ||
        col("dup_grams") > col("n_grams") ||
        // a duplicated gram covers >= 8 tokens unless clipped by doc end,
        // and zero dup grams must mean zero coverage (and vice versa)
        ((col("dup_grams") > 0) =!= (col("covered_tokens") > 0)) ||
        col("dup_ppm") > 1000000L || col("dup_ppm") < 0L)
      .count()
    assert(bad == 0, s"$bad documents violate span-coverage arithmetic")
  }

  test("repetition signals stay in range and distinct <= total") {
    val bad = run("repetition_signals")
      .filter(col("n_distinct") > col("n_words") ||
        col("dup_word_ppm") < 0L || col("dup_word_ppm") > 1000000L ||
        col("top_bigram_ppm") < 0L || col("top_bigram_ppm") > 1000000L ||
        col("top_bigram") > greatest(col("n_words") - 1, lit(1L)))
      .count()
    assert(bad == 0, s"$bad documents violate repetition-signal ranges")
  }

  test("hybrid rrf scores are exactly the rank-derived contributions") {
    val rows = run("hybrid_rrf_topk").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    def contrib(r: Long): Long =
      if (r > 0) math.round(1000000.0 / (60 + r)) else 0L
    rows.foreach { r =>
      val (rrf, sp, dn) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sp > 0 || dn > 0, "fused doc in neither arm")
      assert(rrf == contrib(sp) + contrib(dn),
        s"doc ${r.getLong(1)}: rrf $rrf != ${contrib(sp)} + ${contrib(dn)}")
    }
    // strict output ordering (rrf desc, doc_id asc)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) > b.getLong(2) ||
        (a.getLong(2) == b.getLong(2) && a.getLong(1) < b.getLong(1)))
    }
  }

  test("classifier keep decision is exactly the sign of the integer score") {
    val bad = run("quality_classifier_score")
      .filter((col("score_m") >= 0) =!= col("keep")).count()
    assert(bad == 0, s"$bad docs where keep != (score_m >= 0)")
  }

  test("doc keywords reproduce a full driver TF-IDF re-derivation") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val n = docs.length.toLong
    val tf = docs.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    def score(t: Long, d: Long): Long =
      BigDecimal(t * math.log(n.toDouble / d) * 1000000.0)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = tf.flatMap { case (id, m) =>
      m.toSeq.map { case (w, t) => (w, score(t, df(w))) }
        .filter(_._2 > 0)
        .sortBy { case (w, sc) => (-sc, w) }.take(3).zipWithIndex
        .map { case ((w, sc), i) => (id, (i + 1).toLong, w, sc) }
    }.toSet
    val got = run("doc_top_terms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    assert(expect.nonEmpty)
    // ubiquitous terms (df = N) are non-keywords by construction
    assert(!got.exists { case (_, _, w, _) => df.get(w).contains(n) })
  }

  test("BPE merge candidates recount exactly from the corpus vocabulary") {
    val words = graft.Tables.table(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
    val tfm = words.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
    tfm.foreach { case (w, t) =>
      if (w.length >= 2) w.sliding(2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        pairs(k) = pairs.getOrElse(k, 0L) + t
      }
    }
    val expect = pairs.toSeq.sortBy { case ((a, b), cnt) => (-cnt, a, b) }.take(20)
      .map { case ((a, b), cnt) => (a, b, cnt) }
    val got = run("bpe_merge_pairs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expect, s"got=${got.take(4)} expect=${expect.take(4)}")
    // the winner is a genuine merge candidate: it appears in >1 word type
    val (wa, wb, _) = got.head
    assert(tfm.keys.count(_.contains(wa + wb)) > 1)
  }
}
